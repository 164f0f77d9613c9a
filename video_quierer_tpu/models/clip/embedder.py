"""Batched CLIP embedding service: the engine's device-facing entry point.

Replaces the per-frame, batch-size-1, host↔device round-tripping of the
reference (``VideoProcessor.get_frame_embedding`` /
``encode_text_query``, video_search_overhaul.py:203-232, 271-295 — SURVEY.md
§3.2 marks it the top performance bug) with:

- fixed-shape **bucketed batching**: frame batches are padded up to the next
  bucket size so each bucket compiles once and the MXU sees large batches;
- one host→device transfer per batch, one device→host per batch of results;
- optional **data-parallel sharding** over a mesh axis (pjit-style
  ``NamedSharding``) for multi-chip ingest;
- weights from a local HF checkpoint when available, else deterministic
  seeded init (convert.py docstring explains the offline constraint).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from video_quierer_tpu.models.clip import convert as convert_mod
from video_quierer_tpu.models.clip.config import CLIPConfig, get_config
from video_quierer_tpu.models.clip.model import CLIP, init_params
from video_quierer_tpu.models.clip.tokenizer import (
    TokenizerBase,
    load_tokenizer,
)
from video_quierer_tpu.ops.fused_layer import (
    fused_batch_eligible,
    fused_encode_shard_map,
    fused_seq_eligible,
    fused_text_encode,
    fused_text_tower_eligible,
    fused_vision_encode,
    fused_vision_tower_eligible,
)
from video_quierer_tpu.ops.preprocess import normalize_images

logger = logging.getLogger(__name__)

# Frame-batch buckets: each size compiles once; frames pad to the next one.
IMAGE_BUCKETS = (32, 128, 256)
# bucket 1 serves the latency path (single text query) without padding to
# a batch of 8; 128/256/512 serve wide coalesced batches (engine
# coalesce_width) — each bucket compiles once, lazily, and the boot
# warm-up only touches buckets up to the configured coalescer width.
# Above 256 the candidate kernels chunk internally (ops/topk.py
# CAND_MAX_B) so the score surface stays inside VMEM; the text encode
# and the dispatch overhead still amortize over the full width.
TEXT_BUCKETS = (1, 8, 32, 64, 128, 256, 512)
# Sequence-length buckets for the CAUSAL text tower. The tokenizer pads
# to the full 77-token context for HF parity, but under causal masking
# no position after the last EOT can influence any pooled (EOT) output —
# trimming pad columns is mathematically exact. Real queries are ~10-15
# tokens, so the tower runs at ~1/5 the FLOPs (the text encode is a
# first-order cost of the 64-way coalesced serving batch: ~370 GFLOP at
# seq 77). The 8-bucket serves short queries (≤6 words): measured v5e
# B=256 stacked-jit 2026-08-19, encode s8 2.80 vs s16 3.94 ms/batch.
# Non-causal towers (SigLIP attends over its padding) must NOT trim —
# this lives on CLIPEmbedder only.
TEXT_SEQ_BUCKETS = (8, 16, 32, 77)


def trim_text_ids(ids: np.ndarray) -> np.ndarray:
    """Trim trailing pad columns of ``[B, 77]`` token ids to a seq
    bucket covering every row's EOT (exact for causal towers)."""
    ids = np.asarray(ids)
    if ids.ndim != 2 or 0 in ids.shape:
        return ids
    # EOT carries the highest id in CLIP's vocab (model.py pools at
    # argmax); +1 → columns needed
    need = int(np.argmax(ids, axis=1).max()) + 1
    for b in TEXT_SEQ_BUCKETS:
        if need <= b <= ids.shape[1]:
            return ids[:, :b]
    return ids


def _bucket_for(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _load_orbax_params(path: Path):
    """Restore the ``params`` subtree of a trainer checkpoint
    (train/checkpoint.py layout: {params, opt_state, step})."""
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).resolve())
    import jax.numpy as _jnp
    import jax as _jax
    return _jax.tree.map(_jnp.asarray, restored["params"])


class CLIPEmbedder:
    """Jitted dual-tower CLIP encoder with bucketed batching."""

    def __init__(self,
                 model_name: str = "openai/clip-vit-base-patch32",
                 checkpoint_dir: Optional[Path] = None,
                 dtype=jnp.float32,
                 mesh=None,
                 data_axis: str = "data",
                 seed: int = 0,
                 orbax_checkpoint: Optional[Path] = None,
                 parallel: str = "none",
                 pipeline_microbatches: int = 4):
        self.cfg: CLIPConfig = get_config(model_name)
        self.model = CLIP(self.cfg, dtype=dtype)
        self.mesh = mesh
        self.data_axis = data_axis
        self.parallel = parallel
        self._pipe_mesh = None
        self._pipe_microbatches = pipeline_microbatches
        if parallel == "pp":
            # GPipe the image tower over a ``pipe`` axis
            # (parallel/pipeline.py — model.parallel config,
            # engine/config.py). A passed-in mesh with a ``pipe`` axis is
            # honored; otherwise span the largest local-device count that
            # divides the encoder depth.
            from video_quierer_tpu.parallel.pipeline import PIPE_AXIS
            if mesh is not None and PIPE_AXIS in mesh.shape:
                self._pipe_mesh = mesh
            else:
                from jax.sharding import Mesh
                layers = self.cfg.vision.num_layers
                devs = jax.devices()
                n = max(d for d in range(1, len(devs) + 1)
                        if layers % d == 0)
                self._pipe_mesh = Mesh(np.array(devs[:n]), (PIPE_AXIS,))
        elif parallel != "none":
            raise ValueError(f"unknown parallel mode {parallel!r}")
        ckpt = checkpoint_dir or convert_mod.find_local_checkpoint(model_name)
        if orbax_checkpoint is not None:
            # fine-tuned weights from train/checkpoint.py — closes the
            # train → serve loop
            logger.info("Loading fine-tuned params from %s",
                        orbax_checkpoint)
            self.params = _load_orbax_params(Path(orbax_checkpoint))
            self.pretrained = True
        elif ckpt is not None:
            logger.info("Loading CLIP weights from %s", ckpt)
            self.params = jax.tree.map(
                jnp.asarray, convert_mod.convert_hf_checkpoint(ckpt, self.cfg))
            self.pretrained = True
        else:
            logger.warning(
                "No local CLIP checkpoint found — using seeded random init "
                "(set VQT_CLIP_CHECKPOINT to a local HF checkpoint dir).")
            self.params = init_params(self.model, seed=seed)
            self.pretrained = False
        self.tokenizer: TokenizerBase = load_tokenizer(ckpt)
        if dtype == jnp.bfloat16:
            # store params in the compute dtype: flax casts weights to
            # ``dtype`` per op anyway, so this is numerically identical
            # to bf16 compute over f32 storage — it just halves the
            # weight HBM reads (f32 master copies belong to the trainer,
            # not the serving path)
            self.params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, self.params)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._img_sharding = NamedSharding(mesh, P(data_axis, None, None,
                                                       None))
            self._txt_sharding = NamedSharding(mesh, P(data_axis, None))
            self._data_axis_size = mesh.shape[data_axis]
            replicated = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, replicated)
        else:
            self._img_sharding = None
            self._txt_sharding = None
            self._data_axis_size = 1

        # fused-layer towers (ops/fused_layer.py): one pallas_call per
        # encoder block instead of ~10 XLA kernels — the seq-independent
        # per-op overhead floor was ~60% of the text encode at serving
        # seq lengths. Static eligibility here; per-call shape gates
        # (fused_seq_eligible / fused_batch_eligible) fall back to the
        # flax towers. Under a DATA mesh the fused encode runs per shard
        # via shard_map (_fused_shard_ok); the pipelined (pp) image
        # tower keeps its own path.
        self._fused_text = fused_text_tower_eligible(
            self.cfg.text, dtype, mesh)
        self._fused_vision = (self._pipe_mesh is None
                              and fused_vision_tower_eligible(
                                  self.cfg.vision, dtype, mesh))
        self._encode_image_jit = jax.jit(self._encode_image_fn)
        self._encode_text_jit = jax.jit(self._encode_text_fn)
        # bound ONCE: callers key fused executables on this object's
        # identity (DeviceVideoIndex.search_batch_fused), and a fresh
        # bound method per access would defeat both that cache and
        # jax.jit's own
        self.text_encode_fn = self._encode_text_fn

    # -- jitted cores ----------------------------------------------------

    def _fused_shard_ok(self, b: int, s: int) -> bool:
        """Mesh serving: the fused towers run per data-shard under
        shard_map (ops/fused_layer.py:fused_encode_shard_map) — the
        batch must split evenly and each SHARD must clear the per-call
        gates."""
        n = self._data_axis_size
        return b % n == 0 and fused_batch_eligible(b // n, s,
                                                   self.model.dtype)

    def _encode_image_fn(self, params, frames_u8):
        pixels = normalize_images(frames_u8, dtype=self.model.dtype)
        if self._pipe_mesh is not None:
            from video_quierer_tpu.parallel.pipeline import (
                pipelined_encode_image)
            return pipelined_encode_image(
                self.model, params, pixels, mesh=self._pipe_mesh,
                n_microbatches=self._pipe_microbatches)
        # eligibility is decided on the PADDED length — the pad-token
        # scheme (ops/fused_layer.py:fused_vision_seq) makes non-aligned
        # sequences (B/32 s=50, B/16 s=197) tile freely
        from video_quierer_tpu.ops.fused_layer import fused_vision_seq
        s = fused_vision_seq(self.cfg.vision.seq_len)
        if self._fused_vision:
            if self.mesh is None and fused_batch_eligible(
                    pixels.shape[0], s, self.model.dtype):
                return fused_vision_encode(params, pixels, cfg=self.cfg,
                                           dtype=self.model.dtype)
            if self.mesh is not None and self._fused_shard_ok(
                    pixels.shape[0], s):
                fn = fused_encode_shard_map(
                    lambda p, px: fused_vision_encode(
                        p, px, cfg=self.cfg, dtype=self.model.dtype),
                    self.mesh, self.data_axis, in_ndim=4)
                return fn(params, pixels)
        return self.model.apply({"params": params}, pixels,
                                method=CLIP.encode_image)

    def _encode_text_fn(self, params, input_ids):
        b, s = input_ids.shape
        if self._fused_text and fused_seq_eligible(s):
            if self.mesh is None and fused_batch_eligible(
                    b, s, self.model.dtype):
                return fused_text_encode(params, input_ids, cfg=self.cfg,
                                         dtype=self.model.dtype)
            if self.mesh is not None and self._fused_shard_ok(b, s):
                fn = fused_encode_shard_map(
                    lambda p, ids: fused_text_encode(
                        p, ids, cfg=self.cfg, dtype=self.model.dtype),
                    self.mesh, self.data_axis, in_ndim=2)
                return fn(params, input_ids)
        return self.model.apply({"params": params}, input_ids,
                                method=CLIP.encode_text)

    # -- public API ------------------------------------------------------

    @property
    def embed_dim(self) -> int:
        return self.cfg.projection_dim

    def embed_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        """``[N, 224, 224, 3] uint8 RGB`` → L2-normalized ``[N, D]`` f32.

        Processes in bucketed chunks; arbitrary N.
        """
        frames_u8 = np.asarray(frames_u8, np.uint8)
        n = frames_u8.shape[0]
        if n == 0:
            return np.zeros((0, self.embed_dim), np.float32)
        out = np.empty((n, self.embed_dim), np.float32)
        max_bucket = IMAGE_BUCKETS[-1]
        # dispatch every chunk before fetching any result: the next
        # chunk's host→device transfer overlaps the previous chunk's
        # compute (jax dispatch is async; only np.asarray synchronizes)
        pending = []
        pos = 0
        while pos < n:
            chunk = frames_u8[pos: pos + max_bucket]
            m = chunk.shape[0]
            bucket = _bucket_for(m, IMAGE_BUCKETS)
            if m < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - m,) + chunk.shape[1:],
                                     np.uint8)])
            batch = jnp.asarray(chunk)
            if self._img_sharding is not None:
                batch = jax.device_put(batch, self._img_sharding)
            pending.append((pos, m, self._encode_image_jit(self.params,
                                                           batch)))
            pos += m
        for pos, m, feats in pending:
            out[pos: pos + m] = np.asarray(feats)[:m]
        return out

    def embed_frames_device(self, frames_u8: np.ndarray):
        """:meth:`embed_frames` that ALSO hands back the device-resident
        features: ``(feats_dev [>=N, D], feats_np [N, D] f32)``.

        The ingest hot path feeds the index's device mirrors straight
        from ``feats_dev`` (DeviceVideoIndex.add_batch_device) — the
        embeddings the device just produced are never re-uploaded to it.
        ``feats_dev`` is padded to the chunk-bucket total; rows past N
        are dead (the append's offset indexing never reads them).
        """
        frames_u8 = np.asarray(frames_u8, np.uint8)
        n = frames_u8.shape[0]
        if n == 0:
            return None, np.zeros((0, self.embed_dim), np.float32)
        out = np.empty((n, self.embed_dim), np.float32)
        max_bucket = IMAGE_BUCKETS[-1]
        pending = []
        pos = 0
        while pos < n:
            chunk = frames_u8[pos: pos + max_bucket]
            m = chunk.shape[0]
            bucket = _bucket_for(m, IMAGE_BUCKETS)
            if m < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - m,) + chunk.shape[1:],
                                     np.uint8)])
            batch = jnp.asarray(chunk)
            if self._img_sharding is not None:
                batch = jax.device_put(batch, self._img_sharding)
            pending.append((pos, m, self._encode_image_jit(self.params,
                                                           batch)))
            pos += m
        # interior chunks are always the max bucket (full), only the
        # last is padded, so device row r == host row r for r < N and
        # the concat needs no compaction
        parts = [feats for _, _, feats in pending]
        for pos, m, feats in pending:
            out[pos: pos + m] = np.asarray(feats)[:m]
        if len(parts) == 1:
            return parts[0], out
        return jnp.concatenate(parts, axis=0), out

    # engine fused paths call this before handing ids to the fused jit;
    # identity on embedders whose towers are not causal (SigLIP)
    prepare_text_ids = staticmethod(trim_text_ids)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """Text queries → L2-normalized ``[B, D]`` f32."""
        texts = list(texts)
        if len(texts) > TEXT_BUCKETS[-1]:
            # chunk to the widest bucket so executable shapes stay
            # bounded whatever the caller sends
            step = TEXT_BUCKETS[-1]
            return np.concatenate([self.embed_texts(texts[i:i + step])
                                   for i in range(0, len(texts), step)])
        ids = trim_text_ids(self.tokenizer(texts))
        n = ids.shape[0]
        bucket = _bucket_for(n, TEXT_BUCKETS)
        if n < bucket:
            pad = np.tile(ids[-1:], (bucket - n, 1))
            ids = np.concatenate([ids, pad])
        batch = jnp.asarray(ids)
        # shard only when the padded bucket divides the data axis (a
        # single-query bucket of 1 cannot satisfy a multi-device sharding)
        if self._txt_sharding is not None and \
                bucket % self._data_axis_size == 0:
            batch = jax.device_put(batch, self._txt_sharding)
        feats = self._encode_text_jit(self.params, batch)
        return np.asarray(feats)[:n]

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]

    def warmup(self) -> None:
        """Pre-compile the common buckets (server startup hook)."""
        for b in IMAGE_BUCKETS:
            self.embed_frames(np.zeros((b, self.cfg.vision.image_size,
                                        self.cfg.vision.image_size, 3),
                                       np.uint8))
        self.embed_text("warmup")


class MemoizedEmbedder:
    """Frame-embedding memo around any embedder.

    Keys frames by a hash of sampled pixels, so re-processing unchanged
    content (e.g. ``/api/cache/rebuild`` with the same videos) skips the
    device entirely — the dead path's ``CachedFeatureExtractor``
    capability (src/core/feature_extractor.py:357-425), batched.
    """

    def __init__(self, inner, max_size: int = 50_000):
        self.inner = inner
        self.max_size = max_size
        self._memo: "OrderedDict[bytes, np.ndarray]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    @property
    def pretrained(self):
        return getattr(self.inner, "pretrained", False)

    @staticmethod
    def _key(frame: np.ndarray) -> bytes:
        import hashlib
        return hashlib.md5(
            np.ascontiguousarray(frame[::16, ::16]).tobytes()).digest()

    def embed_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        frames_u8 = np.asarray(frames_u8, np.uint8)
        n = frames_u8.shape[0]
        if n == 0:
            return self.inner.embed_frames(frames_u8)
        keys = [self._key(frames_u8[i]) for i in range(n)]
        dim = getattr(self.inner, "embed_dim", None)
        if dim is None:  # infer from any cached entry, else probe later
            dim = (len(next(iter(self._memo.values())))
                   if self._memo else None)
        if dim is None:
            feats = self.inner.embed_frames(frames_u8)
            self.misses += n
            for i, key in enumerate(keys):
                self._memo[key] = feats[i]
            while len(self._memo) > self.max_size:
                self._memo.popitem(last=False)
            return feats
        out = np.empty((n, dim), np.float32)
        missing = []
        for i, key in enumerate(keys):
            cached = self._memo.get(key)
            if cached is not None:
                out[i] = cached
                self._memo.move_to_end(key)
                self.hits += 1
            else:
                missing.append(i)
                self.misses += 1
        if missing:
            feats = self.inner.embed_frames(frames_u8[missing])
            for j, i in enumerate(missing):
                out[i] = feats[j]
                self._memo[keys[i]] = feats[j]
            while len(self._memo) > self.max_size:
                self._memo.popitem(last=False)
        return out

    def embed_frames_device(self, frames_u8: np.ndarray):
        """Device-resident passthrough (no memoization: the streaming
        mirror path needs the features ON DEVICE; memo hits would have
        to be re-uploaded, defeating it — re-ingest dedup still applies
        on the np path)."""
        fn = getattr(self.inner, "embed_frames_device", None)
        if fn is None:
            return None, self.embed_frames(frames_u8)
        return fn(frames_u8)

    def embed_text(self, text: str) -> np.ndarray:
        return self.inner.embed_text(text)

    def embed_texts(self, texts) -> np.ndarray:
        return self.inner.embed_texts(texts)
