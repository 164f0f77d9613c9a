"""Batched SigLIP embedding service — serving-side twin of CLIPEmbedder.

Same bucketed-batching contract (``embed_frames`` / ``embed_text(s)`` /
``pretrained`` / ``embed_dim``), so the engine can swap families via
``ModelConfig.family``. Notes:

- image normalization is SigLIP's ``[-1, 1]`` (mean=std=0.5);
- text uses SentencePiece: a real ``spiece.model`` (``VQT_SIGLIP_SPIECE``
  or alongside the checkpoint) loads into the from-scratch unigram
  implementation in ``spm.py``; otherwise the parameterized hash
  tokenizer stands in (32k vocab, 64 context);
- embed_dim is the tower width (768) — no projection head in SigLIP.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from video_quierer_tpu.models.clip.embedder import (
    IMAGE_BUCKETS,
    TEXT_BUCKETS,
    _bucket_for,
)
from video_quierer_tpu.models.clip.tokenizer import HashTokenizer
from video_quierer_tpu.models.siglip.fused import (
    fused_siglip_text_encode,
)
from video_quierer_tpu.models.siglip.model import (
    SigLIP,
    siglip_base_patch16,
    siglip_init_params,
)
from video_quierer_tpu.ops.fused_layer import (
    fused_batch_eligible,
    fused_text_tower_eligible,
)
from video_quierer_tpu.ops.preprocess import (
    SIGLIP_MEAN,
    SIGLIP_STD,
    normalize_images,
)

logger = logging.getLogger(__name__)


def siglip_tokenizer(cfg=None, checkpoint_dir: Optional[Path] = None):
    """Real SentencePiece tokenizer when a ``spiece.model`` is available
    (``VQT_SIGLIP_SPIECE`` or next to the checkpoint); otherwise the
    offline stand-in matching SigLIP's text geometry (64 ctx, 32k vocab)."""
    t = (cfg or siglip_base_patch16()).text
    from video_quierer_tpu.models.siglip.spm import (SigLIPSPTokenizer,
                                                     find_spiece_model)
    spiece = find_spiece_model(checkpoint_dir)
    if spiece is not None:
        logger.info("SigLIP text: SentencePiece tokenizer from %s", spiece)
        return SigLIPSPTokenizer(spiece, context_length=t.context_length)
    return HashTokenizer(context_length=t.context_length,
                         vocab_size=t.vocab_size,
                         sot=t.vocab_size - 2, eot=t.vocab_size - 1)


class SigLIPEmbedder:
    def __init__(self, checkpoint_dir: Optional[Path] = None,
                 dtype=jnp.float32, seed: int = 0,
                 orbax_checkpoint: Optional[Path] = None):
        self.cfg = siglip_base_patch16()
        self.model = SigLIP(self.cfg, dtype=dtype)
        if orbax_checkpoint is not None:
            from video_quierer_tpu.models.clip.embedder import \
                _load_orbax_params
            logger.info("Loading fine-tuned SigLIP params from %s",
                        orbax_checkpoint)
            self.params = _load_orbax_params(Path(orbax_checkpoint))
            self.pretrained = True
        elif checkpoint_dir is not None and (
                Path(checkpoint_dir) / "model.safetensors").exists():
            from video_quierer_tpu.models.siglip.convert import \
                convert_siglip_checkpoint
            logger.info("Loading SigLIP weights from %s", checkpoint_dir)
            self.params = jax.tree.map(
                jnp.asarray,
                convert_siglip_checkpoint(Path(checkpoint_dir), self.cfg))
            self.pretrained = True
        else:
            logger.warning("No local SigLIP checkpoint — seeded init")
            self.params = siglip_init_params(self.model, seed=seed)
            self.pretrained = False
        self.tokenizer = siglip_tokenizer(self.cfg, checkpoint_dir)
        if dtype == jnp.bfloat16:
            # same storage-follows-compute rule as CLIPEmbedder: flax
            # casts weights to ``dtype`` per op, so bf16 storage only
            # halves weight HBM reads. (No prepare_text_ids here: the
            # SigLIP tower is NON-causal — trimming pad columns would
            # change the pooled features.)
            self.params = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, self.params)
        # fused-layer tower (ops/fused_layer.py via models/siglip/fused
        # — SPLIT attn/MLP kernels at SigLIP's 768 width, gelu_tanh):
        # same serving-only routing as CLIPEmbedder, per-call batch
        # gate. TEXT only: the fused vision twin measured slower than
        # flax in every configuration and was deleted in round 4
        # (models/siglip/fused.py docstring records the evidence)
        self._fused_text = fused_text_tower_eligible(self.cfg.text, dtype)
        self._image_jit = jax.jit(self._encode_image)
        self._text_jit = jax.jit(self._encode_text)
        # stable identity for fused-executable caches (see CLIPEmbedder)
        self.text_encode_fn = self._encode_text

    @property
    def embed_dim(self) -> int:
        return self.cfg.vision.hidden_size

    def _encode_image(self, params, frames_u8):
        pixels = normalize_images(frames_u8, dtype=self.model.dtype,
                                  mean=SIGLIP_MEAN, std=SIGLIP_STD)
        return self.model.apply({"params": params}, pixels,
                                method=SigLIP.encode_image)

    def _encode_text(self, params, ids):
        if self._fused_text and fused_batch_eligible(
                *ids.shape, self.model.dtype):
            return fused_siglip_text_encode(params, ids, cfg=self.cfg,
                                            dtype=self.model.dtype)
        return self.model.apply({"params": params}, ids,
                                method=SigLIP.encode_text)

    def embed_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        frames_u8 = np.asarray(frames_u8, np.uint8)
        n = frames_u8.shape[0]
        if n == 0:
            return np.zeros((0, self.embed_dim), np.float32)
        out = np.empty((n, self.embed_dim), np.float32)
        pending = []
        pos = 0
        while pos < n:
            chunk = frames_u8[pos: pos + IMAGE_BUCKETS[-1]]
            m = chunk.shape[0]
            bucket = _bucket_for(m, IMAGE_BUCKETS)
            if m < bucket:
                chunk = np.concatenate(
                    [chunk, np.zeros((bucket - m,) + chunk.shape[1:],
                                     np.uint8)])
            pending.append((pos, m,
                            self._image_jit(self.params,
                                            jnp.asarray(chunk))))
            pos += m
        for pos, m, feats in pending:
            out[pos: pos + m] = np.asarray(feats)[:m]
        return out

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        ids = self.tokenizer(list(texts))
        n = ids.shape[0]
        bucket = _bucket_for(n, TEXT_BUCKETS)
        if n < bucket:
            ids = np.concatenate([ids, np.tile(ids[-1:],
                                               (bucket - n, 1))])
        feats = self._text_jit(self.params, jnp.asarray(ids))
        return np.asarray(feats)[:n]

    def embed_text(self, text: str) -> np.ndarray:
        return self.embed_texts([text])[0]
