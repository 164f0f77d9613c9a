"""Engine orchestration: startup, hash-diff ingest, search, rebuild.

The single live engine behind the API — by design exactly one instance,
one config, one index (the reference accidentally ran *two* engines, one in
server.py and one in routes.py; SURVEY.md §3.1 flags it as a bug not to
replicate).

Behavior parity with ``VideoSearchSystem`` (video_search_overhaul.py:325-456):

- startup: load pickle cache → md5(name,size,mtime) diff of the videos dir
  → (re)process new/changed videos → save cache;
- search: encode text → top-k scan → ``formatted_time = "{m}m{s}s"``;
- result schema ``{video_name, timestamp, frame_id, score, formatted_time}``;
- per-call config reads (``max_frames`` / ``sampling_mode`` / ``use_clip``
  take effect at process time, config.json semantics preserved).

TPU-native deltas (SURVEY.md §7):

- ingest is **batched across videos** through the threaded decode pipeline
  and the bucketed CLIP embedder — not one CLIP call per frame;
- batch search is **one device pass** for all queries (the reference looped
  serially, routes.py:628-634);
- a live query cache with semantic reuse (the reference's ``use_cache``
  flag was plumbing with no cache behind it, SURVEY.md §3.3);
- first-class metrics (the reference's SystemMetrics was dead code);
- image-vector queries restored from the dead path
  (src/video_search_system.py:284-289).
"""

from __future__ import annotations

import logging
import os
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from video_quierer_tpu.engine.cache import QueryResultCache
from video_quierer_tpu.engine.config import (
    ApiConfig,
    EngineConfig,
    load_engine_config,
)
from video_quierer_tpu.engine.fallback import (
    KeywordQueryEncoder,
    VisualStatsEmbedder,
)
from video_quierer_tpu.engine.metrics import SystemMetrics
from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.ingest.frames import (
    extract_frames,
    video_identity_hash,
)
from video_quierer_tpu.ingest.pipeline import batched_frames, group_by_video
from video_quierer_tpu.utils.locks import RWLock

logger = logging.getLogger(__name__)

VIDEO_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv")


def format_timestamp(ts: float) -> str:
    """``"{m}m{s}s"`` (ref: video_search_overhaul.py:450-453)."""
    return f"{int(ts // 60)}m{int(ts % 60)}s"


class VideoSearchEngine:
    def __init__(self, videos_dir: str = "videos",
                 config: Optional[EngineConfig] = None,
                 embedder=None,
                 mesh=None,
                 corpus_mesh=None):
        self.config = config or load_engine_config()
        if self.config.model.family == "siglip" and \
                self.config.index.embed_dim == 512:
            # SigLIP towers are 768-wide (no projection head)
            self.config.index.embed_dim = 768
        self.videos_dir = Path(videos_dir or self.config.videos_dir)
        self.videos_dir.mkdir(parents=True, exist_ok=True)
        self.cache_path = self.videos_dir / "video_search_cache.pkl"
        if corpus_mesh is None and self.config.index.corpus_shards > 0:
            if self.config.index.corpus_slices > 1:
                # multi-slice deployment: corpus_shards total devices
                # split across corpus_slices slices; initialize the
                # jax.distributed rendezvous when VQT_COORDINATOR is set
                from video_quierer_tpu.parallel.mesh import (
                    initialize_distributed, multislice_corpus_mesh)
                initialize_distributed()
                corpus_mesh = multislice_corpus_mesh(
                    self.config.index.corpus_slices,
                    n_devices=self.config.index.corpus_shards)
            else:
                from video_quierer_tpu.parallel.mesh import corpus_mesh \
                    as make_corpus_mesh
                corpus_mesh = make_corpus_mesh(
                    self.config.index.corpus_shards)
        self.index = DeviceVideoIndex(
            dim=self.config.index.embed_dim,
            device_dtype=self.config.index.device_dtype,
            mesh=corpus_mesh,
            device_rerank=self.config.index.device_rerank,
            rerank_store_dtype=self.config.index.rerank_store_dtype)
        self.metrics = SystemMetrics()
        self.query_cache = QueryResultCache(
            max_size=self.config.cache.query_cache_size,
            ttl_seconds=self.config.cache.query_cache_ttl_s,
            similarity_threshold=self.config.cache.similarity_threshold)
        self.mesh = mesh
        self._embedder = embedder        # injected (tests) or lazy CLIP
        self._fallback_visual = VisualStatsEmbedder(
            dim=self.config.index.embed_dim)
        self._fallback_text = KeywordQueryEncoder(
            dim=self.config.index.embed_dim)
        self._ready = False
        self._coalescer = None
        # ANN tier (index.kind == "ivf"): built by mutation paths under
        # the write lock, served read-only by searches. None ⇒ exact scan.
        self._ivf = None
        self._ivf_rows = 0
        # Reader-writer discipline: searches (reads) run concurrently and
        # pipeline on the device; ingest/delete/load are exclusive. (The
        # reference instead ran TWO unsynchronized engine singletons —
        # SURVEY.md §3.1/§5 lists its races.)
        self.lock = RWLock()
        logger.info("VideoSearchEngine initialized (dir=%s)",
                    self.videos_dir)

    # ------------------------------------------------------------------
    # Embedder selection (use_clip semantics,
    # ref: video_search_overhaul.py:336-341, 203-208, 271-276)
    # ------------------------------------------------------------------

    @property
    def use_clip(self) -> bool:
        return bool(self.config.api.use_clip)

    def _get_embedder(self):
        if not self.use_clip:
            return None
        if self._embedder is None:
            import jax.numpy as jnp
            m = self.config.model
            dtype = jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32
            if m.family == "siglip":
                from video_quierer_tpu.models.siglip.embedder import \
                    SigLIPEmbedder
                self._embedder = SigLIPEmbedder(
                    checkpoint_dir=Path(m.checkpoint_dir)
                    if m.checkpoint_dir else None,
                    orbax_checkpoint=Path(m.orbax_checkpoint)
                    if m.orbax_checkpoint else None,
                    dtype=dtype)
            else:
                from video_quierer_tpu.models.clip.embedder import \
                    CLIPEmbedder
                self._embedder = CLIPEmbedder(
                    model_name=m.name,
                    checkpoint_dir=Path(m.checkpoint_dir)
                    if m.checkpoint_dir else None,
                    orbax_checkpoint=Path(m.orbax_checkpoint)
                    if m.orbax_checkpoint else None,
                    dtype=dtype,
                    mesh=self.mesh,
                    parallel=m.parallel,
                    pipeline_microbatches=m.pipeline_microbatches)
            if self.config.cache.frame_memo_size > 0:
                from video_quierer_tpu.models.clip.embedder import \
                    MemoizedEmbedder
                self._embedder = MemoizedEmbedder(
                    self._embedder,
                    max_size=self.config.cache.frame_memo_size)
        return self._embedder

    def embed_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        emb = self._get_embedder()
        if emb is None:
            return self._fallback_visual.embed_frames(frames_u8)
        try:
            return emb.embed_frames(frames_u8)
        except Exception:
            # degrade to handcrafted features, like the reference does on
            # CLIP failure (video_search_overhaul.py:230-232)
            logger.exception("CLIP embedding failed — falling back to "
                             "visual statistics")
            self.metrics.inc("embed_fallbacks")
            return self._fallback_visual.embed_frames(frames_u8)

    def embed_frames_device(self, frames_u8: np.ndarray):
        """``(feats_dev, feats_np)``: device-resident features plus the
        host copy (one fetch). ``feats_dev`` is None when the active
        embedder can't hand back a device array (stats fallback) — the
        caller then streams the mirror from host instead."""
        emb = self._get_embedder()
        if emb is None:
            return None, self._fallback_visual.embed_frames(frames_u8)
        try:
            fn = getattr(emb, "embed_frames_device", None)
            if fn is None:
                return None, emb.embed_frames(frames_u8)
            return fn(frames_u8)
        except Exception:
            logger.exception("CLIP embedding failed — falling back to "
                             "visual statistics")
            self.metrics.inc("embed_fallbacks")
            return None, self._fallback_visual.embed_frames(frames_u8)

    def encode_text(self, query: str) -> np.ndarray:
        emb = self._get_embedder()
        if emb is None:
            return self._fallback_text.embed_text(query)
        try:
            return emb.embed_text(query)
        except Exception:
            # ref: _encode_clip_text failure → keyword encoder
            # (video_search_overhaul.py:293-295)
            logger.exception("CLIP text encoding failed — falling back to "
                             "keyword encoder")
            self.metrics.inc("embed_fallbacks")
            return self._fallback_text.embed_text(query)

    # ------------------------------------------------------------------
    # Startup / ingest (ref: startup + _process_* chain,
    # video_search_overhaul.py:345-437)
    # ------------------------------------------------------------------

    def _config_hash(self) -> str:
        """md5 over the index-affecting config keys — the bridge's
        staleness key (video_search_system_bridge.py:233-237 semantics)."""
        import hashlib
        cfg = self.config.api
        key = f"{cfg.sampling_mode}|{cfg.max_frames}|{cfg.use_clip}"
        return hashlib.md5(key.encode()).hexdigest()

    @property
    def _config_hash_path(self) -> Path:
        return Path(str(self.cache_path) + ".confighash")

    def startup(self) -> None:
        logger.info("Engine starting up...")
        with self.lock, self.metrics.timer("startup"):
            loaded = self.index.load_from_disk(self.cache_path)
            current = self.current_videos()
            if loaded and self.config.invalidate_on_config_change:
                stored = (self._config_hash_path.read_text().strip()
                          if self._config_hash_path.exists() else None)
                if stored != self._config_hash():
                    logger.info("Index-affecting config changed — full "
                                "reprocess")
                    self.index.clear()
                    loaded = False
            if loaded:
                stale = self._stale_videos(current)
                if stale:
                    logger.info("%d videos new/changed — updating",
                                len(stale))
                    self._ingest(stale)
                    self.index.save_to_disk(self.cache_path)
                else:
                    logger.info("All videos up to date")
            else:
                logger.info("No cache — processing %d videos", len(current))
                self._ingest(current)
                self.index.save_to_disk(self.cache_path)
            try:
                self._config_hash_path.write_text(self._config_hash())
            except OSError:
                pass
            if self._ivf is None:
                self._maybe_build_ivf()
        self._ready = True
        self.metrics.set_gauge("frames_indexed", len(self.index))
        logger.info("Startup complete: %d frames indexed", len(self.index))

    def current_videos(self) -> List[Path]:
        out = []
        for p in sorted(self.videos_dir.iterdir()):
            if p.suffix.lower() in VIDEO_EXTENSIONS and p.is_file():
                out.append(p)
        return out

    def _stale_videos(self, current: Sequence[Path]) -> List[Path]:
        stale = []
        for video in current:
            h = video_identity_hash(video)
            if self.index.video_hashes.get(video.name) != h:
                stale.append(video)
        return stale

    def _ingest(self, videos: Sequence[Path],
                api_cfg: Optional[ApiConfig] = None) -> int:
        """Batched cross-video ingest; returns frames added."""
        if not videos:
            return 0
        cfg = api_cfg or self.config.api
        ing = self.config.ingest
        # ingest.sampling_strategy wires the D4 samplers into the live
        # path (reference chooser: frame_extractor.py:365-388). The
        # default interval rule without the quality gate keeps the
        # native-decoder-eligible fast path (extract_fn=None).
        extract_fn = None
        if ing.sampling_strategy != "interval" or ing.quality_filter:
            import functools

            from video_quierer_tpu.ingest.pipeline import strategy_extract

            # partial of a module-level fn: picklable, so the opt-in
            # process-pool decode tier can ship it to workers
            extract_fn = functools.partial(
                strategy_extract,
                strategy=ing.sampling_strategy,
                max_frames=cfg.max_frames,
                sampling_mode=cfg.sampling_mode,
                target_size=ing.target_size,
                quality_filter=ing.quality_filter)
        added = 0
        with self.lock, self.metrics.timer("ingest"):
            # Re-ingesting a video replaces its rows. The reference
            # appended on re-process, leaving stale duplicate frames in
            # the index (video_search_overhaul.py:391-402 never removes
            # the old rows) — a bug we fix rather than reproduce.
            removed_any = 0
            for video in videos:
                removed_any += self.index.remove_video(Path(video).name)
            for batch in batched_frames(
                    list(videos),
                    max_frames=cfg.max_frames,
                    sampling_mode=cfg.sampling_mode,
                    batch_size=ing.batch_size,
                    num_workers=ing.num_decode_workers,
                    prefetch=ing.prefetch_videos,
                    extract_fn=extract_fn,
                    num_procs=ing.num_decode_procs):
                feats_dev = None
                with self.metrics.timer("embed_batch"):
                    if ing.stream_mirror:
                        feats_dev, feats = self.embed_frames_device(
                            batch.frames)
                    else:
                        feats = self.embed_frames(batch.frames)
                pos = 0
                lo0 = len(self.index)
                for vidx, frames, stamps in group_by_video(batch):
                    n = frames.shape[0]
                    self.index.add_batch(feats[pos: pos + n],
                                         Path(videos[vidx]).name,
                                         stamps)
                    pos += n
                if feats_dev is not None:
                    # device-resident streaming, flushed ONCE per embed
                    # batch: the mirrors are fed by on-device scatters
                    # straight from the embed output — the features
                    # never re-cross the host↔device link, and the
                    # whole batch costs one dispatch
                    self.index.stream_rows_device(feats_dev, offset=0,
                                                  n=pos, lo=lo0)
                added += len(batch)
                if ing.stream_mirror and feats_dev is None:
                    # host-path streaming: still per-batch, so the first
                    # search after the build pays steady-state latency,
                    # not a one-shot multi-GB sync
                    self.index.sync_mirror()
                self.metrics.inc("frames_embedded", len(batch))
            for video in videos:
                if Path(video).exists():
                    self.index.video_hashes[Path(video).name] = \
                        video_identity_hash(video)
            if self.config.index.kind == "ivf":
                if removed_any:
                    # row compaction shifted ids — the tiles are stale
                    self._maybe_build_ivf()
                else:
                    self._ivf_absorb_appends()
        self.query_cache.invalidate_all()
        self.metrics.set_gauge("frames_indexed", len(self.index))
        return added

    # ------------------------------------------------------------------
    # ANN tier (index.kind == "ivf") — VERDICT round 1 item 4: the IVF
    # index is engine-wired, not test-only. Builds happen on mutation
    # paths (exclusive lock); searches only READ self._ivf.
    # ------------------------------------------------------------------

    def _maybe_build_ivf(self) -> None:
        """(Re)build the ANN tier from the current corpus, or drop it when
        disabled / below the size floor. Callers hold the write lock."""
        cfg = self.config.index
        if cfg.kind != "ivf" or self.index.count < cfg.ivf_min_rows:
            self._ivf = None
            self._ivf_rows = 0
            return
        from video_quierer_tpu.index.ivf import IVFIndex
        mesh = self.index.mesh
        if mesh is not None:
            from video_quierer_tpu.index.sharded import is_multislice
            if is_multislice(mesh):
                # the IVF tier shards over single-slice ICI only; on a
                # multi-slice deployment it falls back to one replica
                # (the exact sharded scan remains hierarchical)
                mesh = None
        ivf = IVFIndex(nlist=cfg.ivf_nlist or None, nprobe=cfg.ivf_nprobe,
                       mesh=mesh)
        with self.metrics.timer("ivf_build"):
            ivf.build(self.index._emb[: self.index.count])
        self._ivf = ivf
        self._ivf_rows = self.index.count
        self.metrics.inc("ivf_builds")

    def _ivf_absorb_appends(self) -> None:
        """Fold rows appended since the last build into the IVF fresh
        buffer (exact-scanned until the rebuild threshold); rebuild when
        the buffer outgrows ``rebuild_fraction``. Write lock held."""
        if self._ivf is None:
            self._maybe_build_ivf()
            return
        n = self.index.count
        if n > self._ivf_rows:
            self._ivf.add(self.index._emb[self._ivf_rows: n])
            self._ivf_rows = n
        if self._ivf.needs_rebuild:
            self._maybe_build_ivf()

    def ann_stats(self) -> Dict:
        if self.config.index.kind != "ivf":
            return {"kind": "exact"}
        ivf = self._ivf
        if ivf is None:
            return {"kind": "ivf", "active": False,
                    "reason": f"below ivf_min_rows="
                              f"{self.config.index.ivf_min_rows}"}
        return {"kind": "ivf", "active": True, **ivf.stats()}

    def process_video(self, video_path: Path,
                      api_cfg: Optional[ApiConfig] = None) -> int:
        """Ingest one video (upload path,
        ref: _process_single_video, video_search_overhaul.py:412-437)."""
        return self._ingest([Path(video_path)], api_cfg)

    def remove_video(self, video_name: str) -> int:
        with self.lock:
            removed = self.index.remove_video(video_name)
            if removed and self.config.index.kind == "ivf":
                self._maybe_build_ivf()
        if removed:
            self.query_cache.invalidate_all()
            self.metrics.set_gauge("frames_indexed", len(self.index))
        return removed

    # ------------------------------------------------------------------
    # Search (ref: search, video_search_overhaul.py:439-456)
    # ------------------------------------------------------------------

    def _format(self, results: List[Dict]) -> List[Dict]:
        """Reference result shaping (``formatted_time``,
        video_search_overhaul.py:450-453) + optional enrichment:
        thumbnail URLs when ``thumbnail_base_url`` is configured — the
        dead path's template verbatim (src/video_search_system.py:
        333-337); with it unset the result schema stays the exact
        reference five keys."""
        base = self.config.thumbnail_base_url
        for r in results:
            r["formatted_time"] = format_timestamp(r["timestamp"])
            if base:
                r["thumbnail_url"] = (
                    f"{base}/{r['video_name']}/"
                    f"thumbnail_{r['timestamp']:.2f}.jpg")
        return results

    @staticmethod
    def _dedup_by_video(results: List[Dict], k: int) -> List[Dict]:
        """Keep the best frame per video (dead-path diverse-results
        capability, src/video_search_system.py:234-389 over-fetched k*2
        then deduped per video)."""
        seen = set()
        out = []
        for r in results:
            if r["video_name"] in seen:
                continue
            seen.add(r["video_name"])
            out.append(r)
            if len(out) >= k:
                break
        return out

    # fused executables are compiled per k; fetching at the next bucket
    # and trimming makes every k in [1, 64] hit one of six executables
    # (boot warm-up covers the first three)
    _K_BUCKETS = (1, 5, 10, 16, 32, 64)

    @classmethod
    def _bucket_k(cls, k: int) -> int:
        for b in cls._K_BUCKETS:
            if b >= k:
                return b
        return cls._K_BUCKETS[-1]

    def _search_fused(self, query: str, fetch_k: int
                      ) -> Optional[List[Dict]]:
        """Single-dispatch text search: tokenize on host, then the text
        tower + fused scan run as ONE jitted call
        (DeviceVideoIndex.search_batch_fused; in int8 mode the fused
        dispatch over-fetches and re-ranks on host) — halves the
        per-query device round-trips vs encode → host → scan. Returns
        None when the configuration can't fuse (no jit embedder, disabled
        via ``VQT_FUSED_SEARCH=0``) and the caller takes the two-step
        path."""
        if os.environ.get("VQT_FUSED_SEARCH", "1") == "0":
            return None
        emb = self._get_embedder()
        emb = getattr(emb, "inner", emb)  # unwrap the frame memo
        if emb is None or not hasattr(emb, "text_encode_fn"):
            return None
        if not hasattr(self.index, "search_batch_fused"):
            return None
        try:
            ids = emb.tokenizer([query])
            ids = getattr(emb, "prepare_text_ids", lambda x: x)(ids)
            rows = self.index.search_batch_fused(
                emb.text_encode_fn, emb.params, ids,
                self._bucket_k(fetch_k))[0]
            return rows[:fetch_k]
        except NotImplementedError:
            return None
        except Exception:
            logger.exception("fused search failed — using two-step path")
            self.metrics.inc("fused_search_fallbacks")
            return None

    def search_ex(self, query: str, k: int = 5,
                  use_cache: bool = True,
                  dedup_videos: bool = False,
                  offset: int = 0
                  ) -> Tuple[List[Dict], bool]:
        """Search returning ``(results, from_cache)`` — per-call cache
        attribution (a shared-counter inference would misattribute under
        concurrency).

        ``offset`` pages through the ranking: results [offset, offset+k).
        A paginated query fetches (and caches) the full top-``MAX_K`` page
        set in ONE device scan, so every page of the same query shares one
        scan and one cache entry; ``offset + k`` beyond MAX_K (64) raises.
        """
        from video_quierer_tpu.ops.topk import MAX_K
        offset = max(0, int(offset))
        if offset and offset + k > MAX_K:
            raise ValueError(f"offset + k must be <= {MAX_K}")
        self.metrics.inc("searches")
        cache_on = (use_cache and self.config.api.cache_search
                    and not dedup_videos)
        # paginated requests cache the full top-MAX_K list under one key
        cache_k = MAX_K if offset else k
        if cache_on:
            hit = self.query_cache.get_text(query, cache_k)
            if hit is not None:
                self.metrics.inc("search_cache_hits")
                return [dict(r) for r in hit[offset: offset + k]], True
        if offset:
            fetch_k = MAX_K
        else:
            fetch_k = min(k * 2, MAX_K) if dedup_videos else k
        with self.lock.read(), self.metrics.timer("search_latency"):
            if self._ivf is not None:
                with self.metrics.timer("text_encode"):
                    q = self.encode_text(query)
                with self.metrics.timer("index_scan"):
                    results = self._search_ann(q, fetch_k)
            else:
                results = self._search_fused(query, fetch_k)
            if results is None:
                with self.metrics.timer("text_encode"):
                    q = self.encode_text(query)
                with self.metrics.timer("index_scan"):
                    results = self.index.search(q, fetch_k)
            if dedup_videos:
                results = self._dedup_by_video(results, offset + k)
            results = self._format(results)
        if cache_on:
            self.query_cache.put_text(query, cache_k,
                                      [dict(r) for r in results])
        return results[offset: offset + k], False

    def search(self, query: str, k: int = 5,
               use_cache: bool = True,
               dedup_videos: bool = False,
               offset: int = 0) -> List[Dict]:
        return self.search_ex(query, k, use_cache, dedup_videos, offset)[0]

    def _search_ann(self, q: np.ndarray, k: int) -> List[Dict]:
        """Route one query vector through the IVF tier; rows materialize
        through the SAME metadata path as the exact scan."""
        self.metrics.inc("ann_searches")
        vals, idxs = self._ivf.search(self.index.normalize_query(q), k=k)
        return self.index._rows_from(np.asarray(vals)[None],
                                     np.asarray(idxs)[None])[0]

    def search_batch(self, queries: Sequence[str], k: int = 5
                     ) -> List[List[Dict]]:
        """All queries in ONE device pass (text encode batched + one fused
        scan) — the reference looped serially despite its docstring
        (routes.py:628-634)."""
        self.metrics.inc("searches", len(queries))
        with self.lock.read(), self.metrics.timer("batch_search_latency"):
            batches = self._search_batch_impl(queries, k)
        return [self._format(r) for r in batches]

    def _search_batch_impl(self, queries: Sequence[str], k: int
                           ) -> List[List[Dict]]:
        """Lock-free body of :meth:`search_batch` — the caller holds the
        engine read lock (search_batch itself, or the coalescer's
        pipeline threads, which hand the lock across dispatch/resolve
        phases and must not re-acquire it)."""
        if self._ivf is not None:
            emb = self._get_embedder()
            q = (self._fallback_text.embed_texts(queries) if emb is None
                 else emb.embed_texts(queries))
            qn = np.stack([self.index.normalize_query(r) for r in q])
            self.metrics.inc("ann_searches", len(queries))
            vals, idxs = self._ivf.search(qn, k=k)
            batches = self.index._rows_from(np.asarray(vals),
                                            np.asarray(idxs))
        else:
            batches = self._search_batch_fused(queries, k)
        if batches is None:
            emb = self._get_embedder()
            if emb is None:
                q = self._fallback_text.embed_texts(queries)
            else:
                q = emb.embed_texts(queries)
            batches = self.index.search_batch(q, k)
        return batches

    def _dispatch_batch_fused(self, queries: Sequence[str], k: int):
        """Dispatch phase of the fused batch search: tokenizes, pads to
        the embedder's buckets, and ENQUEUES the fused executable(s) on
        the device (JAX dispatch is asynchronous). Returns a
        ``resolve() -> List[List[Dict]]`` closure (unformatted rows,
        trimmed to ``k``) or ``None`` when the fused path is unavailable.

        The caller must hold the engine read lock from this call through
        ``resolve()`` — in-flight candidate indices must not see rows
        move (DeviceVideoIndex.search_batch_fused_async documents the
        contract). The serving coalescer uses the split to overlap batch
        N's device round-trip with batch N+1's tokenize+dispatch.
        """
        if os.environ.get("VQT_FUSED_SEARCH", "1") == "0":
            return None
        if self._ivf is not None:   # ANN tier routes through search_batch
            return None
        emb = self._get_embedder()
        emb = getattr(emb, "inner", emb)
        if emb is None or not hasattr(emb, "text_encode_fn"):
            return None
        if not hasattr(self.index, "search_batch_fused_async"):
            return None
        try:
            from video_quierer_tpu.models.clip.embedder import (
                TEXT_BUCKETS, _bucket_for)
            # above the widest bucket, chunk — executable shapes stay
            # bounded to the bucket set whatever the caller sends; every
            # chunk is dispatched before any result is fetched
            step = TEXT_BUCKETS[-1]
            parts = []
            from video_quierer_tpu.utils.stageprof import span
            for lo in range(0, len(queries), step):
                chunk = list(queries[lo:lo + step])
                with span("tokenize"):
                    ids = emb.tokenizer(chunk)
                    ids = getattr(emb, "prepare_text_ids",
                                  lambda x: x)(ids)
                n = ids.shape[0]
                bucket = _bucket_for(n, TEXT_BUCKETS)
                if n < bucket:
                    ids = np.concatenate([ids, np.tile(ids[-1:],
                                                       (bucket - n, 1))])
                with span("dispatch"):
                    parts.append((n, self.index.search_batch_fused_async(
                        emb.text_encode_fn, emb.params, ids,
                        self._bucket_k(k))))

            def resolve() -> List[List[Dict]]:
                out: List[List[Dict]] = []
                for n, part in parts:
                    batches = part()
                    out.extend(rows[:k] for rows in batches[:n])
                return out
            return resolve
        except NotImplementedError:
            return None
        except Exception:
            logger.exception("fused batch dispatch failed — two-step path")
            self.metrics.inc("fused_search_fallbacks")
            return None

    def _search_batch_fused(self, queries: Sequence[str], k: int
                            ) -> Optional[List[List[Dict]]]:
        """Batched twin of _search_fused: B queries, one device dispatch
        (dispatch + immediate resolve of ``_dispatch_batch_fused``)."""
        resolve = self._dispatch_batch_fused(queries, k)
        if resolve is None:
            return None
        try:
            return resolve()
        except Exception:
            logger.exception("fused batch search failed — two-step path")
            self.metrics.inc("fused_search_fallbacks")
            return None

    def search_by_vector_ex(self, vector: np.ndarray, k: int = 5,
                            use_cache: bool = True
                            ) -> Tuple[List[Dict], bool]:
        """Image/vector query (dead-path capability restored,
        src/video_search_system.py:284-289)."""
        self.metrics.inc("searches")
        vector = np.asarray(vector, np.float32)
        if use_cache and self.config.api.cache_search:
            hit = self.query_cache.get_vector(vector, k)
            if hit is not None:
                self.metrics.inc("search_cache_hits")
                return [dict(r) for r in hit], True
        with self.lock.read(), self.metrics.timer("search_latency"):
            if self._ivf is not None:
                results = self._format(self._search_ann(vector, k))
            else:
                results = self._format(self.index.search(vector, k))
        if use_cache and self.config.api.cache_search:
            self.query_cache.put_vector(vector, k,
                                        [dict(r) for r in results])
        return results, False

    def search_by_vector(self, vector: np.ndarray, k: int = 5,
                         use_cache: bool = True) -> List[Dict]:
        return self.search_by_vector_ex(vector, k, use_cache)[0]

    def search_coalesced_ex(self, query: str, k: int = 5,
                            use_cache: bool = True
                            ) -> Tuple[List[Dict], bool]:
        """Search through the request coalescer (engine/batching.py):
        concurrent callers within the window share one device pass. Used
        by the API when ``enhanced_mode`` is on — the reference carried
        that flag but gave it no behavior (SURVEY.md L9)."""
        if self._coalescer is None:
            from video_quierer_tpu.engine.batching import SearchCoalescer
            self._coalescer = SearchCoalescer(
                self, max_batch=self.config.coalesce_width)
        return self._coalescer.search_ex(query, k, use_cache)

    def search_coalesced(self, query: str, k: int = 5,
                         use_cache: bool = True) -> List[Dict]:
        return self.search_coalesced_ex(query, k, use_cache)[0]

    def warm_cache(self, queries: Sequence[str], k: int = 5) -> int:
        """Pre-populate the query cache (dead-path ``CacheWarmer`` parity,
        src/storage/cache.py:491-537). Returns number warmed."""
        for q in queries:
            self.search(q, k=k, use_cache=True)
        return len(queries)

    def search_similar_ex(self, video_name: str, timestamp: float,
                          k: int = 5, use_cache: bool = True
                          ) -> Tuple[List[Dict], bool]:
        """'More like this': vector search seeded by the indexed frame
        of ``video_name`` nearest ``timestamp``; the seed frame itself
        is excluded from the results. Extends the restored image/vector
        query family (src/video_search_system.py:284-289) to in-corpus
        seeds — the query embedding is read straight from the index's
        f32 host rows, so no tower forward runs.

        Raises ``KeyError`` if the video has no indexed frames.
        """
        with self.lock.read():
            row = self.index.nearest_frame(video_name, timestamp)
            if row is None:
                raise KeyError(video_name)
            vec = self.index.frame_embedding(row)
            seed = self.index.frame_info(row)
        # over-fetch one so dropping the seed still fills k; the vector
        # path takes its own read lock (RWLock reads don't nest across a
        # queued writer)
        results, from_cache = self.search_by_vector_ex(vec, k + 1,
                                                       use_cache)
        out = [r for r in results
               if not (r["video_name"] == seed["video_name"]
                       and r["frame_id"] == seed["frame_id"])][:k]
        self.metrics.inc("similar_searches")
        return out, from_cache

    def search_similar(self, video_name: str, timestamp: float,
                       k: int = 5, use_cache: bool = True) -> List[Dict]:
        return self.search_similar_ex(video_name, timestamp, k,
                                      use_cache)[0]

    def search_by_image_ex(self, image_rgb_u8: np.ndarray, k: int = 5
                           ) -> Tuple[List[Dict], bool]:
        """Query by raw image: resize→embed→vector search."""
        from video_quierer_tpu.ops.preprocess import \
            resize_shorter_side_and_crop
        img = resize_shorter_side_and_crop(np.asarray(image_rgb_u8))
        vec = self.embed_frames(img[None])[0]
        return self.search_by_vector_ex(vec, k)

    def search_by_image(self, image_rgb_u8: np.ndarray, k: int = 5
                        ) -> List[Dict]:
        return self.search_by_image_ex(image_rgb_u8, k)[0]

    def search_videos(self, query: str, k: int = 5) -> List[Dict]:
        """Video-level search: rank whole videos by the cosine of the
        query against each video's mean frame embedding (a capability
        neither reference path had — frame search plus per-video dedup
        approximates it; this ranks by overall content).

        Returns ``[{video_name, score, frame_count, best_timestamp}]``.
        """
        self.metrics.inc("searches")
        with self.lock.read(), self.metrics.timer("video_search_latency"):
            q = self.encode_text(query)
            # means maintained incrementally in the index; ranking + best
            # frames run in one device dispatch (device_index.py:
            # search_videos) — round 1 recomputed means with an O(N·D)
            # host pass per request.
            return self.index.search_videos(q, k)

    # ------------------------------------------------------------------
    # Maintenance
    # ------------------------------------------------------------------

    def rebuild(self) -> int:
        """Clear and reprocess everything with the current config
        (ref: POST /api/cache/rebuild, routes.py:966-1003)."""
        with self.lock:
            self.index.clear()
            self.query_cache.invalidate_all()
            added = self._ingest(self.current_videos())
            self.index.save_to_disk(self.cache_path)
        return added

    def clear(self) -> None:
        with self.lock:
            self.index.clear()
            self._ivf = None
            self._ivf_rows = 0
            self.query_cache.invalidate_all()
            if self.cache_path.exists():
                self.cache_path.unlink()
        self.metrics.set_gauge("frames_indexed", 0)

    def save(self, path: Optional[Path] = None) -> bool:
        with self.lock:
            return self.index.save_to_disk(Path(path) if path
                                           else self.cache_path)

    def load(self, path: Optional[Path] = None) -> bool:
        with self.lock:
            ok = self.index.load_from_disk(Path(path) if path
                                           else self.cache_path)
            if ok:
                self._maybe_build_ivf()
        if ok:
            self.query_cache.invalidate_all()
            self.metrics.set_gauge("frames_indexed", len(self.index))
        return ok

    @property
    def ready(self) -> bool:
        return self._ready

    def accuracy_mode(self) -> str:
        """Named accuracy contract of the serving index (advisor round-2
        remedy: the approximate-candidate contract is an API-visible
        mode, not a config comment).

        - ``exact-f32-scan``  — f32 mirror, full exact scan (byte-exact
          reference ordering, video_search_overhaul.py:40-64).
        - ``exact-f32-rerank`` — quantized (bf16/int8) mirror: the
          candidate pre-filter is approximate but every returned row is
          exactly re-ranked in f32 against the host/f32 row store;
          clustered-corpus recall@10 = 1.000 at default knobs (permuted
          mirror — see ``IndexConfig.device_dtype``).
        - ``approximate-ivf`` — cluster-pruned ANN tier is live;
          ``nprobe`` trades recall for traffic.
        """
        ann = self.ann_stats()
        if ann.get("kind") == "ivf" and ann.get("active"):
            return "approximate-ivf"
        if self.config.index.device_dtype == "float32":
            return "exact-f32-scan"
        return "exact-f32-rerank"

    def stats(self) -> Dict:
        emb = self._embedder
        return {
            "video_count": len(self.index.video_names()),
            "total_frames_indexed": len(self.index),
            "processor_type": "CLIP" if self.use_clip else "Visual",
            "pretrained": bool(emb.pretrained) if emb is not None else None,
            "cache_exists": self.cache_path.exists(),
            "video_hashes_count": len(self.index.video_hashes),
            "query_cache": self.query_cache.stats(),
            "ann": self.ann_stats(),
            "index": {
                "kind": self.config.index.kind,
                "device_dtype": self.config.index.device_dtype,
                "accuracy_mode": self.accuracy_mode(),
            },
            "metrics": self.metrics.snapshot(),
        }
