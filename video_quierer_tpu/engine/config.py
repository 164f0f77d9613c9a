"""Two-tier configuration system.

Tier 1 — **API config** (:class:`ApiConfig`): field-for-field parity with
the reference's flat ``config.json`` / ``ConfigurationModel``
(routes.py:100-109 — same nine keys, same defaults), hot-updatable via
``POST /api/config``, persisted as JSON.

Tier 2 — **Engine config** (:class:`EngineConfig`): the richer typed schema
the dead path only sketched in YAML (src/utils/config.py:76-131) — ingest
pipeline, device, index and cache knobs — with environment-variable
overrides (``VQT_*``) and validation. The API config maps onto it; engine
internals never read the flat dict directly.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from pathlib import Path
from typing import Optional

from pydantic import BaseModel

logger = logging.getLogger(__name__)

SAMPLING_MODES = ("ultra_high", "high", "medium", "low")


class ApiConfig(BaseModel):
    """config.json schema — reference parity (routes.py:100-109)."""

    sampling_mode: str = "high"
    max_frames: int = 300
    use_clip: bool = True
    enhanced_mode: bool = True
    default_results: int = 10
    cache_search: bool = True
    search_timeout: int = 30
    auto_save: bool = True
    log_level: str = "INFO"


def load_api_config(path: Path = Path("config.json")) -> ApiConfig:
    """Load (or default) the flat API config; errors fall back to defaults,
    matching the reference's forgiving loader (routes.py:152-167)."""
    try:
        if Path(path).exists():
            with open(path) as f:
                return ApiConfig(**json.load(f))
    except Exception as e:
        logger.error("Failed to load config %s: %s", path, e)
    return ApiConfig()


def save_api_config(config: ApiConfig,
                    path: Path = Path("config.json")) -> bool:
    try:
        with open(path, "w") as f:
            json.dump(config.model_dump(), f, indent=2)
        return True
    except Exception as e:
        logger.error("Failed to save config %s: %s", path, e)
        return False


SAMPLING_STRATEGIES = ("interval", "uniform", "adaptive", "hybrid", "auto")


@dataclasses.dataclass
class IngestConfig:
    batch_size: int = 256
    num_decode_workers: int = 4
    # Opt-in PROCESS-pool decode (0 = thread pool): real decode
    # parallelism on multi-core hosts — the decode tier (~420 source
    # f/s/core at 720p) bounds whole-system ingest wherever Python-side
    # sampling holds the GIL between decodes (ingest/pipeline.py:
    # _make_pool; spawn context, deterministic frame order).
    num_decode_procs: int = 0
    prefetch_videos: int = 8
    target_size: int = 224
    # Frame-sampling strategy (ingest/samplers.py — the dead path's
    # extractor strategies, frame_extractor.py:365-388):
    #   interval  — the live path's fixed-interval rule (default; the
    #               only strategy the native C++ decode tier executes)
    #   uniform   — seek to max_frames evenly spaced positions
    #   adaptive  — scene-change detection (MSE + χ² histogram)
    #   hybrid    — uniform coverage ∪ adaptive peaks
    #   auto      — duration heuristic picks one of the above
    # Non-interval strategies decode on the host OpenCV path.
    sampling_strategy: str = "interval"
    # Brightness-band + Laplacian blur rejection on sampled frames
    # (frame_extractor.py:301-316 semantics, applied to the 224px crop).
    quality_filter: bool = False
    # Stream the device mirror during ingest: after each append batch
    # the new rows scatter to the device mirror immediately (bucketed,
    # capacity growth is a device-side zeros-concat), so the first
    # search after a large build pays steady-state latency instead of a
    # one-shot multi-GB sync (measured 130.7 s at the 10k-video scale —
    # BASELINE.md). Off = the reference-style lazy sync at first query.
    stream_mirror: bool = True


@dataclasses.dataclass
class IndexConfig:
    embed_dim: int = 512
    # capacity pre-allocation hint (rows); the index grows past it freely
    initial_capacity: int = 0
    # corpus sharding: 0 = single device
    corpus_shards: int = 0
    # multi-slice: >1 splits corpus_shards devices into this many slices
    # on a (dcn, corpus) mesh — hierarchical ICI→DCN top-k merge
    corpus_slices: int = 1
    # Device mirror dtype. Default "bfloat16": halves the scan's HBM
    # traffic — its entire cost. The index over-fetches candidates and
    # exactly re-ranks them against its f32 host rows, so returned rows
    # carry exact f32 scores in f32 order whenever the true top-k
    # survive the candidate pre-filter. Structurally they do: the
    # mirror is stored under a fixed row permutation, so the bucketed
    # candidate selection cannot lose adjacent near-duplicates (miss
    # probability ~1e-6 at production shapes — ops/topk.py candidate
    # overview; index/device_index.py). The residual contract boundary
    # is dtype RESOLUTION: rows tied within ~0.4% (bf16) / ~0.8% (int8)
    # of each other are candidate-ranked arbitrarily, so if MORE than
    # the fetch depth (default 128) tie that closely, the returned set
    # can differ from f32 mode inside that tie band. "float32" = exact
    # scan outright (byte-exact reference ordering); "int8" =
    # quarter-traffic, same contract as bf16; "int4" = eighth-traffic
    # packed nibbles (single-device tier — no corpus mesh), same
    # exact-f32-rerank contract with a ~2× coarser candidate
    # pre-filter that the deep fetch absorbs (recall_bench).
    device_dtype: str = "bfloat16"
    # search tier: "exact" = fused full scan (the default; exact-scan
    # mandate, SURVEY.md §6); "ivf" = cluster-pruned ANN (index/ivf.py,
    # the TPU-idiomatic stand-in for the dead path's HNSW,
    # src/indexes/hnsw.py + src/utils/config.py:103-108). IVF serves
    # searches only once built (startup/ingest/rebuild build it); until
    # then — and below ivf_min_rows — queries take the exact scan.
    kind: str = "exact"
    ivf_nlist: int = 0       # 0 = auto (~sqrt(N))
    ivf_nprobe: int = 8
    ivf_min_rows: int = 4096
    # Quantized modes: fuse the exact f32 re-rank into the search
    # dispatch against an identity-layout f32 row store in HBM (one
    # device pass per search, no host re-rank; identical results incl.
    # tie order). "auto" = on for single-device deployments while store
    # + mirror fit VQT_DEVICE_RERANK_BUDGET_GB (default 12);
    # "on"/"off" force it. f32 mode and corpus meshes ignore it.
    device_rerank: str = "auto"
    # Device re-rank store precision: "float32" (f32-exact contract) or
    # "bfloat16" (half the store HBM — the policy that keeps a DEVICE
    # re-rank at corpus scales whose f32 store would not fit; returned
    # scores carry bf16 storage rounding ~1e-3. Sizing:
    # docs/OPERATIONS.md).
    rerank_store_dtype: str = "float32"


@dataclasses.dataclass
class CacheConfig:
    query_cache_size: int = 512
    query_cache_ttl_s: float = 300.0
    similarity_threshold: float = 0.95
    # frame-embedding memo entries (0 = off); re-processing unchanged
    # frames skips the device (CachedFeatureExtractor capability, D5)
    frame_memo_size: int = 0


@dataclasses.dataclass
class ModelConfig:
    # dual-encoder family: "clip" (512-d, reference-compatible) or
    # "siglip" (768-d towers, sigmoid-trained — stronger retrieval when
    # real weights are supplied)
    family: str = "clip"
    name: str = "openai/clip-vit-base-patch32"
    checkpoint_dir: Optional[str] = None
    # serve fine-tuned weights from a train/checkpoint.py step dir
    orbax_checkpoint: Optional[str] = None
    # Tower compute/param dtype. Default "bfloat16": the MXU's native
    # precision — ~2× embed throughput and half the weight/activation HBM
    # traffic vs f32, with CLIP retrieval rankings essentially unchanged
    # (features are L2-normalized f32 on output; the index's candidate→
    # exact-f32-re-rank contract is dtype-agnostic). "float32" restores
    # bit-parity with the f32 reference towers for numerical A/B work.
    dtype: str = "bfloat16"
    # Serving parallelism for the image tower (parallel/pipeline.py):
    #   none — single-device towers (default; B/32 fits in a fraction
    #          of one chip)
    #   pp   — GPipe pipeline over a ``pipe`` mesh axis spanning the
    #          local devices (for the larger tower configs whose
    #          weights/activations exceed one chip)
    parallel: str = "none"
    pipeline_microbatches: int = 4


@dataclasses.dataclass
class EngineConfig:
    videos_dir: str = "videos"
    # Max queries the serving coalescer merges into one device pass
    # (engine/batching.py). The scan's HBM read amortizes across the
    # whole batch, so wider = more throughput under concurrent load at
    # the cost of up to one batch of extra queueing; must be covered by
    # a text bucket (models/clip/embedder.py TEXT_BUCKETS) or the flush
    # pads to the next one.
    coalesce_width: int = 64
    # Result enrichment: when set, every search row carries
    # "thumbnail_url": "{base}/{video_name}/thumbnail_{ts:.2f}.jpg" —
    # the dead path's template (src/video_search_system.py:333-337).
    # Unset (default) keeps the exact reference five-key result schema.
    thumbnail_base_url: Optional[str] = None
    # opt-in: reprocess everything when index-affecting config keys change
    # (the dead-path bridge's config_hash staleness,
    # video_search_system_bridge.py:233-237; the live path never
    # invalidates on config change and neither do we by default)
    invalidate_on_config_change: bool = False
    api: ApiConfig = dataclasses.field(default_factory=ApiConfig)
    ingest: IngestConfig = dataclasses.field(default_factory=IngestConfig)
    index: IndexConfig = dataclasses.field(default_factory=IndexConfig)
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)

    def validate(self) -> None:
        if self.api.sampling_mode not in SAMPLING_MODES:
            raise ValueError(
                f"sampling_mode must be one of {SAMPLING_MODES}")
        if self.api.max_frames <= 0:
            raise ValueError("max_frames must be positive")
        if self.ingest.batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if self.ingest.sampling_strategy not in SAMPLING_STRATEGIES:
            raise ValueError(
                f"sampling_strategy must be one of {SAMPLING_STRATEGIES}")
        if self.index.kind not in ("exact", "ivf"):
            raise ValueError("index.kind must be 'exact' or 'ivf'")
        if self.index.device_dtype not in ("float32", "bfloat16",
                                           "int8", "int4"):
            raise ValueError(
                "index.device_dtype must be one of float32/bfloat16/"
                "int8/int4")
        if self.index.device_dtype == "int4" \
                and self.index.corpus_shards > 1:
            raise ValueError(
                "index.device_dtype='int4' is the single-device tier — "
                "corpus sharding requires 'int8' or 'bfloat16'")
        if self.index.device_rerank not in ("auto", "on", "off"):
            raise ValueError(
                "index.device_rerank must be 'auto', 'on' or 'off'")
        if self.index.rerank_store_dtype not in ("float32", "bfloat16"):
            raise ValueError("index.rerank_store_dtype must be "
                             "'float32' or 'bfloat16'")
        if self.index.ivf_nprobe <= 0:
            raise ValueError("ivf_nprobe must be positive")
        if self.model.parallel not in ("none", "pp"):
            raise ValueError("model.parallel must be 'none' or 'pp'")
        if self.model.parallel == "pp" and self.model.family != "clip":
            raise ValueError(
                "model.parallel='pp' is implemented for the clip family "
                "(parallel/pipeline.py:pipelined_encode_image)")
        if self.model.pipeline_microbatches <= 0:
            raise ValueError("pipeline_microbatches must be positive")
        if self.coalesce_width <= 0:
            raise ValueError("coalesce_width must be positive")


_ENV_OVERRIDES = {
    "VQT_VIDEOS_DIR": ("videos_dir", str),
    "VQT_COALESCE_WIDTH": ("coalesce_width", int),
    "VQT_THUMBNAIL_BASE_URL": ("thumbnail_base_url", str),
    "VQT_BATCH_SIZE": ("ingest.batch_size", int),
    "VQT_DECODE_WORKERS": ("ingest.num_decode_workers", int),
    "VQT_DECODE_PROCS": ("ingest.num_decode_procs", int),
    "VQT_SAMPLING_STRATEGY": ("ingest.sampling_strategy", str),
    "VQT_QUALITY_FILTER": ("ingest.quality_filter",
                           lambda v: v not in ("0", "false", "")),
    "VQT_STREAM_MIRROR": ("ingest.stream_mirror",
                          lambda v: v not in ("0", "false", "")),
    "VQT_CLIP_CHECKPOINT": ("model.checkpoint_dir", str),
    "VQT_MODEL_NAME": ("model.name", str),
    "VQT_DTYPE": ("model.dtype", str),
    "VQT_CORPUS_SHARDS": ("index.corpus_shards", int),
    "VQT_CORPUS_SLICES": ("index.corpus_slices", int),
    "VQT_INDEX_DTYPE": ("index.device_dtype", str),
    "VQT_DEVICE_RERANK": ("index.device_rerank", str),
    "VQT_RERANK_STORE_DTYPE": ("index.rerank_store_dtype", str),
    "VQT_INDEX_KIND": ("index.kind", str),
    "VQT_IVF_NLIST": ("index.ivf_nlist", int),
    "VQT_IVF_NPROBE": ("index.ivf_nprobe", int),
    "VQT_IVF_MIN_ROWS": ("index.ivf_min_rows", int),
    "VQT_MODEL_FAMILY": ("model.family", str),
    "VQT_MODEL_PARALLEL": ("model.parallel", str),
    "VQT_PIPELINE_MICROBATCHES": ("model.pipeline_microbatches", int),
}


def apply_env_overrides(cfg: EngineConfig) -> EngineConfig:
    """``VQT_*`` env vars override engine fields (dead-path D7 had
    env overrides too, src/utils/config.py:27-51)."""
    for env, (dotted, typ) in _ENV_OVERRIDES.items():
        raw = os.environ.get(env)
        if raw is None:
            continue
        obj = cfg
        *parents, leaf = dotted.split(".")
        for p in parents:
            obj = getattr(obj, p)
        try:
            setattr(obj, leaf, typ(raw))
        except ValueError:
            logger.error("Ignoring invalid %s=%r", env, raw)
    return cfg


def _apply_nested(cfg: EngineConfig, data: dict) -> None:
    for key, value in data.items():
        if not hasattr(cfg, key):
            logger.warning("unknown engine config key %r — ignored", key)
            continue
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            for sub, sval in value.items():
                if hasattr(current, sub):
                    setattr(current, sub, sval)
                else:
                    logger.warning("unknown engine config key %s.%s — "
                                   "ignored", key, sub)
        elif key == "api" and isinstance(value, dict):
            cfg.api = ApiConfig(**{**cfg.api.model_dump(), **value})
        else:
            setattr(cfg, key, value)


def load_engine_config(config_json: Path = Path("config.json"),
                       config_yaml: Optional[Path] = None) -> EngineConfig:
    """Engine config = flat config.json (API tier) + optional nested
    ``engine.yaml`` (the dead path's YAML schema role,
    src/utils/config.py) + ``VQT_*`` env overrides, validated."""
    cfg = EngineConfig(api=load_api_config(config_json))
    if config_yaml is None:
        config_yaml = Path(config_json).with_name("engine.yaml")
    if Path(config_yaml).exists():
        try:
            import yaml
            with open(config_yaml) as f:
                data = yaml.safe_load(f) or {}
            _apply_nested(cfg, data)
            logger.info("engine config loaded from %s", config_yaml)
        except Exception as e:
            logger.error("failed to load %s: %s", config_yaml, e)
    apply_env_overrides(cfg)
    cfg.validate()
    return cfg
