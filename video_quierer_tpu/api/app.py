"""HTTP API — the full reference surface on aiohttp.

Endpoint set = the reference's effective surface (SURVEY.md §3.6: the
routes.py set ∪ {``/``, ``/api/video/{id}/frame``, ``/health``}), with the
same paths, status codes and response shapes. Design differences from the
reference (deliberate, SURVEY.md §7):

- ONE engine instance behind every route (the reference ran two separate
  ``VideoSearchSystem`` singletons, §3.1);
- blocking engine work runs in worker threads via ``asyncio.to_thread`` so
  the event loop stays responsive during ingest;
- uploads stream to disk with the 1 GB cap enforced during the copy rather
  than after buffering the whole body in memory (routes.py:421-426);
- ``from_cache`` is truthful (the reference echoed the request flag,
  routes.py:611);
- ``/api/search`` accepts ``data:image/...;base64`` queries — the
  documented-but-unimplemented image search of the reference
  (routes.py:57 description vs. §3.3) — plus bonus ``/metrics``
  (Prometheus) and ``/api/metrics`` endpoints.

Framework note: FastAPI isn't available in this environment; aiohttp
provides the async server. Pydantic still validates bodies with the same
constraints (k ∈ [1,50] → 422, matching FastAPI's validation semantics).
"""

from __future__ import annotations

import asyncio
import base64
import json
import logging
import time
import uuid
from pathlib import Path
from typing import Optional

import numpy as np
from aiohttp import web
from pydantic import ValidationError

from video_quierer_tpu.api.schemas import (
    BatchSearchRequest,
    CacheHealthResult,
    CacheResponse,
    CacheStats,
    SearchRequest,
)
from video_quierer_tpu.engine.config import (
    ApiConfig,
    load_engine_config,
    save_api_config,
)
from video_quierer_tpu.engine.system import (
    VIDEO_EXTENSIONS,
    VideoSearchEngine,
)

logger = logging.getLogger(__name__)

MAX_FILE_SIZE = 1024 * 1024 * 1024  # 1 GB (ref: routes.py:143)
API_VERSION = "2.1.0"

# typed application-state keys (aiohttp's preferred pattern)
ENGINE_KEY = web.AppKey("engine", VideoSearchEngine)
CONFIG_PATH_KEY = web.AppKey("config_path", Path)
START_TIME_KEY = web.AppKey("start_time", float)
STATIC_DIR_KEY = web.AppKey("static_dir", Path)
PROFILER_KEY = web.AppKey("profiler_state", dict)
UPLOADS_KEY = web.AppKey("upload_progress", dict)

# Progress entries kept after completion so a client can read the final
# state; the table is bounded FIFO.
_MAX_UPLOAD_ENTRIES = 256


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _json(data, status: int = 200) -> web.Response:
    return web.json_response(data, status=status)


def _error(status: int, detail: str) -> web.Response:
    return web.json_response({"detail": detail}, status=status)


async def _parse(request: web.Request, model):
    try:
        body = await request.json()
    except Exception:
        raise web.HTTPUnprocessableEntity(
            text=json.dumps({"detail": "invalid JSON body"}),
            content_type="application/json")
    try:
        return model(**body)
    except ValidationError as e:
        raise web.HTTPUnprocessableEntity(
            text=json.dumps({"detail": json.loads(e.json())}),
            content_type="application/json")


def sanitize_filename(filename: str) -> str:
    """Strip any path components from a client-supplied filename.

    The reference wrote ``f"{video_id}_{file.filename}"`` verbatim
    (routes.py:415) — a traversal hole we do not reproduce.
    """
    name = Path(filename.replace("\\", "/")).name
    return name.replace("..", "_").strip(". ") or "upload"


def video_id_of(video_name: str) -> str:
    """Filename → id (ref: routes.py:688)."""
    return video_name.replace(".mp4", "").replace(".", "_")


def _id_matches(video_name: str, video_id: str) -> bool:
    """Reverse id mapping (ref: routes.py:722)."""
    stripped = video_name
    for ext in VIDEO_EXTENSIONS:
        stripped = stripped.replace(ext, "")
    return stripped.replace(".", "_") == video_id


def _find_video_by_id(engine: VideoSearchEngine, video_id: str
                      ) -> Optional[str]:
    for name in engine.index.video_names():
        if _id_matches(name, video_id):
            return name
    return None


def _frame_to_data_uri(frame_bgr: np.ndarray) -> str:
    """BGR frame → JPEG(q85) base64 data URI (ref: server.py:252-273)."""
    import cv2
    ok, buf = cv2.imencode(".jpg", frame_bgr,
                           [int(cv2.IMWRITE_JPEG_QUALITY), 85])
    if not ok:
        return ""
    return "data:image/jpeg;base64," + \
        base64.b64encode(buf.tobytes()).decode()


def _decode_image_query(query: str) -> Optional[np.ndarray]:
    """Decode a data:image/...;base64 query to an RGB uint8 array."""
    if not query.startswith("data:image/"):
        return None
    try:
        import cv2
        payload = query.split(",", 1)[1]
        raw = np.frombuffer(base64.b64decode(payload), np.uint8)
        bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
        if bgr is None:
            return None
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    except Exception:
        return None


def _cache_stats(engine: VideoSearchEngine) -> CacheStats:
    """Ref: routes.py:182-219."""
    path = engine.cache_path
    exists = path.exists()
    size_mb = path.stat().st_size / (1024 * 1024) if exists else 0.0
    last = time.strftime("%Y-%m-%d %H:%M:%S",
                         time.localtime(path.stat().st_mtime)) \
        if exists else "Never"
    return CacheStats(
        embeddings_count=len(engine.index),
        videos_count=len(engine.index.video_names()),
        cache_size_mb=round(size_mb, 2),
        last_updated=last,
        cache_file_exists=exists,
        video_hashes_count=len(engine.index.video_hashes),
    )


def _cache_health(engine: VideoSearchEngine) -> CacheHealthResult:
    """Five checks, same set as the reference (routes.py:222-301)."""
    issues, recs = [], []
    passed = 0
    if engine.cache_path.exists():
        passed += 1
    else:
        issues.append("Cache file does not exist")
        recs.append("Run rebuild cache to create cache file")
    if engine is not None:
        passed += 1
    if len(engine.index) > 0:
        passed += 1
    else:
        issues.append("No embeddings found")
        recs.append("Process some videos to generate embeddings")
    # our columnar store cannot desynchronize embeddings/metadata, so the
    # consistency check is structural:
    passed += 1
    names = engine.index.video_names()
    missing = [n for n in names if not (engine.videos_dir / n).exists()]
    if not missing:
        passed += 1
    else:
        issues.append("Some indexed videos are missing from disk")
        recs.append("Remove missing videos from index or restore files")
    return CacheHealthResult(success=not issues, issues=issues,
                             recommendations=recs, total_checks=5,
                             passed_checks=passed)


# ---------------------------------------------------------------------------
# Middleware
# ---------------------------------------------------------------------------

@web.middleware
async def cors_middleware(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response()
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "*"
    resp.headers["Access-Control-Allow-Headers"] = "*"
    return resp


# ---------------------------------------------------------------------------
# App factory
# ---------------------------------------------------------------------------

def create_app(engine: Optional[VideoSearchEngine] = None,
               videos_dir: str = "videos",
               config_path: Path = Path("config.json"),
               static_dir: Optional[Path] = None,
               run_startup: bool = True,
               startup_timeout: float = 300.0) -> web.Application:
    if engine is None:
        cfg = load_engine_config(config_path)
        engine = VideoSearchEngine(videos_dir, config=cfg)
    app = web.Application(middlewares=[cors_middleware],
                          client_max_size=MAX_FILE_SIZE + 1024 * 1024)
    app[ENGINE_KEY] = engine
    app[CONFIG_PATH_KEY] = Path(config_path)
    app[START_TIME_KEY] = time.time()
    if static_dir is None:
        static_dir = Path(__file__).resolve().parents[2] / "static"
    app[STATIC_DIR_KEY] = Path(static_dir)
    app[PROFILER_KEY] = {}
    app[UPLOADS_KEY] = {}

    async def on_startup(app_: web.Application):
        if run_startup and not engine.ready:
            # startup in a worker thread with a bounded wait; proceed on
            # timeout like the reference (server.py:64-79)
            task = asyncio.get_running_loop().run_in_executor(
                None, engine.startup)
            try:
                await asyncio.wait_for(asyncio.shield(task),
                                       timeout=startup_timeout)
            except asyncio.TimeoutError:
                logger.warning("Engine startup still running after %.0fs — "
                               "serving anyway", startup_timeout)
        import os
        if os.environ.get("VQT_WARMUP") == "1" and engine.use_clip:
            # pre-compile the embedder buckets + the fused search
            # executables for the ks real traffic uses (fused executables
            # are per-k) so the first real request doesn't absorb device
            # compiles
            def _warm():
                emb = engine._get_embedder()
                if hasattr(emb, "warmup"):
                    emb.warmup()
                ks = sorted({1, engine.config.api.default_results, 10})
                # fused executables are per (k, text width, seq bucket):
                # warm the common seq buckets on the single-query path
                # (a 16-token and a ~30-token query; the rare 77-token
                # bucket compiles lazily)
                long_q = " ".join(["warmup"] * 28)
                for k in ks:
                    engine.search("warmup", k=k, use_cache=False)
                    engine.search(long_q, k=k, use_cache=False)
                # coalesced executables compile per text bucket; warm the
                # widths the coalescer actually flushes so the first
                # concurrent burst doesn't absorb a device compile
                from video_quierer_tpu.models.clip.embedder import \
                    TEXT_BUCKETS
                width = max(64, engine.config.coalesce_width)
                for bucket in TEXT_BUCKETS[1:]:
                    if bucket > width:
                        break  # wider buckets compile lazily if ever hit
                    engine.search_batch(
                        [f"warmup {i}" for i in range(bucket)], k=ks[-1])
            asyncio.get_running_loop().run_in_executor(None, _warm)

    async def on_shutdown(app_: web.Application):
        # graceful shutdown with auto-save — the dead path promised this
        # (video_search_system.py:620-642) and the live `auto_save` config
        # flag had no effect; here it decides whether we persist on exit
        if engine.config.api.auto_save and len(engine.index):
            await asyncio.to_thread(engine.save)
            logger.info("auto-saved index on shutdown")

    app.on_startup.append(on_startup)
    app.on_shutdown.append(on_shutdown)
    _register_routes(app)
    return app


def _register_routes(app: web.Application) -> None:
    engine: VideoSearchEngine = app[ENGINE_KEY]
    routes = web.RouteTableDef()

    # -- system ----------------------------------------------------------

    @routes.get("/api")
    async def api_root(request: web.Request):
        return _json({
            "name": "Video Search API (TPU-native)",
            "version": API_VERSION,
            "description": "Semantic video search on JAX/TPU",
            "features": [
                "CLIP-powered semantic search",
                "Multiple video format support",
                "YouTube download integration",
                "Frame-level search results",
                "Configuration management",
                "Cache optimization",
                "Image queries (data URI)",
                "Similar-moment search",
                "Prometheus metrics",
            ],
            "endpoints": {
                "health": "/api/health",
                "search": "/api/search",
                "upload": "/api/videos/upload",
                "videos": "/api/videos",
                "configuration": "/api/config",
                "cache": "/api/cache/stats",
                "metrics": "/metrics",
            },
        })

    @routes.get("/api/openapi.json")
    async def openapi_json(request: web.Request):
        from video_quierer_tpu.api.openapi import openapi_spec
        return _json(openapi_spec(API_VERSION))

    @routes.get("/api/docs")
    async def api_docs(request: web.Request):
        from video_quierer_tpu.api.openapi import docs_html
        return web.Response(text=docs_html(API_VERSION),
                            content_type="text/html")

    @routes.get("/api/health")
    async def api_health(request: web.Request):
        return _json({
            "status": "healthy" if engine.ready else "starting",
            "timestamp": time.time(),
            "components": {
                "video_system": {
                    "status": "healthy" if engine.ready else "not_ready"},
                "index": {
                    "status": "healthy" if len(engine.index) else "empty"},
            },
        })

    @routes.get("/health")
    async def health(request: web.Request):
        return _json({"status": "healthy" if engine.ready else "starting"})

    @routes.get("/api/stats")
    async def api_stats(request: web.Request):
        s = await asyncio.to_thread(engine.stats)
        return _json({
            "uptime_seconds": time.time() - app[START_TIME_KEY],
            "system_ready": engine.ready,
            "video_count": s["video_count"],
            "total_frames_indexed": s["total_frames_indexed"],
            "index_performance": {
                "embeddings_count": s["total_frames_indexed"],
                # named accuracy contract (engine.accuracy_mode):
                # quantized mirrors pre-filter approximately but every
                # returned row is exactly re-ranked in f32
                **s["index"]},
            "feature_extraction": {"processor_type": s["processor_type"]},
            "cache_performance": {"cache_exists": s["cache_exists"]},
            "metrics": {"total_videos": s["video_hashes_count"]},
        })

    @routes.get("/metrics")
    async def metrics_prometheus(request: web.Request):
        return web.Response(text=engine.metrics.export_prometheus(),
                            content_type="text/plain")

    @routes.get("/api/metrics")
    async def metrics_json(request: web.Request):
        return _json(engine.metrics.snapshot())

    # jax.profiler trace capture (SURVEY.md §5: the reference had only
    # ad-hoc wall-clock timers; the rebuild exposes real device traces)
    @routes.post("/api/profiler/start")
    async def profiler_start(request: web.Request):
        import jax
        try:
            body = await request.json()
        except Exception:
            body = {}
        trace_dir = body.get("trace_dir") or "/tmp/vqt_profile"
        try:
            jax.profiler.start_trace(trace_dir)
            app[PROFILER_KEY]["dir"] = trace_dir
            return _json({"success": True, "trace_dir": trace_dir})
        except Exception as e:
            return _error(409, f"profiler start failed: {e}")

    @routes.post("/api/profiler/stop")
    async def profiler_stop(request: web.Request):
        import jax
        try:
            jax.profiler.stop_trace()
            return _json({"success": True,
                          "trace_dir": app[PROFILER_KEY].get("dir")})
        except Exception as e:
            return _error(409, f"profiler stop failed: {e}")

    # -- search ----------------------------------------------------------

    @routes.post("/api/search")
    async def api_search(request: web.Request):
        req = await _parse(request, SearchRequest)
        query = req.query.strip()
        if not query:
            return _error(400, "No query provided")
        t0 = time.time()
        if req.offset and req.offset + req.k > 64:
            return _error(422, "offset + k must be <= 64")
        image = _decode_image_query(query)
        if image is not None:
            coro = asyncio.to_thread(engine.search_by_image_ex, image,
                                     req.k)
        elif req.dedup_videos or req.offset:
            # pagination takes the direct path (the coalescer batches by
            # uniform k; a paginated fetch already shares its device scan
            # across pages via the full-page cache entry)
            coro = asyncio.to_thread(engine.search_ex, query, req.k,
                                     req.use_cache, req.dedup_videos,
                                     req.offset)
        elif engine.config.api.enhanced_mode:
            # enhanced_mode → coalesce concurrent searches into one
            # device pass (engine/batching.py)
            coro = asyncio.to_thread(engine.search_coalesced_ex, query,
                                     req.k, req.use_cache)
        else:
            coro = asyncio.to_thread(engine.search_ex, query, req.k,
                                     req.use_cache)
        # the search_timeout config key had no effect in the reference
        # (SURVEY.md L9); here it bounds the request. Until the first
        # search completes, the bound stretches to cover device
        # compilation (minutes on TPU without a warm compile cache —
        # VQT_WARMUP=1 moves that cost to boot).
        timeout = max(1, int(engine.config.api.search_timeout))
        warmed = engine.metrics.histogram_stats(
            "search_latency_ms").get("count", 0) > 0
        if not warmed:
            timeout = max(timeout, 600)
        try:
            results, from_cache = await asyncio.wait_for(coro,
                                                         timeout=timeout)
        except asyncio.TimeoutError:
            return _error(504, f"Search timed out after {timeout}s")
        return _json({
            "results": results,
            "search_time_ms": (time.time() - t0) * 1000.0,
            "from_cache": from_cache,
            "query_id": str(uuid.uuid4()),
            "performance": {"results_count": len(results)},
        })

    def _parse_k(body, default=5):
        """k as a validated int (422 on junk, matching pydantic routes)."""
        try:
            k = int(body.get("k", default))
        except (TypeError, ValueError):
            raise web.HTTPUnprocessableEntity(
                text=json.dumps({"detail": "k must be an integer"}),
                content_type="application/json")
        if not 1 <= k <= 50:
            raise web.HTTPUnprocessableEntity(
                text=json.dumps({"detail": "k must be in [1, 50]"}),
                content_type="application/json")
        return k

    @routes.post("/api/search/videos")
    async def api_search_videos(request: web.Request):
        """Video-level search: rank whole videos by mean-frame cosine
        (extension; body ``{"query": str, "k": int}``)."""
        try:
            body = await request.json()
            assert isinstance(body, dict)
        except Exception:
            return _error(422, "invalid JSON body")
        query = str(body.get("query", "")).strip()
        k = _parse_k(body)
        if not query:
            return _error(400, "No query provided")
        t0 = time.time()
        results = await asyncio.to_thread(engine.search_videos, query, k)
        return _json({
            "results": results,
            "search_time_ms": (time.time() - t0) * 1000.0,
            "query_id": str(uuid.uuid4()),
            "performance": {"results_count": len(results)},
        })

    @routes.post("/api/search/vector")
    async def api_search_vector(request: web.Request):
        """Raw-vector query (dead-path capability,
        src/video_search_system.py:284-289): body
        ``{"vector": [512 floats], "k": 5}``."""
        try:
            body = await request.json()
            assert isinstance(body, dict)
        except Exception:
            return _error(422, "invalid JSON body")
        vec = body.get("vector")
        k = _parse_k(body)
        if not isinstance(vec, list) or \
                len(vec) != engine.index.dim:
            return _error(422,
                          f"vector must be a list of {engine.index.dim} "
                          f"floats")
        try:
            vector = np.asarray(vec, np.float32)
        except (TypeError, ValueError):
            return _error(422, "vector entries must be numbers")
        if not np.isfinite(vector).all():
            return _error(422, "vector entries must be finite")
        t0 = time.time()
        results, from_cache = await asyncio.to_thread(
            engine.search_by_vector_ex, vector, k,
            bool(body.get("use_cache", True)))
        return _json({
            "results": results,
            "search_time_ms": (time.time() - t0) * 1000.0,
            "from_cache": from_cache,
            "query_id": str(uuid.uuid4()),
            "performance": {"results_count": len(results)},
        })

    @routes.post("/api/search/similar")
    async def api_search_similar(request: web.Request):
        """'More like this': body ``{"video_name": str, "timestamp":
        float, "k": 5}`` — vector search seeded by the indexed frame of
        that video nearest the timestamp (seed excluded). The query
        embedding comes from the index's own f32 rows, so no text/image
        tower runs (engine.search_similar_ex)."""
        try:
            body = await request.json()
            assert isinstance(body, dict)
        except Exception:
            return _error(422, "invalid JSON body")
        video_name = str(body.get("video_name", "")).strip()
        if not video_name:
            return _error(400, "No video_name provided")
        k = _parse_k(body)
        try:
            timestamp = float(body.get("timestamp", 0.0))
        except (TypeError, ValueError):
            return _error(422, "timestamp must be a number")
        t0 = time.time()
        try:
            results, from_cache = await asyncio.to_thread(
                engine.search_similar_ex, video_name, timestamp, k,
                bool(body.get("use_cache", True)))
        except KeyError:
            return _error(404, f"Video not found in index: {video_name}")
        return _json({
            "results": results,
            "search_time_ms": (time.time() - t0) * 1000.0,
            "from_cache": from_cache,
            "query_id": str(uuid.uuid4()),
            "performance": {"results_count": len(results)},
        })

    @routes.post("/api/search/image")
    async def api_search_image(request: web.Request):
        """Image search by multipart upload (``file`` part + optional
        ``k`` field) — the file-upload twin of data-URI queries."""
        reader = await request.multipart()
        k = 5
        image = None
        while True:
            part = await reader.next()
            if part is None:
                break
            if part.name == "k":
                try:
                    k = int((await part.text()).strip())
                except ValueError:
                    return _error(422, "k must be an integer")
            elif part.name == "file":
                data = await part.read()
                import cv2
                arr = np.frombuffer(data, np.uint8)
                bgr = cv2.imdecode(arr, cv2.IMREAD_COLOR)
                if bgr is None:
                    return _error(400, "could not decode image")
                image = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if image is None:
            return _error(400, "No image file provided")
        if not 1 <= k <= 50:
            return _error(422, "k must be in [1, 50]")
        t0 = time.time()
        results, from_cache = await asyncio.to_thread(
            engine.search_by_image_ex, image, k)
        return _json({
            "results": results,
            "search_time_ms": (time.time() - t0) * 1000.0,
            "from_cache": from_cache,
            "query_id": str(uuid.uuid4()),
            "performance": {"results_count": len(results)},
        })

    @routes.post("/api/search/batch")
    async def api_search_batch(request: web.Request):
        req = await _parse(request, BatchSearchRequest)
        batches = await asyncio.to_thread(engine.search_batch, req.queries,
                                          req.k)
        results = [{"query": q, "results": r, "count": len(r)}
                   for q, r in zip(req.queries, batches)]
        return _json({
            "results": results,
            "query_count": len(req.queries),
            "total_results": sum(len(r["results"]) for r in results),
        })

    @routes.post("/search")
    async def search_legacy(request: web.Request):
        """Legacy shape (ref: routes.py:840-856)."""
        try:
            body = await request.json()
        except Exception:
            body = {}
        query = str(body.get("query", ""))
        k = int(body.get("k", 5))
        if not query.strip():
            return _error(400, "No query provided")
        t0 = time.time()
        results = await asyncio.to_thread(engine.search, query, k,
                                          bool(body.get("use_cache", True)))
        return _json({
            "success": True,
            "results": results,
            "search_time": time.time() - t0,
            "query": query,
        })

    # -- videos ----------------------------------------------------------

    def _progress_entry(request: web.Request) -> Optional[dict]:
        """Register a progress record when the client passed
        ``?upload_id=`` (extension: the reference's UI had no way to see
        server-side upload state; this + the progress endpoints stream
        it)."""
        upload_id = request.query.get("upload_id")
        if not upload_id:
            return None
        table = request.app[UPLOADS_KEY]
        while len(table) >= _MAX_UPLOAD_ENTRIES:
            table.pop(next(iter(table)))
        entry = {
            "upload_id": upload_id,
            "phase": "receiving",
            "bytes_received": 0,
            "total_bytes": request.content_length,
            "frames_indexed": None,
            "error": None,
            "done": False,
            "updated_at": time.time(),
        }
        table[upload_id] = entry
        return entry

    def _progress(entry: Optional[dict], **kw) -> None:
        if entry is not None:
            entry.update(kw, updated_at=time.time())

    @routes.post("/api/videos/upload")
    async def upload_video(request: web.Request):
        reader = await request.multipart()
        video_id = None
        tmp_path: Optional[Path] = None
        saved_path: Optional[Path] = None
        filename = None
        prog = _progress_entry(request)

        def _reject(msg: str):
            _progress(prog, phase="error", done=True, error=msg)
            return _error(400, msg)

        try:
            # stream the file to a temp name first: the video_id part may
            # arrive before OR after the file part (field order is
            # client-controlled), and the final name depends on both
            while True:
                part = await reader.next()
                if part is None:
                    break
                if part.name == "video_id":
                    video_id = sanitize_filename(
                        (await part.text()).strip()) or None
                elif part.name == "file":
                    filename = part.filename
                    if not filename:
                        return _reject("No file provided")
                    filename = sanitize_filename(filename)
                    ext = Path(filename).suffix.lower()
                    if ext not in VIDEO_EXTENSIONS:
                        return _reject(f"Unsupported file type: {ext}")
                    tmp_path = engine.videos_dir / \
                        f".upload_{uuid.uuid4().hex}{ext}"
                    size = 0
                    with open(tmp_path, "wb") as f:
                        while True:
                            chunk = await part.read_chunk(1 << 20)
                            if not chunk:
                                break
                            size += len(chunk)
                            _progress(prog, bytes_received=size)
                            if size > MAX_FILE_SIZE:
                                raise web.HTTPRequestEntityTooLarge(
                                    max_size=MAX_FILE_SIZE,
                                    actual_size=size,
                                    text=json.dumps({
                                        "detail":
                                            "File too large (max 1GB)"}),
                                    content_type="application/json")
                            f.write(chunk)
            if tmp_path is None:
                return _reject("No file provided")
            video_id = video_id or str(uuid.uuid4())
            saved_path = engine.videos_dir / f"{video_id}_{filename}"
            tmp_path.replace(saved_path)
            tmp_path = None
            t0 = time.time()
            _progress(prog, phase="processing")
            frames = await asyncio.to_thread(engine.process_video,
                                             saved_path)
            _progress(prog, phase="saving", frames_indexed=frames)
            await asyncio.to_thread(engine.save)
            dt = time.time() - t0
            _progress(prog, phase="done", done=True)
            return _json({
                "video_id": video_id,
                "status": "success",
                "frames_indexed": frames,
                "processing_time": dt,
                "performance": {
                    "frames_per_second": frames / dt if dt > 0 else 0},
            })
        except web.HTTPException as e:
            _progress(prog, phase="error", done=True,
                      error=getattr(e, "text", str(e)))
            for p in (tmp_path, saved_path):
                if p is not None and p.exists():
                    p.unlink()
            raise
        except Exception as e:
            logger.exception("Upload failed")
            _progress(prog, phase="error", done=True, error=str(e))
            for p in (tmp_path, saved_path):
                if p is not None and p.exists():
                    p.unlink()
            return _error(500, f"Upload failed: {e}")

    @routes.get("/api/videos/upload/progress/{upload_id}")
    async def upload_progress(request: web.Request):
        entry = request.app[UPLOADS_KEY].get(
            request.match_info["upload_id"])
        if entry is None:
            return _error(404, "Unknown upload_id")
        return _json(entry)

    @routes.get("/api/videos/upload/progress/{upload_id}/stream")
    async def upload_progress_stream(request: web.Request):
        """Server-sent events: one ``progress`` event per state change
        until the upload completes or errors."""
        table = request.app[UPLOADS_KEY]
        upload_id = request.match_info["upload_id"]
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive",
        })
        await resp.prepare(request)
        last = None
        deadline = time.time() + 600
        # a UI opens this stream BEFORE (or while) the POST registers the
        # entry — wait a grace window for it to appear
        grace = time.time() + 10
        while time.time() < deadline:
            entry = table.get(upload_id)
            if entry is None:
                if time.time() < grace:
                    await asyncio.sleep(0.1)
                    continue
                await resp.write(b"event: error\n"
                                 b"data: {\"detail\": \"Unknown "
                                 b"upload_id\"}\n\n")
                break
            snap = json.dumps(entry, default=str)
            if snap != last:
                last = snap
                await resp.write(
                    f"event: progress\ndata: {snap}\n\n".encode())
            if entry.get("done"):
                break
            await asyncio.sleep(0.15)
        await resp.write_eof()
        return resp

    @routes.get("/api/videos")
    async def list_videos(request: web.Request):
        try:
            limit = int(request.query.get("limit", 100))
            offset = int(request.query.get("offset", 0))
        except ValueError:
            return _error(400, "limit/offset must be integers")
        if limit > 1000:
            return _error(400, "Limit too large (max 1000)")
        counts = engine.index.video_frame_counts()  # one O(N) pass
        videos = []
        for name, count in counts.items():
            path = engine.videos_dir / name
            videos.append({
                "filename": name,
                "video_id": video_id_of(name),
                "frame_count": count,
                "size": path.stat().st_size if path.exists() else 0,
                "processed_at": time.time(),
            })
        videos = videos[offset: offset + limit]
        return _json({"videos": videos, "count": len(videos),
                      "limit": limit, "offset": offset})

    @routes.get("/videos")
    async def list_videos_legacy(request: web.Request):
        resp = []
        for name in engine.index.video_names():
            path = engine.videos_dir / name
            resp.append({
                "name": name,
                "size": path.stat().st_size if path.exists() else 0,
                "modified": path.stat().st_mtime if path.exists() else 0,
            })
        return _json({"videos": resp})

    @routes.get("/api/videos/{video_id}")
    async def video_info(request: web.Request):
        video_id = request.match_info["video_id"]
        counts = engine.index.video_frame_counts()
        # substring match, as in the reference (routes.py:655)
        for name, count in counts.items():
            if video_id in name:
                return _json({
                    "video_id": video_id,
                    "filename": name,
                    "exists": (engine.videos_dir / name).exists(),
                    "frame_count": count,
                })
        return _error(404, "Video not found")

    @routes.delete("/api/videos/{video_id}")
    async def delete_video(request: web.Request):
        video_id = request.match_info["video_id"]
        name = _find_video_by_id(engine, video_id)
        if name is None:
            matches = list(engine.videos_dir.glob(f"*{video_id}*"))
            if not matches:
                return _error(404, "Video not found")
            name = matches[0].name
        path = engine.videos_dir / name
        if path.exists():
            path.unlink()
        removed = await asyncio.to_thread(engine.remove_video, name)
        if removed == 0 and not path.exists():
            # file gone and nothing indexed → treat as not found, like the
            # reference's combined check (routes.py:764-766)
            pass
        await asyncio.to_thread(engine.save)
        return _json({"status": "deleted", "video_id": video_id,
                      "filename": name})

    @routes.post("/api/videos/download-youtube")
    async def download_youtube(request: web.Request):
        try:
            body = await request.json()
        except Exception:
            body = {}
        url = str(body.get("url", "")).strip()
        quality = body.get("quality", "best")
        overrides = body.get("config", {}) or {}
        if not url:
            return _error(400, "No URL provided")
        if "youtube.com/watch" not in url and "youtu.be/" not in url:
            return _error(400, "Invalid YouTube URL")
        try:
            import yt_dlp  # noqa: F401
        except ImportError:
            return _error(500, "yt-dlp not installed. "
                          "Install with: pip install yt-dlp")
        video_id = str(uuid.uuid4())
        t0 = time.time()
        try:
            def _download():
                import yt_dlp
                fmt = {
                    "best": "best[ext=mp4]/best",
                    "720p": "best[height<=720][ext=mp4]/best[height<=720]",
                    "480p": "best[height<=480][ext=mp4]/best[height<=480]",
                    "360p": "best[height<=360][ext=mp4]/best[height<=360]",
                    "worst": "worst[ext=mp4]/worst",
                }.get(quality, "best[ext=mp4]/best")
                opts = {
                    "format": fmt,
                    "outtmpl": str(engine.videos_dir /
                                   f"{video_id}_%(title)s.%(ext)s"),
                    "restrictfilenames": True,
                    "no_warnings": True,
                }
                with yt_dlp.YoutubeDL(opts) as ydl:
                    info = ydl.extract_info(url, download=False)
                    title = info.get("title", "Unknown")
                    ydl.download([url])
                return title

            title = await asyncio.to_thread(_download)
            files = list(engine.videos_dir.glob(f"{video_id}_*"))
            if not files:
                return _error(500, "Download completed but file not found")
            video_path = files[0]
            cfg = None
            if overrides:
                cfg = ApiConfig(**{**engine.config.api.model_dump(),
                                   **overrides})
            frames = await asyncio.to_thread(engine.process_video,
                                             video_path, cfg)
            await asyncio.to_thread(engine.save)
            dt = time.time() - t0
            return _json({
                "video_id": video_id,
                "status": "success",
                "title": title,
                "filename": video_path.name,
                "frames_indexed": frames,
                "processing_time": dt,
                "quality": quality,
                "url": url,
                "performance": {
                    "frames_per_second": frames / dt if dt > 0 else 0},
            })
        except Exception as e:
            for f in engine.videos_dir.glob(f"{video_id}_*"):
                f.unlink()
            return _error(500, f"YouTube download failed: {e}")

    @routes.get("/videos/{filename}")
    async def serve_video(request: web.Request):
        filename = request.match_info["filename"]
        path = engine.videos_dir / filename
        if not path.exists() or not path.is_file() \
                or path.parent != engine.videos_dir:
            return _error(404, f"Video not found: {filename}")
        return web.FileResponse(path, headers={"Accept-Ranges": "bytes"})

    @routes.get("/api/video/{video_id}/frame")
    async def video_frame(request: web.Request):
        video_id = request.match_info["video_id"]
        try:
            timestamp = float(request.query["timestamp"])
        except (KeyError, ValueError):
            return _error(422, "timestamp query parameter required")
        name = _find_video_by_id(engine, video_id)
        if name is None:
            return _json({"success": False, "error": "Video not found",
                          "frame_data": None, "timestamp": timestamp,
                          "video_name": "unknown"})
        path = engine.videos_dir / name
        if not path.exists():
            return _json({"success": False,
                          "error": "Video file not found on disk",
                          "frame_data": None, "timestamp": timestamp,
                          "video_name": name})
        from video_quierer_tpu.ingest.frames import frame_at_timestamp
        frame = await asyncio.to_thread(frame_at_timestamp, path, timestamp)
        if frame is None:
            return _json({"success": False,
                          "error": "Failed to extract frame at timestamp",
                          "frame_data": None, "timestamp": timestamp,
                          "video_name": name})
        data = _frame_to_data_uri(frame)
        if not data:
            return _json({"success": False,
                          "error": "Failed to encode frame",
                          "frame_data": None, "timestamp": timestamp,
                          "video_name": name})
        return _json({"success": True, "frame_data": data, "error": None,
                      "timestamp": timestamp, "video_name": name})

    # -- index persistence ----------------------------------------------

    def _resolve_index_path(filepath: str) -> Optional[Path]:
        """Contain index save/load targets to the videos dir (or an
        operator-allowlisted dir via VQT_INDEX_IO_DIR). The reference
        accepted arbitrary paths (routes.py:778-810) — an unauthenticated
        arbitrary file write/read we do not reproduce."""
        import os
        roots = [engine.videos_dir.resolve()]
        extra = os.environ.get("VQT_INDEX_IO_DIR")
        if extra:
            roots.append(Path(extra).resolve())
        p = Path(filepath)
        if not p.is_absolute():
            p = engine.videos_dir / p
        p = p.resolve()
        for root in roots:
            if p == root or root in p.parents:
                return p
        return None

    @routes.post("/api/index/save")
    async def index_save(request: web.Request):
        filepath = request.query.get("filepath")
        if not filepath:
            return _error(422, "filepath query parameter required")
        target = _resolve_index_path(filepath)
        if target is None:
            return _error(403, "filepath outside the allowed directories")
        ok = await asyncio.to_thread(engine.save, target)
        if not ok:
            return _error(500, "Failed to save index")
        return _json({"status": "saved", "filepath": filepath})

    @routes.post("/api/index/load")
    async def index_load(request: web.Request):
        filepath = request.query.get("filepath")
        if not filepath:
            return _error(422, "filepath query parameter required")
        target = _resolve_index_path(filepath)
        if target is None:
            return _error(403, "filepath outside the allowed directories")
        ok = await asyncio.to_thread(engine.load, target)
        if not ok:
            return _error(500, "Failed to load index")
        return _json({"status": "loaded", "filepath": filepath})

    # -- configuration ---------------------------------------------------

    @routes.get("/api/config")
    async def get_config(request: web.Request):
        return _json({"success": True,
                      "config": engine.config.api.model_dump(),
                      "message": "Configuration retrieved successfully"})

    @routes.post("/api/config")
    async def set_config(request: web.Request):
        cfg = await _parse(request, ApiConfig)
        # same validation the startup loader applies — otherwise e.g.
        # max_frames=0 is accepted here and silently breaks every later
        # ingest (sampling_interval divides by it)
        probe = engine.config
        old = probe.api
        probe.api = cfg
        try:
            probe.validate()
        except ValueError as e:
            probe.api = old
            return _error(422, str(e))
        ok = save_api_config(cfg, app[CONFIG_PATH_KEY])
        if cfg.log_level in ("DEBUG", "INFO", "WARNING", "ERROR"):
            logging.getLogger().setLevel(getattr(logging, cfg.log_level))
        return _json({
            "success": ok,
            "config": cfg.model_dump(),
            "message": "Configuration updated successfully" if ok
            else "Failed to save configuration"})

    @routes.post("/api/config/reset")
    async def reset_config(request: web.Request):
        cfg = ApiConfig()
        engine.config.api = cfg
        ok = save_api_config(cfg, app[CONFIG_PATH_KEY])
        return _json({
            "success": ok,
            "config": cfg.model_dump(),
            "message": "Configuration reset to defaults" if ok
            else "Failed to save default configuration"})

    # -- cache management -------------------------------------------------

    @routes.get("/api/cache/stats")
    async def cache_stats(request: web.Request):
        """Flat shape the web UI consumes (ref: routes.py:944-953)."""
        try:
            s = _cache_stats(engine)
            last = None
            if s.last_updated not in ("Never", "Error"):
                last = int(time.mktime(time.strptime(
                    s.last_updated, "%Y-%m-%d %H:%M:%S")))
            return _json({
                "success": True,
                "embeddings": s.embeddings_count,
                "videos": s.videos_count,
                "size": s.cache_size_mb * 1024 * 1024,
                "last_updated": last,
                "cache_file_exists": s.cache_file_exists,
                "video_hashes_count": s.video_hashes_count,
            })
        except Exception as e:
            logger.exception("cache stats failed")
            return _json({"success": False, "embeddings": 0, "videos": 0,
                          "size": 0, "last_updated": None,
                          "cache_file_exists": False,
                          "video_hashes_count": 0})

    @routes.post("/api/cache/rebuild")
    async def cache_rebuild(request: web.Request):
        try:
            await asyncio.to_thread(engine.rebuild)
            cfg = engine.config.api
            return _json(CacheResponse(
                success=True, stats=_cache_stats(engine),
                message=f"Cache rebuilt successfully with config: "
                        f"max_frames={cfg.max_frames}, "
                        f"use_clip={cfg.use_clip}").model_dump())
        except Exception as e:
            logger.exception("rebuild failed")
            return _json(CacheResponse(
                success=False,
                message=f"Failed to rebuild cache: {e}").model_dump())

    @routes.post("/api/cache/clear")
    async def cache_clear(request: web.Request):
        try:
            await asyncio.to_thread(engine.clear)
            return _json(CacheResponse(
                success=True, stats=_cache_stats(engine),
                message="Cache cleared successfully").model_dump())
        except Exception as e:
            return _json(CacheResponse(
                success=False,
                message=f"Failed to clear cache: {e}").model_dump())

    @routes.get("/api/cache/health")
    async def cache_health(request: web.Request):
        return _json(_cache_health(engine).model_dump())

    @routes.post("/api/cache/warm")
    async def cache_warm(request: web.Request):
        """Pre-populate the query cache (CacheWarmer capability, D2)."""
        try:
            body = await request.json()
        except Exception:
            body = {}
        queries = body.get("queries") or []
        k = int(body.get("k", 5))
        if not isinstance(queries, list) or not queries:
            return _error(400, "queries list required")
        warmed = await asyncio.to_thread(engine.warm_cache,
                                         [str(q) for q in queries], k)
        return _json({"success": True, "warmed": warmed})

    @routes.get("/api/cache/export")
    async def cache_export(request: web.Request):
        if not engine.cache_path.exists():
            return _error(404, "Cache file not found")
        return web.FileResponse(
            engine.cache_path,
            headers={
                "Content-Disposition":
                    'attachment; filename="video_search_cache_export.pkl"',
                "Content-Type": "application/octet-stream",
            })

    @routes.post("/api/cache/import")
    async def cache_import(request: web.Request):
        reader = await request.multipart()
        part = await reader.next()
        while part is not None and part.name != "file":
            part = await reader.next()
        if part is None:
            return _error(400, "No file provided")
        if not (part.filename or "").endswith(".pkl"):
            return _error(400, "Invalid file type. Must be a .pkl file")
        data = await part.read()
        # Validate into a scratch index FIRST (restricted unpickler — no
        # arbitrary globals), then replace the live cache; a bad import
        # must not destroy the existing cache or the in-memory index.
        tmp = engine.cache_path.with_suffix(".import_tmp")
        tmp.write_bytes(data)

        def _validate() -> bool:
            from video_quierer_tpu.index.device_index import \
                DeviceVideoIndex
            probe = DeviceVideoIndex(dim=engine.index.dim)
            return probe.load_from_disk(tmp, verify=False)

        ok = await asyncio.to_thread(_validate)
        if not ok:
            tmp.unlink(missing_ok=True)
            return _json(CacheResponse(
                success=False,
                message="Failed to import cache: invalid cache file"
                ).model_dump())
        tmp.replace(engine.cache_path)
        # drop a stale checksum sidecar from a previous save
        sidecar = Path(str(engine.cache_path) + ".sha256")
        sidecar.unlink(missing_ok=True)
        ok = await asyncio.to_thread(engine.load)
        return _json(CacheResponse(
            success=ok, stats=_cache_stats(engine),
            message="Cache imported successfully" if ok
            else "Failed to import cache").model_dump())

    # -- UI ---------------------------------------------------------------

    @routes.get("/")
    async def root(request: web.Request):
        index = app[STATIC_DIR_KEY] / "index.html"
        if index.exists():
            return web.FileResponse(index)
        return web.Response(
            text="<h1>UI not found</h1><p>static/index.html missing.</p>",
            content_type="text/html")

    app.add_routes(routes)
    if app[STATIC_DIR_KEY].exists():
        app.router.add_static("/static", app[STATIC_DIR_KEY])


def run(host: str = "0.0.0.0", port: int = 5001, **kwargs) -> None:
    app = create_app(**kwargs)
    web.run_app(app, host=host, port=port)
