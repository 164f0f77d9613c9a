"""Server lifecycle: graceful shutdown auto-save and warmup hook."""

import asyncio
import threading
import time

import pytest
import requests
from aiohttp import web

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.api.app import create_app
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine


def _run_server(app):
    loop = asyncio.new_event_loop()
    state = {}
    ready = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def boot():
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            state["port"] = site._server.sockets[0].getsockname()[1]
            state["runner"] = runner
        loop.run_until_complete(boot())
        ready.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert ready.wait(30)
    return loop, state


@pytest.mark.parametrize("auto_save", [True, False])
def test_shutdown_autosave(tmp_path, auto_save):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "a.mp4", n_frames=30)
    cfg = EngineConfig(api=ApiConfig(max_frames=5, auto_save=auto_save))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=FakeEmbedder())
    app = create_app(engine=engine, config_path=tmp_path / "cfg.json",
                     static_dir=tmp_path)
    loop, state = _run_server(app)
    base = f"http://127.0.0.1:{state['port']}"
    for _ in range(100):
        if requests.get(base + "/health").json()["status"] == "healthy":
            break
        time.sleep(0.1)
    # delete the cache file written at startup, then shut down cleanly
    engine.cache_path.unlink()

    done = threading.Event()

    async def stop():
        await state["runner"].cleanup()
        done.set()
    asyncio.run_coroutine_threadsafe(stop(), loop)
    assert done.wait(20)
    loop.call_soon_threadsafe(loop.stop)
    # auto_save=True → the index was re-persisted on shutdown
    assert engine.cache_path.exists() == auto_save


def test_warmup_precompiles_single_and_coalesced(tmp_path, monkeypatch):
    """VQT_WARMUP=1 exercises the per-k fused executables AND every
    coalesced text-bucket width at boot, so the first concurrent burst
    doesn't absorb a device compile."""
    from video_quierer_tpu.models.clip.embedder import TEXT_BUCKETS

    monkeypatch.setenv("VQT_WARMUP", "1")
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "a.mp4", n_frames=24)
    cfg = EngineConfig(api=ApiConfig(max_frames=5))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=FakeEmbedder())
    app = create_app(engine=engine, config_path=tmp_path / "cfg.json",
                     static_dir=tmp_path)
    loop, state = _run_server(app)
    base = f"http://127.0.0.1:{state['port']}"
    # warm fires in a worker after startup: one search per distinct k +
    # one batch per multi-query bucket up to the configured coalescer
    # width (wider buckets compile lazily; metrics "searches" counts
    # queries)
    width = max(64, cfg.coalesce_width)
    want = len({1, cfg.api.default_results, 10}) + \
        sum(b for b in TEXT_BUCKETS[1:] if b <= width)
    for _ in range(200):
        if engine.metrics.snapshot()["counters"].get("searches",
                                                     0) >= want:
            break
        time.sleep(0.1)
    assert engine.metrics.snapshot()["counters"]["searches"] >= want
    # server still healthy and searchable after the warm pass
    r = requests.post(base + "/api/search",
                      json={"query": "anything", "k": 3})
    assert r.status_code == 200

    done = threading.Event()

    async def stop():
        await state["runner"].cleanup()
        done.set()
    asyncio.run_coroutine_threadsafe(stop(), loop)
    assert done.wait(20)
    loop.call_soon_threadsafe(loop.stop)
