"""Golden response-shape regression guard.

Records the key-structure of every JSON endpoint's response once
(tests/golden_shapes.json, committed) and fails if a future change alters
it — the cross-round guard for SURVEY.md §3.6 response-shape parity.
Regenerate deliberately with:  VQT_UPDATE_GOLDEN=1 pytest tests/test_golden_shapes.py
"""

import asyncio
import json
import os
import threading
import time
from pathlib import Path

import pytest
import requests
from aiohttp import web

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.api.app import create_app
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine

GOLDEN = Path(__file__).parent / "golden_shapes.json"


def shape_of(value, depth=0):
    """Structural skeleton: dict key-sets, list element shape, leaf types."""
    if isinstance(value, dict):
        return {k: shape_of(v, depth + 1) for k, v in sorted(value.items())}
    if isinstance(value, list):
        return [shape_of(value[0], depth + 1)] if value else []
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, (int, float)):
        return "number"
    if value is None:
        return "null"
    return "string"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    vids = tmp / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "g.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=FakeEmbedder())
    app = create_app(engine=engine, config_path=tmp / "config.json",
                     static_dir=tmp)
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
        loop.run_until_complete(boot())
        ready.set()
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert ready.wait(30)
    base = f"http://127.0.0.1:{state['port']}"
    for _ in range(100):
        if requests.get(base + "/health").json()["status"] == "healthy":
            break
        time.sleep(0.1)
    yield base
    loop.call_soon_threadsafe(loop.stop)


def collect_shapes(base: str) -> dict:
    calls = {
        "GET /health": lambda: requests.get(base + "/health"),
        "GET /api/health": lambda: requests.get(base + "/api/health"),
        "GET /api/stats": lambda: requests.get(base + "/api/stats"),
        "POST /api/search": lambda: requests.post(
            base + "/api/search", json={"query": "golden", "k": 2}),
        "POST /api/search/batch": lambda: requests.post(
            base + "/api/search/batch", json={"queries": ["a"], "k": 2}),
        "POST /api/search/videos": lambda: requests.post(
            base + "/api/search/videos", json={"query": "g", "k": 1}),
        "POST /api/search/similar": lambda: requests.post(
            base + "/api/search/similar",
            json={"video_name": "g.mp4", "timestamp": 0.0, "k": 2}),
        "POST /search": lambda: requests.post(
            base + "/search", json={"query": "legacy", "k": 1}),
        "GET /api/videos": lambda: requests.get(base + "/api/videos"),
        "GET /videos": lambda: requests.get(base + "/videos"),
        "GET /api/videos/{id}": lambda: requests.get(
            base + "/api/videos/g"),
        "GET /api/video/{id}/frame": lambda: requests.get(
            base + "/api/video/g/frame", params={"timestamp": 0.2}),
        "GET /api/config": lambda: requests.get(base + "/api/config"),
        "GET /api/cache/stats": lambda: requests.get(
            base + "/api/cache/stats"),
        "GET /api/cache/health": lambda: requests.get(
            base + "/api/cache/health"),
        "GET /api/metrics": lambda: requests.get(base + "/api/metrics"),
    }
    shapes = {}
    for name, call in calls.items():
        resp = call()
        assert resp.status_code == 200, (name, resp.status_code)
        body = resp.json()
        # metrics content varies; only record top-level keys
        if name == "GET /api/metrics":
            shapes[name] = sorted(body.keys())
        else:
            shapes[name] = shape_of(body)
    return shapes


def test_response_shapes_match_golden(server):
    shapes = collect_shapes(server)
    if os.environ.get("VQT_UPDATE_GOLDEN") == "1" or not GOLDEN.exists():
        GOLDEN.write_text(json.dumps(shapes, indent=1, sort_keys=True))
        pytest.skip("golden shapes (re)recorded")
    golden = json.loads(GOLDEN.read_text())
    for name, expected in golden.items():
        assert name in shapes, f"endpoint disappeared: {name}"
        assert shapes[name] == expected, \
            f"response shape changed for {name}:\n" \
            f"  golden: {expected}\n  got:    {shapes[name]}"
