"""API hardening: malformed inputs, traversal attempts, concurrency."""

import asyncio
import threading

import pytest
import requests

from aiohttp import web

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.api.app import create_app
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hard")
    vids = tmp / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "h.mp4", n_frames=40)
    (tmp / "secret.txt").write_text("confidential")

    cfg = EngineConfig(api=ApiConfig(max_frames=8))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=FakeEmbedder())
    app = create_app(engine=engine, config_path=tmp / "config.json",
                     static_dir=tmp / "static")
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
    import time
    for _ in range(100):
        if requests.get(base + "/health").json()["status"] == "healthy":
            break
        time.sleep(0.1)
    yield {"base": base, "tmp": tmp}
    loop.call_soon_threadsafe(loop.stop)


def test_video_serving_no_traversal(server):
    b = server["base"]
    # encoded traversal attempts must not escape the videos dir
    for path in ("/videos/..%2Fsecret.txt", "/videos/%2e%2e/secret.txt",
                 "/videos/..%5Csecret.txt"):
        r = requests.get(b + path)
        assert r.status_code in (400, 404), (path, r.status_code)
        assert b"confidential" not in r.content


def test_malformed_bodies(server):
    b = server["base"]
    assert requests.post(b + "/api/search", data=b"\x00\x01").status_code \
        == 422
    assert requests.post(b + "/api/search", json={}).status_code == 422
    assert requests.post(b + "/api/search/batch",
                         json={"queries": "notalist"}).status_code == 422
    assert requests.post(b + "/api/config",
                         json={"max_frames": "NaNstr"}).status_code == 422
    # legacy endpoint tolerates junk with a clean 400
    assert requests.post(b + "/search", data=b"junk").status_code == 400


def test_upload_without_file_part(server):
    r = requests.post(server["base"] + "/api/videos/upload",
                      files={"video_id": (None, "abc")})
    assert r.status_code == 400


def test_upload_empty_filename(server):
    r = requests.post(server["base"] + "/api/videos/upload",
                      files={"file": ("", b"")})
    assert r.status_code == 400


def test_nonexistent_routes(server):
    assert requests.get(server["base"] + "/api/nope").status_code == 404
    assert requests.put(server["base"] + "/api/search").status_code \
        in (404, 405)


def test_concurrent_mixed_requests(server):
    """Search / stats / list hammered concurrently stay consistent."""
    b = server["base"]
    errors = []

    def work(i):
        try:
            if i % 3 == 0:
                r = requests.post(b + "/api/search",
                                  json={"query": f"c{i}", "k": 3})
                assert r.status_code == 200
                assert len(r.json()["results"]) == 3
            elif i % 3 == 1:
                assert requests.get(b + "/api/stats").status_code == 200
            else:
                assert requests.get(b + "/api/videos").status_code == 200
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(30)]
    [t.start() for t in threads]
    [t.join(timeout=30) for t in threads]
    assert not errors


def test_upload_filename_traversal_sanitized(server, tmp_path):
    from tests.helpers import make_synthetic_video
    src = make_synthetic_video(tmp_path / "t.mp4", n_frames=20)
    evil_name = "../../escaped.mp4"
    with open(src, "rb") as f:
        r = requests.post(server["base"] + "/api/videos/upload",
                          files={"file": (evil_name, f, "video/mp4")})
    assert r.status_code == 200, r.text
    tmp_root = server["tmp"]
    # nothing escaped the videos dir
    assert not (tmp_root.parent / "escaped.mp4").exists()
    assert not (tmp_root / "escaped.mp4").exists()
    vids_dir = tmp_root / "videos"
    saved = [p.name for p in vids_dir.iterdir() if "escaped" in p.name]
    assert len(saved) == 1  # sanitized into the videos dir
    # clean up for other tests
    video_id = saved[0].replace(".mp4", "").replace(".", "_")
    requests.delete(server["base"] + f"/api/videos/{video_id}")


def test_sanitize_filename_unit():
    from video_quierer_tpu.api.app import sanitize_filename
    assert sanitize_filename("../../x.mp4") == "x.mp4"
    assert sanitize_filename("..\\..\\y.mp4") == "y.mp4"
    assert sanitize_filename("a/b/c.mp4") == "c.mp4"
    assert sanitize_filename("...") == "_"     # degenerate but contained
    assert sanitize_filename("") == "upload"
    assert sanitize_filename("normal.mp4") == "normal.mp4"


def test_search_timeout_compile_aware(tmp_path):
    """search_timeout must not fire during first-search compilation (the
    bound stretches until one search has completed), but applies after."""
    import asyncio as aio
    import time as time_mod
    from aiohttp import web as aioweb
    from video_quierer_tpu.api.app import create_app

    class SlowEmbedder(FakeEmbedder):
        def __init__(self):
            super().__init__()
            self.calls = 0

        def embed_text(self, text):
            self.calls += 1
            time_mod.sleep(2.5)  # longer than search_timeout=1
            return super().embed_text(text)

        def embed_texts(self, texts):
            self.calls += 1
            time_mod.sleep(2.5)
            return super().embed_texts(texts)

    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "t.mp4", n_frames=20)
    cfg = EngineConfig(api=ApiConfig(max_frames=4, search_timeout=1,
                                     enhanced_mode=False))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=SlowEmbedder())
    app = create_app(engine=engine, config_path=tmp_path / "c.json",
                     static_dir=tmp_path)
    loop = aio.new_event_loop()
    state = {}
    ready = threading.Event()

    def run():
        aio.set_event_loop(loop)

        async def boot():
            runner = aioweb.AppRunner(app)
            await runner.setup()
            site = aioweb.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            state["port"] = site._server.sockets[0].getsockname()[1]
        loop.run_until_complete(boot())
        ready.set()
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert ready.wait(30)
    base = f"http://127.0.0.1:{state['port']}"
    import time
    for _ in range(200):
        if requests.get(base + "/health").json()["status"] == "healthy":
            break
        time.sleep(0.1)
    # first search: slower than the 1s timeout but allowed (compile grace)
    r1 = requests.post(base + "/api/search",
                       json={"query": "first slow", "k": 2}, timeout=30)
    assert r1.status_code == 200, r1.text
    # second search: grace over, the 1s bound applies → 504
    r2 = requests.post(base + "/api/search",
                       json={"query": "second slow", "k": 2,
                             "use_cache": False}, timeout=30)
    assert r2.status_code == 504
    loop.call_soon_threadsafe(loop.stop)
