"""HTTP API surface tests: the real aiohttp server on a real socket,
driven with ``requests`` — request/response shape parity with the reference
surface (SURVEY.md §3.6) using the deterministic fake embedder."""

import asyncio
import base64
import threading
import time

import numpy as np
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
    tmp = tmp_path_factory.mktemp("api")
    vids = tmp / "videos"
    vids.mkdir()
    for i in range(2):
        make_synthetic_video(vids / f"vid{i}.mp4", n_frames=60)
    static = tmp / "static"
    static.mkdir()
    (static / "index.html").write_text("<html><body>ui</body></html>")

    cfg = EngineConfig(api=ApiConfig(max_frames=10, sampling_mode="high"))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=FakeEmbedder())
    app = create_app(engine=engine, config_path=tmp / "config.json",
                     static_dir=static)

    loop = asyncio.new_event_loop()
    state = {}
    started = threading.Event()

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
        started.set()
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(30)
    base = f"http://127.0.0.1:{state['port']}"
    # wait for engine startup (runs in the app's on_startup hook)
    for _ in range(100):
        if requests.get(base + "/health").json()["status"] == "healthy":
            break
        time.sleep(0.1)
    yield {"base": base, "engine": engine, "videos_dir": vids, "tmp": tmp}
    loop.call_soon_threadsafe(loop.stop)


def test_health_endpoints(server):
    b = server["base"]
    assert requests.get(b + "/health").json() == {"status": "healthy"}
    h = requests.get(b + "/api/health").json()
    assert h["status"] == "healthy"
    assert h["components"]["index"]["status"] == "healthy"
    assert "timestamp" in h


def test_api_root(server):
    r = requests.get(server["base"] + "/api").json()
    assert r["version"] == "2.1.0"
    assert "search" in r["endpoints"]


def test_stats_shape(server):
    s = requests.get(server["base"] + "/api/stats").json()
    assert set(s) == {"uptime_seconds", "system_ready", "video_count",
                      "total_frames_indexed", "index_performance",
                      "feature_extraction", "cache_performance", "metrics"}
    assert s["system_ready"] is True
    assert s["video_count"] == 2
    assert s["total_frames_indexed"] == 20
    # the accuracy contract is API-visible (advisor round-2 remedy)
    assert s["index_performance"]["accuracy_mode"] in (
        "exact-f32-scan", "exact-f32-rerank", "approximate-ivf")
    assert "device_dtype" in s["index_performance"]


def test_search_response_shape(server):
    r = requests.post(server["base"] + "/api/search",
                      json={"query": "a thing", "k": 5})
    assert r.status_code == 200
    body = r.json()
    assert set(body) == {"results", "search_time_ms", "from_cache",
                        "query_id", "performance"}
    assert len(body["results"]) == 5
    item = body["results"][0]
    assert set(item) == {"video_name", "timestamp", "frame_id", "score",
                        "formatted_time"}
    assert body["performance"]["results_count"] == 5
    # repeat → truthful from_cache
    r2 = requests.post(server["base"] + "/api/search",
                       json={"query": "a thing", "k": 5}).json()
    assert r2["from_cache"] is True
    assert r2["results"] == body["results"]


def test_search_validation(server):
    b = server["base"]
    assert requests.post(b + "/api/search",
                         json={"query": "   ", "k": 5}).status_code == 400
    assert requests.post(b + "/api/search",
                         json={"query": "x", "k": 0}).status_code == 422
    assert requests.post(b + "/api/search",
                         json={"query": "x", "k": 99}).status_code == 422
    assert requests.post(b + "/api/search",
                         data="junk").status_code == 422


def test_search_pagination(server):
    b = server["base"]
    full = requests.post(b + "/api/search",
                         json={"query": "paged", "k": 10}).json()["results"]
    page1 = requests.post(b + "/api/search",
                          json={"query": "paged", "k": 5}).json()["results"]
    page2 = requests.post(
        b + "/api/search",
        json={"query": "paged", "k": 5, "offset": 5}).json()["results"]
    assert page1 == full[:5]
    assert page2 == full[5:]
    # page 2 again → served from the shared full-page cache entry
    r = requests.post(
        b + "/api/search",
        json={"query": "paged", "k": 5, "offset": 5}).json()
    assert r["from_cache"] is True
    assert r["results"] == page2
    # a different page of the same query also hits that entry
    r3 = requests.post(
        b + "/api/search",
        json={"query": "paged", "k": 5, "offset": 10}).json()
    assert r3["from_cache"] is True
    # validation: offset+k beyond the top-64 page set, negative offset
    assert requests.post(
        b + "/api/search",
        json={"query": "x", "k": 50, "offset": 20}).status_code == 422
    assert requests.post(
        b + "/api/search",
        json={"query": "x", "k": 5, "offset": -1}).status_code == 422


def test_search_pagination_dedup(server):
    b = server["base"]
    full = requests.post(
        b + "/api/search",
        json={"query": "paged dedup", "k": 2,
              "dedup_videos": True}).json()["results"]
    page2 = requests.post(
        b + "/api/search",
        json={"query": "paged dedup", "k": 1, "offset": 1,
              "dedup_videos": True}).json()["results"]
    assert page2 == full[1:2]
    names = {r["video_name"] for r in full}
    assert len(names) == len(full)  # dedup still holds under paging


def test_batch_search_shape(server):
    r = requests.post(server["base"] + "/api/search/batch",
                      json={"queries": ["a", "b"], "k": 3}).json()
    assert r["query_count"] == 2
    assert r["total_results"] == 6
    assert [x["query"] for x in r["results"]] == ["a", "b"]
    assert all(x["count"] == 3 for x in r["results"])


def test_legacy_search(server):
    r = requests.post(server["base"] + "/search",
                      json={"query": "legacy", "k": 2}).json()
    assert r["success"] is True
    assert r["query"] == "legacy"
    assert "search_time" in r and len(r["results"]) == 2


def test_image_query_data_uri(server):
    import cv2
    img = np.random.default_rng(5).integers(
        0, 255, (48, 64, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    uri = "data:image/jpeg;base64," + base64.b64encode(
        buf.tobytes()).decode()
    r = requests.post(server["base"] + "/api/search",
                      json={"query": uri, "k": 3})
    assert r.status_code == 200
    assert len(r.json()["results"]) == 3


def test_search_similar_endpoint(server):
    seed = requests.post(server["base"] + "/api/search",
                         json={"query": "a scene", "k": 1}
                         ).json()["results"][0]
    r = requests.post(server["base"] + "/api/search/similar",
                      json={"video_name": seed["video_name"],
                            "timestamp": seed["timestamp"], "k": 3})
    assert r.status_code == 200
    body = r.json()
    assert set(body) == {"results", "search_time_ms", "from_cache",
                         "query_id", "performance"}
    assert len(body["results"]) == 3
    assert not any(res["video_name"] == seed["video_name"]
                   and res["frame_id"] == seed["frame_id"]
                   for res in body["results"])
    # unknown video -> 404; junk timestamp -> 422; missing name -> 400
    assert requests.post(server["base"] + "/api/search/similar",
                         json={"video_name": "ghost.mp4", "timestamp": 0}
                         ).status_code == 404
    assert requests.post(server["base"] + "/api/search/similar",
                         json={"video_name": seed["video_name"],
                               "timestamp": "junk"}).status_code == 422
    assert requests.post(server["base"] + "/api/search/similar",
                         json={"timestamp": 0}).status_code == 400


def test_list_videos(server):
    r = requests.get(server["base"] + "/api/videos").json()
    assert r["count"] == 2
    names = {v["filename"] for v in r["videos"]}
    assert names == {"vid0.mp4", "vid1.mp4"}
    v = r["videos"][0]
    assert set(v) == {"filename", "video_id", "frame_count", "size",
                      "processed_at"}
    assert v["frame_count"] == 10
    assert requests.get(server["base"] + "/api/videos",
                        params={"limit": 2000}).status_code == 400
    legacy = requests.get(server["base"] + "/videos").json()
    assert {v["name"] for v in legacy["videos"]} == names


def test_video_info_and_404(server):
    r = requests.get(server["base"] + "/api/videos/vid0").json()
    assert r["filename"] == "vid0.mp4"
    assert r["exists"] is True
    assert r["frame_count"] == 10
    assert requests.get(server["base"] +
                        "/api/videos/nope").status_code == 404


def test_serve_video_with_range(server):
    r = requests.get(server["base"] + "/videos/vid0.mp4")
    assert r.status_code == 200
    assert r.headers.get("Accept-Ranges") == "bytes"
    partial = requests.get(server["base"] + "/videos/vid0.mp4",
                           headers={"Range": "bytes=0-99"})
    assert partial.status_code == 206
    assert len(partial.content) == 100
    assert requests.get(server["base"] +
                        "/videos/none.mp4").status_code == 404


def test_frame_endpoint(server):
    r = requests.get(server["base"] + "/api/video/vid0/frame",
                     params={"timestamp": 0.5}).json()
    assert r["success"] is True
    assert r["frame_data"].startswith("data:image/jpeg;base64,")
    assert r["video_name"] == "vid0.mp4"
    bad = requests.get(server["base"] + "/api/video/ghost/frame",
                       params={"timestamp": 0.5}).json()
    assert bad["success"] is False and bad["error"] == "Video not found"
    assert requests.get(server["base"] + "/api/video/vid0/frame"
                        ).status_code == 422


def test_upload_and_delete(server, tmp_path):
    src = make_synthetic_video(tmp_path / "fresh.mp4", n_frames=30)
    with open(src, "rb") as f:
        r = requests.post(server["base"] + "/api/videos/upload",
                          files={"file": ("fresh.mp4", f, "video/mp4")})
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["status"] == "success"
    assert body["frames_indexed"] == 10
    assert body["performance"]["frames_per_second"] > 0
    vid_file = f"{body['video_id']}_fresh.mp4"
    assert (server["videos_dir"] / vid_file).exists()

    # bad extension rejected
    r2 = requests.post(server["base"] + "/api/videos/upload",
                       files={"file": ("evil.exe", b"xx")})
    assert r2.status_code == 400

    # delete by derived id
    video_id = vid_file.replace(".mp4", "").replace(".", "_")
    r3 = requests.delete(server["base"] + f"/api/videos/{video_id}")
    assert r3.status_code == 200
    assert r3.json()["status"] == "deleted"
    assert not (server["videos_dir"] / vid_file).exists()
    assert requests.delete(server["base"] +
                           "/api/videos/absent").status_code == 404


def test_upload_progress_tracking(server, tmp_path):
    b = server["base"]
    src = make_synthetic_video(tmp_path / "tracked.mp4", n_frames=30)
    uid = "test-upload-123"
    with open(src, "rb") as f:
        r = requests.post(b + f"/api/videos/upload?upload_id={uid}",
                          files={"file": ("tracked.mp4", f, "video/mp4")})
    assert r.status_code == 200, r.text
    p = requests.get(b + f"/api/videos/upload/progress/{uid}")
    assert p.status_code == 200
    snap = p.json()
    assert snap["phase"] == "done" and snap["done"] is True
    assert snap["frames_indexed"] == 10
    assert snap["bytes_received"] == src.stat().st_size
    # unknown id → 404
    assert requests.get(b + "/api/videos/upload/progress/nope"
                        ).status_code == 404
    # SSE stream replays the final state and closes
    s = requests.get(b + f"/api/videos/upload/progress/{uid}/stream",
                     stream=True, timeout=10)
    assert s.headers["Content-Type"].startswith("text/event-stream")
    text = b"".join(s.iter_content(4096)).decode()
    assert "event: progress" in text
    assert '"phase": "done"' in text
    # a failed upload records the error phase
    with open(src, "rb") as f:
        bad = requests.post(b + "/api/videos/upload?upload_id=bad-1",
                            files={"file": ("evil.exe", f)})
    assert bad.status_code == 400
    snap = requests.get(b + "/api/videos/upload/progress/bad-1").json()
    assert snap["phase"] == "error" and snap["done"] is True
    # cleanup: remove the tracked upload so other tests see 2 base videos
    vid = requests.get(b + "/api/videos").json()
    for v in vid["videos"]:
        if "tracked" in v["filename"]:
            requests.delete(b + f"/api/videos/{v['video_id']}")


def test_youtube_endpoint_gated(server):
    b = server["base"]
    assert requests.post(b + "/api/videos/download-youtube",
                         json={}).status_code == 400
    assert requests.post(b + "/api/videos/download-youtube",
                         json={"url": "http://x.com"}).status_code == 400
    r = requests.post(b + "/api/videos/download-youtube",
                      json={"url": "https://youtube.com/watch?v=xyz"})
    # yt-dlp is not installed in this environment → 500 with install hint
    assert r.status_code == 500
    assert "yt-dlp" in r.json()["detail"]


def test_config_endpoints(server):
    b = server["base"]
    r = requests.get(b + "/api/config").json()
    assert r["success"] is True
    assert r["config"]["sampling_mode"] == "high"
    new = dict(r["config"], sampling_mode="ultra_high", max_frames=500)
    r2 = requests.post(b + "/api/config", json=new).json()
    assert r2["success"] is True
    assert r2["config"]["sampling_mode"] == "ultra_high"
    assert (server["tmp"] / "config.json").exists()
    assert server["engine"].config.api.max_frames == 500
    r3 = requests.post(b + "/api/config/reset").json()
    assert r3["config"] == ApiConfig().model_dump()


def test_cache_stats_flat_shape(server):
    s = requests.get(server["base"] + "/api/cache/stats").json()
    assert set(s) == {"success", "embeddings", "videos", "size",
                      "last_updated", "cache_file_exists",
                      "video_hashes_count"}
    assert s["success"] is True
    assert s["embeddings"] == len(server["engine"].index)


def test_cache_health(server):
    h = requests.get(server["base"] + "/api/cache/health").json()
    assert set(h) == {"success", "issues", "recommendations",
                      "total_checks", "passed_checks"}
    assert h["total_checks"] == 5


def test_cache_export_import_roundtrip(server):
    b = server["base"]
    exported = requests.get(b + "/api/cache/export")
    assert exported.status_code == 200
    assert len(exported.content) > 100
    r = requests.post(b + "/api/cache/import",
                      files={"file": ("cache.pkl", exported.content)})
    assert r.status_code == 200
    assert r.json()["success"] is True
    bad = requests.post(b + "/api/cache/import",
                        files={"file": ("cache.txt", b"zz")})
    assert bad.status_code == 400


def test_index_save_load(server, tmp_path):
    b = server["base"]
    # relative paths resolve inside the videos dir (absolute paths outside
    # the allowed dirs are rejected — see test_review_fixes)
    target = "exported_index.pkl"
    r = requests.post(b + "/api/index/save", params={"filepath": target})
    assert r.json() == {"status": "saved", "filepath": target}
    assert (server["videos_dir"] / target).exists()
    r2 = requests.post(b + "/api/index/load", params={"filepath": target})
    assert r2.json() == {"status": "loaded", "filepath": target}
    assert requests.post(b + "/api/index/save").status_code == 422
    assert requests.post(b + "/api/index/save", params={
        "filepath": str(tmp_path / "outside.pkl")}).status_code == 403


def test_rebuild_and_metrics(server):
    b = server["base"]
    r = requests.post(b + "/api/cache/rebuild").json()
    assert r["success"] is True
    assert r["stats"]["embeddings_count"] == len(server["engine"].index)
    prom = requests.get(b + "/metrics").text
    assert "video_search_searches" in prom
    snap = requests.get(b + "/api/metrics").json()
    assert "counters" in snap and "histograms" in snap


def test_root_serves_ui(server):
    r = requests.get(server["base"] + "/")
    assert r.status_code == 200
    assert "ui" in r.text


def test_cors_headers(server):
    r = requests.get(server["base"] + "/health")
    assert r.headers["Access-Control-Allow-Origin"] == "*"


def test_openapi_docs(server):
    b = server["base"]
    spec = requests.get(b + "/api/openapi.json").json()
    assert spec["openapi"].startswith("3.")
    assert "/api/search" in spec["paths"]
    assert "post" in spec["paths"]["/api/search"]
    assert "SearchRequest" in spec["components"]["schemas"]
    # every documented path actually exists (GET ones respond non-404)
    html = requests.get(b + "/api/docs")
    assert html.status_code == 200
    assert "openapi.json" in html.text
