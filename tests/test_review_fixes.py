"""Regression tests for the round-1 code-review findings."""

import pickle

import numpy as np
import pytest
import requests

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine
from video_quierer_tpu.index.device_index import DeviceVideoIndex, \
    safe_pickle_loads


# -- stale rows on re-ingest (finding 3) -----------------------------------

def test_reingest_replaces_rows(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    v = make_synthetic_video(vids / "r.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8))
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()
    assert len(eng.index) == 8
    # modify in place (same name) and reprocess
    import time
    time.sleep(0.02)
    make_synthetic_video(vids / "r.mp4", n_frames=60, seed=99)
    eng.process_video(v)
    assert len(eng.index) == 8  # replaced, not appended
    # startup-driven re-ingest too
    eng2 = VideoSearchEngine(str(vids), config=cfg,
                             embedder=FakeEmbedder())
    eng2.startup()
    assert len(eng2.index) == 8


# -- restricted unpickler (finding 1) --------------------------------------

def test_safe_unpickler_blocks_globals(tmp_path):
    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("echo pwned",))

    payload = pickle.dumps({"embeddings": [], "metadata": [],
                            "video_hashes": {}, "evil": Evil()})
    with pytest.raises(pickle.UnpicklingError):
        safe_pickle_loads(payload)
    idx = DeviceVideoIndex()
    p = tmp_path / "evil.pkl"
    p.write_bytes(payload)
    assert not idx.load_from_disk(p)  # rejected, no execution


def test_safe_unpickler_allows_real_cache(tmp_path, rng):
    idx = DeviceVideoIndex()
    idx.add_batch(rng.standard_normal((3, 512)).astype(np.float32),
                  "ok.mp4", [0.0, 1.0, 2.0])
    p = tmp_path / "ok.pkl"
    idx.save_to_disk(p)
    idx2 = DeviceVideoIndex()
    assert idx2.load_from_disk(p)
    assert len(idx2) == 3


def test_bad_cache_dict_preserves_existing_index(rng):
    idx = DeviceVideoIndex()
    idx.add_batch(rng.standard_normal((5, 512)).astype(np.float32),
                  "keep.mp4", np.arange(5, dtype=float))
    with pytest.raises(ValueError):
        idx.load_cache_dict({"embeddings": [np.zeros(512)],
                             "metadata": []})  # length mismatch
    assert len(idx) == 5  # untouched


# -- per-call from_cache + misc API fixes ----------------------------------

@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import asyncio
    import threading
    import time
    from aiohttp import web
    from video_quierer_tpu.api.app import create_app

    tmp = tmp_path_factory.mktemp("rf")
    vids = tmp / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "a.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8))
    engine = VideoSearchEngine(str(vids), config=cfg,
                               embedder=FakeEmbedder())
    app = create_app(engine=engine, config_path=tmp / "cfg.json",
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
    yield {"base": base, "engine": engine, "tmp": tmp}
    loop.call_soon_threadsafe(loop.stop)


def test_upload_file_part_before_video_id(server, tmp_path):
    """Field order must not matter (finding 7)."""
    src = make_synthetic_video(tmp_path / "o.mp4", n_frames=20)
    with open(src, "rb") as f:
        # requests preserves dict insertion order: file first
        r = requests.post(server["base"] + "/api/videos/upload",
                          files=[("file", ("o.mp4", f, "video/mp4")),
                                 ("video_id", (None, "chosen-id"))])
    assert r.status_code == 200, r.text
    assert r.json()["video_id"] == "chosen-id"
    info = requests.get(server["base"] + "/api/videos/chosen-id")
    assert info.status_code == 200
    assert info.json()["filename"] == "chosen-id_o.mp4"
    requests.delete(server["base"] + "/api/videos/chosen-id_o")


def test_empty_batch_queries_422(server):
    r = requests.post(server["base"] + "/api/search/batch",
                      json={"queries": [], "k": 3})
    assert r.status_code == 422


def test_config_rejects_invalid_values(server):
    bad = dict(ApiConfig().model_dump(), max_frames=0)
    r = requests.post(server["base"] + "/api/config", json=bad)
    assert r.status_code == 422
    bad2 = dict(ApiConfig().model_dump(), sampling_mode="warp")
    assert requests.post(server["base"] + "/api/config",
                        json=bad2).status_code == 422
    # engine config unchanged
    assert server["engine"].config.api.max_frames == 8


def test_index_save_outside_allowed_dirs_403(server):
    r = requests.post(server["base"] + "/api/index/save",
                      params={"filepath": "/tmp/evil_index.pkl"})
    assert r.status_code == 403
    r2 = requests.post(server["base"] + "/api/index/save",
                       params={"filepath": "my_index.pkl"})  # relative→videos dir
    assert r2.status_code == 200
    assert (server["tmp"] / "videos" / "my_index.pkl").exists()
    r3 = requests.post(server["base"] + "/api/index/load",
                       params={"filepath": "../cfg.json"})
    assert r3.status_code == 403


def test_cache_import_invalid_preserves_cache(server):
    engine = server["engine"]
    good_cache = engine.cache_path.read_bytes()
    n_before = len(engine.index)
    r = requests.post(server["base"] + "/api/cache/import",
                      files={"file": ("junk.pkl", b"not a pickle")})
    assert r.status_code == 200
    assert r.json()["success"] is False
    assert engine.cache_path.read_bytes() == good_cache
    assert len(engine.index) == n_before


def test_cache_import_evil_pickle_rejected(server):
    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("touch /tmp/pwned_by_import",))

    payload = pickle.dumps(Evil())
    r = requests.post(server["base"] + "/api/cache/import",
                      files={"file": ("evil.pkl", payload)})
    assert r.json()["success"] is False
    from pathlib import Path
    assert not Path("/tmp/pwned_by_import").exists()


def test_tokenizer_digit_splitting():
    from video_quierer_tpu.models.clip.tokenizer import _WORD_RE
    words = _WORD_RE.findall("1080p video x_y")
    assert "1" in words and "0" in words and "8" in words
    assert "1080p" not in words
    assert "video" in words


def test_memoized_embedder_dim_agnostic(rng):
    from video_quierer_tpu.models.clip.embedder import MemoizedEmbedder

    class Wide:
        def embed_frames(self, frames):
            return np.ones((frames.shape[0], 768), np.float32)

    memo = MemoizedEmbedder(Wide())
    frames = rng.integers(0, 255, (3, 224, 224, 3), dtype=np.uint8)
    out = memo.embed_frames(frames)
    assert out.shape == (3, 768)
    out2 = memo.embed_frames(frames)  # cached path with inferred dim
    assert out2.shape == (3, 768)
    assert memo.hits == 3


def test_vector_search_endpoint(server):
    engine = server["engine"]
    vec = engine.index._emb[3].tolist()
    r = requests.post(server["base"] + "/api/search/vector",
                      json={"vector": vec, "k": 2})
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["results"][0]["frame_id"] == 3
    assert set(body) == {"results", "search_time_ms", "from_cache",
                         "query_id", "performance"}
    # semantic cache reuse on repeat
    r2 = requests.post(server["base"] + "/api/search/vector",
                       json={"vector": vec, "k": 2}).json()
    assert r2["from_cache"] is True
    # validation
    assert requests.post(server["base"] + "/api/search/vector",
                         json={"vector": [1.0] * 5}).status_code == 422
    assert requests.post(server["base"] + "/api/search/vector",
                         json={"vector": vec, "k": 0}).status_code == 422


def test_dedup_param_via_api(server):
    r = requests.post(server["base"] + "/api/search",
                      json={"query": "dd", "k": 5, "dedup_videos": True})
    assert r.status_code == 200
    names = [x["video_name"] for x in r.json()["results"]]
    assert len(names) == len(set(names))


def test_non_coalesced_search_branch(server):
    """enhanced_mode=False exercises the direct engine.search branch."""
    engine = server["engine"]
    old = engine.config.api.enhanced_mode
    engine.config.api.enhanced_mode = False
    try:
        r = requests.post(server["base"] + "/api/search",
                          json={"query": "direct branch", "k": 3})
        assert r.status_code == 200
        assert len(r.json()["results"]) == 3
    finally:
        engine.config.api.enhanced_mode = old


def test_pickle_loader_fuzz(tmp_path, rng):
    """Random garbage and truncated pickles must fail cleanly."""
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    idx = DeviceVideoIndex()
    idx.add_batch(rng.standard_normal((2, 512)).astype(np.float32),
                  "keep.mp4", [0.0, 1.0])
    p = tmp_path / "fuzz.pkl"
    for blob in (b"", b"\x80", b"\x80\x04garbage", bytes(rng.integers(
            0, 255, 200, dtype=np.uint8))):
        p.write_bytes(blob)
        assert not idx.load_from_disk(p)
        assert len(idx) == 2  # survivor intact


def test_video_level_search_endpoint(server):
    r = requests.post(server["base"] + "/api/search/videos",
                      json={"query": "whole video", "k": 1})
    assert r.status_code == 200, r.text
    body = r.json()
    assert len(body["results"]) == 1
    assert set(body["results"][0]) == {"video_name", "score",
                                       "frame_count", "best_timestamp"}
    assert requests.post(server["base"] + "/api/search/videos",
                         json={"query": ""}).status_code == 400


def test_image_upload_search_endpoint(server, tmp_path):
    import cv2
    from video_quierer_tpu.ingest.frames import extract_frames
    engine = server["engine"]
    frames, stamps = extract_frames(
        engine.videos_dir / "a.mp4", max_frames=8, sampling_mode="high")
    ok, buf = cv2.imencode(".png",
                           cv2.cvtColor(frames[2], cv2.COLOR_RGB2BGR))
    r = requests.post(server["base"] + "/api/search/image",
                      files=[("file", ("q.png", buf.tobytes())),
                             ("k", (None, "1"))])
    assert r.status_code == 200, r.text
    hit = r.json()["results"][0]
    assert hit["video_name"] == "a.mp4"
    assert hit["timestamp"] == stamps[2]
    # malformed inputs
    assert requests.post(server["base"] + "/api/search/image",
                         files={"file": ("x.png", b"junk")}
                         ).status_code == 400
    assert requests.post(server["base"] + "/api/search/image",
                         files={"k": (None, "1")}).status_code == 400
