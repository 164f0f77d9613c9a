"""Scale and stress tests (run with ``-m slow``; included in the default
suite but kept at sizes that finish in tens of seconds on CPU)."""

import threading
import time

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine
from video_quierer_tpu.index.device_index import DeviceVideoIndex


@pytest.mark.slow
def test_many_videos_ingest_and_rebuild(tmp_path):
    """50-video corpus through startup + rebuild; counts and dedup."""
    vids = tmp_path / "videos"
    vids.mkdir()
    for i in range(50):
        make_synthetic_video(vids / f"s{i:03d}.mp4", n_frames=24,
                             size=(48, 36))
    cfg = EngineConfig(api=ApiConfig(max_frames=6, sampling_mode="high"))
    cfg.ingest.batch_size = 64
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    t0 = time.time()
    eng.startup()
    startup_s = time.time() - t0
    assert len(eng.index) == 300
    assert len(eng.index.video_names()) == 50
    added = eng.rebuild()
    assert added == 300
    res = eng.search("scene", k=20, dedup_videos=True)
    assert len({r["video_name"] for r in res}) == 20
    # informational
    print(f"\n[scale] 50 videos ingested in {startup_s:.1f}s "
          f"({300 / startup_s:.0f} frames/s incl. decode on CPU)")


@pytest.mark.slow
def test_large_index_growth_and_search(rng):
    """Quarter-million-row index: growth, incremental sync, search."""
    idx = DeviceVideoIndex()
    block = rng.standard_normal((50_000, 512)).astype(np.float32)
    for i in range(5):
        idx.add_batch(block, f"bulk{i}.mp4",
                      np.arange(50_000, dtype=float))
    assert len(idx) == 250_000
    q = block[123]
    t0 = time.time()
    res = idx.search(q, k=10)
    first = time.time() - t0
    assert res[0]["frame_id"] == 123
    t0 = time.time()
    for _ in range(5):
        idx.search(q, k=10)
    per = (time.time() - t0) / 5
    print(f"\n[scale] 250k-row search: first {first * 1000:.0f} ms, "
          f"warm {per * 1000:.1f} ms (CPU)")


@pytest.mark.slow
def test_concurrent_search_during_ingest(tmp_path):
    """Searches stay consistent while another thread ingests."""
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "base.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=10))
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()

    stop = threading.Event()
    errors = []

    def searcher():
        while not stop.is_set():
            try:
                res = eng.search("x", k=3, use_cache=False)
                assert all(isinstance(r["frame_id"], int) for r in res)
            except Exception as e:
                errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(4)]
    [t.start() for t in threads]
    try:
        for i in range(3):
            v = make_synthetic_video(vids / f"in{i}.mp4", n_frames=30)
            eng.process_video(v)
    finally:
        stop.set()
        [t.join(timeout=10) for t in threads]
    assert not errors
    assert len(eng.index.video_names()) == 4
