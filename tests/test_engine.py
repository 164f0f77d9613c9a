"""Engine orchestration tests: startup / hash-diff / search / rebuild /
query-cache semantics / metrics — with a deterministic fake embedder."""

import time
from pathlib import Path

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import (
    ApiConfig,
    EngineConfig,
    VideoSearchEngine,
    format_timestamp,
)


@pytest.fixture
def engine(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    for i in range(2):
        make_synthetic_video(vids / f"vid{i}.mp4", n_frames=60)
    cfg = EngineConfig(api=ApiConfig(max_frames=10, sampling_mode="high"))
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    return eng


def test_format_timestamp():
    assert format_timestamp(0.0) == "0m0s"
    assert format_timestamp(65.4) == "1m5s"
    assert format_timestamp(3599.9) == "59m59s"


def test_startup_processes_all(engine):
    engine.startup()
    assert engine.ready
    assert len(engine.index) == 20  # 10 per video
    assert set(engine.index.video_names()) == {"vid0.mp4", "vid1.mp4"}
    assert engine.cache_path.exists()
    assert set(engine.index.video_hashes) == {"vid0.mp4", "vid1.mp4"}


def test_startup_uses_cache_and_hash_diff(engine):
    engine.startup()
    # Second engine on the same dir: loads cache, re-processes nothing
    eng2 = VideoSearchEngine(str(engine.videos_dir), config=engine.config,
                             embedder=FakeEmbedder())
    eng2.startup()
    assert len(eng2.index) == 20
    # Touch a video → only that one re-processes (its rows get replaced?
    # reference semantics: re-ingest appends; ours: hash updated and frames
    # appended — verify hash-diff detected exactly one stale video)
    vid = engine.videos_dir / "vid0.mp4"
    time.sleep(0.02)
    vid.touch()
    stale = eng2._stale_videos(eng2.current_videos())
    assert [p.name for p in stale] == ["vid0.mp4"]


def test_search_results_schema(engine):
    engine.startup()
    results = engine.search("anything", k=5)
    assert len(results) == 5
    r = results[0]
    assert set(r) == {"video_name", "timestamp", "frame_id", "score",
                      "formatted_time"}
    assert r["formatted_time"] == format_timestamp(r["timestamp"])
    scores = [x["score"] for x in results]
    assert scores == sorted(scores, reverse=True)


def test_search_cache_hit(engine):
    engine.startup()
    r1 = engine.search("cached query", k=3)
    hits_before = engine.metrics.counter("search_cache_hits")
    r2 = engine.search("cached query", k=3)
    assert engine.metrics.counter("search_cache_hits") == hits_before + 1
    assert r1 == r2
    # cache must not alias: mutating returned list is safe
    r2[0]["score"] = -1
    r3 = engine.search("cached query", k=3)
    assert r3[0]["score"] != -1


def test_cache_invalidated_on_ingest(engine, tmp_path):
    engine.startup()
    engine.search("q", k=3)
    new_vid = make_synthetic_video(engine.videos_dir / "new.mp4",
                                   n_frames=30)
    engine.process_video(new_vid)
    assert engine.query_cache.stats()["size"] == 0
    assert "new.mp4" in engine.index.video_names()


def test_batch_search_matches_single(engine):
    engine.startup()
    queries = ["alpha", "beta", "gamma"]
    batched = engine.search_batch(queries, k=4)
    singles = [engine.search(q, k=4, use_cache=False) for q in queries]
    # same ranking; scores may differ in the last ulp (batched matmul
    # accumulates in a different order than the single-query matvec)
    for b, s in zip(batched, singles):
        assert [r["frame_id"] for r in b] == [r["frame_id"] for r in s]
        np.testing.assert_allclose([r["score"] for r in b],
                                   [r["score"] for r in s], rtol=1e-5)


def test_image_and_vector_query(engine):
    engine.startup()
    from video_quierer_tpu.ingest.frames import extract_frames
    frames, stamps = extract_frames(engine.videos_dir / "vid0.mp4",
                                    max_frames=10, sampling_mode="high")
    res = engine.search_by_image(frames[3], k=1)
    assert res[0]["video_name"] == "vid0.mp4"
    assert res[0]["timestamp"] == stamps[3]
    vec = FakeEmbedder().embed_frames(frames[3:4])[0]
    res2 = engine.search_by_vector(vec, k=1)
    assert res2[0]["frame_id"] == res[0]["frame_id"]


def test_vector_query_semantic_cache(engine):
    engine.startup()
    vec = np.random.default_rng(1).standard_normal(512).astype(np.float32)
    vec /= np.linalg.norm(vec)
    r1 = engine.search_by_vector(vec, k=3)
    # nearly identical vector → semantic cache hit (cosine > 0.95)
    near = vec + 0.01 * np.random.default_rng(2).standard_normal(
        512).astype(np.float32)
    hits_before = engine.metrics.counter("search_cache_hits")
    r2 = engine.search_by_vector(near, k=3)
    assert engine.metrics.counter("search_cache_hits") == hits_before + 1
    assert r1 == r2


def test_rebuild_and_clear(engine):
    engine.startup()
    n = len(engine.index)
    added = engine.rebuild()
    assert added == n
    assert len(engine.index) == n
    engine.clear()
    assert len(engine.index) == 0
    assert not engine.cache_path.exists()
    assert engine.search("x", k=3) == []


def test_remove_video(engine):
    engine.startup()
    removed = engine.remove_video("vid0.mp4")
    assert removed == 10
    assert engine.index.video_names() == ["vid1.mp4"]
    assert engine.remove_video("vid0.mp4") == 0


def test_use_clip_false_fallback(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "f.mp4", n_frames=30)
    cfg = EngineConfig(api=ApiConfig(use_clip=False, max_frames=5))
    eng = VideoSearchEngine(str(vids), config=cfg)
    eng.startup()
    assert len(eng.index) == 5
    res = eng.search("bright", k=2)
    assert len(res) == 2
    assert eng.stats()["processor_type"] == "Visual"


def test_stats_and_metrics(engine):
    engine.startup()
    engine.search("metric me", k=2)
    s = engine.stats()
    assert s["video_count"] == 2
    assert s["total_frames_indexed"] == 20
    assert s["metrics"]["counters"]["searches"] >= 1
    assert "search_latency_ms" in s["metrics"]["histograms"]
    # named accuracy contract: quantized default mirror -> exact
    # f32 re-rank mode; f32 mirror -> exact scan outright
    assert s["index"]["accuracy_mode"] == (
        "exact-f32-scan"
        if engine.config.index.device_dtype == "float32"
        else "exact-f32-rerank")
    assert s["index"]["device_dtype"] == engine.config.index.device_dtype
    prom = engine.metrics.export_prometheus()
    assert "video_search_searches" in prom
    assert "video_search_uptime_seconds" in prom


def test_search_similar(engine):
    engine.startup()
    seed = engine.search("some scene", k=1, use_cache=False)[0]
    res, from_cache = engine.search_similar_ex(
        seed["video_name"], seed["timestamp"], k=5, use_cache=False)
    assert len(res) == 5
    # the seed frame itself is excluded
    assert not any(r["video_name"] == seed["video_name"]
                   and r["frame_id"] == seed["frame_id"] for r in res)
    # results are descending and carry the standard schema
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    assert set(res[0]) == {"video_name", "timestamp", "frame_id",
                           "score", "formatted_time"}
    # the timestamp snaps to the nearest indexed frame: an off-grid seed
    # timestamp resolves to the same row
    res2 = engine.search_similar(seed["video_name"],
                                 seed["timestamp"] + 1e-4, k=5,
                                 use_cache=False)
    assert [r["frame_id"] for r in res2] == [r["frame_id"] for r in res]
    assert engine.metrics.snapshot()["counters"]["similar_searches"] >= 2
    with pytest.raises(KeyError):
        engine.search_similar("no_such_video.mp4", 0.0)


def test_video_level_search(engine):
    engine.startup()
    res = engine.search_videos("overall content", k=2)
    assert len(res) == 2
    assert set(res[0]) == {"video_name", "score", "frame_count",
                           "best_timestamp"}
    assert res[0]["score"] >= res[1]["score"]
    assert res[0]["frame_count"] == 10
    # best_timestamp belongs to that video's indexed frames
    from video_quierer_tpu.ingest.frames import extract_frames
    _, stamps = extract_frames(engine.videos_dir / res[0]["video_name"],
                               max_frames=10, sampling_mode="high")
    assert res[0]["best_timestamp"] in stamps
    empty_dir = engine.videos_dir.parent / "empty_videos"
    assert VideoSearchEngine(str(empty_dir), config=engine.config,
                             embedder=engine._embedder
                             ).search_videos("x") == []


def test_bfloat16_serving_mode(tmp_path):
    """model.dtype=bfloat16 + index bfloat16: the full throughput-mode
    config ingests and searches (embedder computes in bf16, emits f32)."""
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "bf.mp4", n_frames=20)
    cfg = EngineConfig(api=ApiConfig(max_frames=4))
    cfg.model.dtype = "bfloat16"
    cfg.index.device_dtype = "bfloat16"
    eng = VideoSearchEngine(str(vids), config=cfg)
    eng.startup()
    assert len(eng.index) == 4
    res = eng.search("throughput mode", k=2)
    assert len(res) == 2
    assert eng.index._emb.dtype == np.float32  # host store stays f32


def test_thumbnail_url_enrichment(tmp_path):
    """thumbnail_base_url set -> rows carry the dead path's URL template
    (src/video_search_system.py:333-337); unset -> exact five-key
    reference schema (covered by test_golden_shapes)."""
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "tn.mp4", n_frames=20)
    cfg = EngineConfig(api=ApiConfig(max_frames=4),
                       thumbnail_base_url="http://cdn/thumbs")
    eng = VideoSearchEngine(str(vids), config=cfg,
                            embedder=FakeEmbedder())
    eng.startup()
    rows = eng.search("anything", k=2, use_cache=False)
    assert rows and all(
        r["thumbnail_url"] ==
        f"http://cdn/thumbs/tn.mp4/thumbnail_{r['timestamp']:.2f}.jpg"
        for r in rows)
    # unset -> no thumbnail key
    cfg2 = EngineConfig(api=ApiConfig(max_frames=4))
    eng2 = VideoSearchEngine(str(vids), config=cfg2,
                             embedder=FakeEmbedder())
    eng2.startup()
    assert all("thumbnail_url" not in r
               for r in eng2.search("anything", k=2, use_cache=False))
