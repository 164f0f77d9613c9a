"""Engine-level IVF tier: index.kind='ivf' selected end-to-end (round-1
VERDICT item 4 — the ANN tier must be reachable from serving, not just
tests/benchmarks)."""

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder, DIM
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine


def _ivf_config(**kw):
    cfg = EngineConfig(api=ApiConfig(max_frames=10, sampling_mode="high"))
    cfg.index.kind = "ivf"
    cfg.index.ivf_min_rows = kw.pop("ivf_min_rows", 64)
    cfg.index.ivf_nlist = kw.pop("ivf_nlist", 8)
    cfg.index.ivf_nprobe = kw.pop("ivf_nprobe", 8)
    return cfg


@pytest.fixture
def ivf_engine(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    eng = VideoSearchEngine(str(vids), config=_ivf_config(),
                            embedder=FakeEmbedder())
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((400, DIM)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for v in range(4):
        eng.index.add_batch(emb[v * 100:(v + 1) * 100], f"vid{v}.mp4",
                            [float(t) for t in range(100)])
    eng._maybe_build_ivf()
    return eng


def test_ivf_tier_builds_and_serves(ivf_engine):
    eng = ivf_engine
    assert eng._ivf is not None
    stats = eng.ann_stats()
    assert stats["kind"] == "ivf" and stats["active"]
    assert stats["nlist"] == 8 and stats["rows"] == 400
    assert eng.accuracy_mode() == "approximate-ivf"
    res = eng.search("a dog in the park", k=5, use_cache=False)
    assert len(res) == 5
    assert all("formatted_time" in r for r in res)
    assert int(eng.metrics.snapshot()["counters"].get("ann_searches", 0)) \
        >= 1


def test_ivf_full_probe_matches_exact_engine(ivf_engine):
    """nprobe == nlist ⇒ the ANN tier must return the exact scan's
    results through the engine path."""
    eng = ivf_engine
    q = "the same deterministic query"
    got = eng.search(q, k=5, use_cache=False)
    eng_exact = VideoSearchEngine(str(eng.videos_dir),
                                  config=EngineConfig(
                                      api=ApiConfig(max_frames=10)),
                                  embedder=FakeEmbedder())
    eng_exact.index.load_cache_dict(eng.index.to_cache_dict())
    want = eng_exact.search(q, k=5, use_cache=False)
    assert [r["frame_id"] for r in got] == [r["frame_id"] for r in want]
    np.testing.assert_allclose([r["score"] for r in got],
                               [r["score"] for r in want], rtol=1e-5)


def test_ivf_batch_and_vector_paths(ivf_engine):
    eng = ivf_engine
    out = eng.search_batch(["query one", "query two", "query three"], k=4)
    assert len(out) == 3 and all(len(r) == 4 for r in out)
    vec = np.random.default_rng(3).standard_normal(DIM).astype(np.float32)
    res, _ = eng.search_by_vector_ex(vec, k=3, use_cache=False)
    assert len(res) == 3


def test_ivf_below_min_rows_uses_exact(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    eng = VideoSearchEngine(str(vids),
                            config=_ivf_config(ivf_min_rows=10_000),
                            embedder=FakeEmbedder())
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((128, DIM)).astype(np.float32)
    eng.index.add_batch(emb, "small.mp4", [float(t) for t in range(128)])
    eng._maybe_build_ivf()
    assert eng._ivf is None
    assert eng.ann_stats()["active"] is False
    assert len(eng.search("anything", k=3, use_cache=False)) == 3


def test_ivf_absorbs_appends_and_rebuilds_on_delete(ivf_engine):
    eng = ivf_engine
    rng = np.random.default_rng(2)
    built_rows = eng._ivf_rows
    more = rng.standard_normal((50, DIM)).astype(np.float32)
    more /= np.linalg.norm(more, axis=-1, keepdims=True)
    eng.index.add_batch(more, "vid9.mp4", [float(t) for t in range(50)])
    eng._ivf_absorb_appends()
    assert eng._ivf_rows == built_rows + 50
    # fresh rows are exact-merged into results
    q = more[7]
    res, _ = eng.search_by_vector_ex(q, k=1, use_cache=False)
    assert res[0]["video_name"] == "vid9.mp4"
    # deletion compacts row ids -> tier rebuilt, stale ids impossible
    eng.remove_video("vid0.mp4")
    assert eng._ivf is not None
    s = eng.ann_stats()
    assert s["rows"] == 350 and s["fresh_rows"] == 0
    res = eng.search("post delete", k=5, use_cache=False)
    assert all(r["video_name"] != "vid0.mp4" for r in res)


def test_ivf_startup_end_to_end(tmp_path):
    """Full startup flow with real synthetic videos + kind=ivf."""
    vids = tmp_path / "videos"
    vids.mkdir()
    for i in range(3):
        make_synthetic_video(vids / f"vid{i}.mp4", n_frames=60)
    cfg = _ivf_config(ivf_min_rows=16, ivf_nlist=4)
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()
    assert eng.ready and eng._ivf is not None
    res = eng.search("a synthetic scene", k=3, use_cache=False)
    assert len(res) == 3
