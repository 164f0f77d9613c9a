"""Tests: request coalescing, checksum sidecars, cache warming."""

import threading

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine
from video_quierer_tpu.index.device_index import DeviceVideoIndex


@pytest.fixture
def engine(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "co.mp4", n_frames=60)
    cfg = EngineConfig(api=ApiConfig(max_frames=10))
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()
    return eng


# -- coalescing ------------------------------------------------------------

def test_coalesced_matches_direct(engine):
    direct = engine.search("query one", k=4, use_cache=False)
    coal = engine.search_coalesced("query one", k=4, use_cache=False)
    assert [r["frame_id"] for r in coal] == [r["frame_id"] for r in direct]


def test_concurrent_coalesced_searches(engine):
    queries = [f"concurrent {i}" for i in range(16)]
    results = {}
    errors = []

    def work(q):
        try:
            results[q] = engine.search_coalesced(q, k=3, use_cache=False)
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=work, args=(q,)) for q in queries]
    [t.start() for t in threads]
    [t.join(timeout=30) for t in threads]
    assert not errors
    assert len(results) == 16
    for q in queries:
        direct = engine.search(q, k=3, use_cache=False)
        assert [r["frame_id"] for r in results[q]] == \
            [r["frame_id"] for r in direct]
    # at least one multi-request batch was formed
    sizes = engine.metrics.histogram_stats("coalesced_batch_size")
    assert sizes["count"] >= 1
    assert sizes["max"] >= 2


def test_coalesced_mixed_k(engine):
    out = {}

    def work(q, k):
        out[(q, k)] = engine.search_coalesced(q, k=k, use_cache=False)

    threads = [threading.Thread(target=work, args=(f"mk{i}", 2 + i % 3))
               for i in range(9)]
    [t.start() for t in threads]
    [t.join(timeout=30) for t in threads]
    for (q, k), res in out.items():
        assert len(res) == k


def test_coalesce_width_from_config(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "cw.mp4", n_frames=30)
    cfg = EngineConfig(api=ApiConfig(max_frames=5), coalesce_width=128)
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()
    eng.search_coalesced("width probe", k=2, use_cache=False)
    assert eng._coalescer.max_batch == 128


def test_batch_search_chunks_above_widest_bucket(engine):
    # > TEXT_BUCKETS[-1] queries must chunk, and every chunk must agree
    # with the per-query path
    from video_quierer_tpu.models.clip.embedder import TEXT_BUCKETS
    n = TEXT_BUCKETS[-1] + 3
    queries = [f"wide chunk {i}" for i in range(n)]
    batched = engine.search_batch(queries, k=2)
    assert len(batched) == n
    for q, rows in [(queries[0], batched[0]), (queries[-1], batched[-1])]:
        direct = engine.search(q, k=2, use_cache=False)
        assert [r["frame_id"] for r in rows] == \
            [r["frame_id"] for r in direct]


def test_coalesced_uses_cache(engine):
    r1 = engine.search_coalesced("cached co", k=3)
    hits = engine.metrics.counter("search_cache_hits")
    r2 = engine.search_coalesced("cached co", k=3)
    assert engine.metrics.counter("search_cache_hits") == hits + 1
    assert r1 == r2


# -- checksum sidecar ------------------------------------------------------

def test_checksum_sidecar_written_and_verified(tmp_path, rng):
    idx = DeviceVideoIndex()
    emb = rng.standard_normal((5, 512)).astype(np.float32)
    idx.add_batch(emb, "c.mp4", np.arange(5, dtype=float))
    p = tmp_path / "c.pkl"
    assert idx.save_to_disk(p)
    sidecar = tmp_path / "c.pkl.sha256"
    assert sidecar.exists()
    idx2 = DeviceVideoIndex()
    assert idx2.load_from_disk(p)
    assert len(idx2) == 5


def test_checksum_mismatch_fails_load(tmp_path, rng):
    idx = DeviceVideoIndex()
    idx.add_batch(rng.standard_normal((3, 512)).astype(np.float32),
                  "c.mp4", [0.0, 1.0, 2.0])
    p = tmp_path / "c.pkl"
    idx.save_to_disk(p)
    # corrupt one byte
    data = bytearray(p.read_bytes())
    data[len(data) // 2] ^= 0xFF
    p.write_bytes(bytes(data))
    idx2 = DeviceVideoIndex()
    assert not idx2.load_from_disk(p)
    # without verification (or sidecar) corrupted pickles may still fail
    # to parse — that's fine; just ensure verify=False skips the digest
    (tmp_path / "c.pkl.sha256").unlink()
    idx3 = DeviceVideoIndex()
    idx3.load_from_disk(p, verify=False)  # may or may not parse; no crash


def test_reference_cache_without_sidecar_loads(tmp_path, rng):
    """Caches written by the reference have no sidecar — must load."""
    import pickle
    payload = {
        "embeddings": [rng.standard_normal(512).astype(np.float32)],
        "metadata": [{"video_name": "r.mp4", "timestamp": 0.0,
                      "frame_id": 0}],
        "video_hashes": {}, "version": "1.0",
    }
    p = tmp_path / "ref.pkl"
    with open(p, "wb") as f:
        pickle.dump(payload, f)
    idx = DeviceVideoIndex()
    assert idx.load_from_disk(p)


# -- cache warming ---------------------------------------------------------

def test_warm_cache(engine):
    warmed = engine.warm_cache(["warm a", "warm b"], k=3)
    assert warmed == 2
    hits = engine.metrics.counter("search_cache_hits")
    engine.search("warm a", k=3)
    engine.search("warm b", k=3)
    assert engine.metrics.counter("search_cache_hits") == hits + 2
