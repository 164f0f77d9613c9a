"""Pipelined serving coalescer: the dispatch/resolve split
(engine/batching.py) must return exactly what the serial path returns,
under concurrency and interleaved writers, with the engine read lock
handed across threads (utils/locks.py).

The reference has no serving batcher at all (its BatchProcessor,
src/core/feature_extractor.py:261-354, was dead code); these tests guard
the TPU-native replacement's concurrency contract.
"""

import threading
import time

import numpy as np
import pytest

from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import (ApiConfig, EngineConfig,
                                      VideoSearchEngine)
from video_quierer_tpu.models.clip.config import (
    CLIPConfig, CLIPTextConfig, CLIPVisionConfig, register_config)
from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
from video_quierer_tpu.utils.locks import RWLock

TINY = "coalesce-tiny-224"

register_config(TINY, lambda: CLIPConfig(
    name=TINY,
    projection_dim=16,
    vision=CLIPVisionConfig(image_size=224, patch_size=32,
                            hidden_size=32, num_layers=2, num_heads=2),
    # full CLIP vocab so the real tokenizer's ids stay in range
    text=CLIPTextConfig(vocab_size=49408, context_length=77,
                        hidden_size=16, num_layers=2, num_heads=2,
                        eot_token_id=49407),
))


@pytest.fixture
def engine(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "pipe.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8), coalesce_width=16)
    cfg.index.embed_dim = 16
    eng = VideoSearchEngine(str(vids), config=cfg,
                            embedder=CLIPEmbedder(model_name=TINY, seed=1))
    eng.startup()
    return eng


def _fused_reachable(eng) -> bool:
    return eng._dispatch_batch_fused(["probe"], 3) is not None


def test_dispatch_resolve_matches_serial(engine):
    """The two-phase engine API must agree with search() per query."""
    assert _fused_reachable(engine)
    queries = [f"two phase {i}" for i in range(5)]
    with engine.lock.read():
        resolve = engine._dispatch_batch_fused(queries, 3)
        assert resolve is not None
        batches = resolve()
    for q, rows in zip(queries, batches):
        direct = engine.search(q, k=3, use_cache=False)
        assert [r["frame_id"] for r in rows] == \
            [r["frame_id"] for r in direct]
        np.testing.assert_allclose([r["score"] for r in rows],
                                   [r["score"] for r in direct], rtol=1e-5)


def test_pipelined_coalescer_concurrent(engine):
    """Concurrent coalesced searches through the PIPELINED path (real
    text_encode_fn → fused dispatch → resolver thread) must each match
    the direct path."""
    results, errors = {}, []

    def work(q):
        try:
            results[q] = engine.search_coalesced(q, k=3, use_cache=False)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    queries = [f"pipelined {i}" for i in range(24)]
    threads = [threading.Thread(target=work, args=(q,)) for q in queries]
    [t.start() for t in threads]
    [t.join(timeout=120) for t in threads]
    assert not errors
    assert len(results) == len(queries)
    assert engine.metrics.counter("pipelined_flushes") >= 1
    assert engine.metrics.counter("fused_search_fallbacks") == 0
    for q in queries:
        direct = engine.search(q, k=3, use_cache=False)
        assert [r["frame_id"] for r in results[q]] == \
            [r["frame_id"] for r in direct]


def test_pipelined_with_interleaved_writer(engine):
    """A writer mutating the index between flushes must neither deadlock
    (lock hand-off + bounded resolve queue) nor corrupt in-flight
    results: every response names a video that exists and scores stay
    descending."""
    stop = threading.Event()
    errors = []

    def reader(tid):
        i = 0
        while not stop.is_set():
            try:
                rows = engine.search_coalesced(
                    f"t{tid} n{i} beach", k=3, use_cache=False)
                assert rows, "empty result"
                scores = [r["score"] for r in rows]
                assert scores == sorted(scores, reverse=True)
                assert all(r["video_name"].endswith(".mp4") for r in rows)
            except Exception as e:  # pragma: no cover
                errors.append(e)
                break
            i += 1

    def writer():
        rng = np.random.default_rng(7)
        j = 0
        while not stop.is_set():
            emb = rng.standard_normal((4, 16)).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
            with engine.lock.write():
                engine.index.add_batch(emb, "writer.mp4",
                                       [float(j * 4 + m) for m in range(4)])
            j += 1
            time.sleep(0.01)

    threads = [threading.Thread(target=reader, args=(t,)) for t in range(6)]
    threads.append(threading.Thread(target=writer))
    [t.start() for t in threads]
    time.sleep(3.0)
    stop.set()
    [t.join(timeout=60) for t in threads]
    assert not any(t.is_alive() for t in threads), "deadlocked thread"
    assert not errors


def test_resolver_pool_concurrent(engine, monkeypatch):
    """With a resolver POOL (the per-flush result fetch is RTT-bound, so
    concurrent resolvers overlap the fetches) every request must still
    match the direct path and shutdown must join every pool thread."""
    monkeypatch.setenv("VQT_COALESCE_RESOLVERS", "3")
    from video_quierer_tpu.engine.batching import SearchCoalescer
    co = SearchCoalescer(engine, max_batch=4, max_wait_ms=2.0,
                         pipeline_depth=3)
    assert len(co._resolvers) == 3
    results, errors = {}, []

    def work(q):
        try:
            results[q] = co.search(q, k=3, use_cache=False)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    queries = [f"pool {i}" for i in range(24)]
    threads = [threading.Thread(target=work, args=(q,)) for q in queries]
    [t.start() for t in threads]
    [t.join(timeout=120) for t in threads]
    assert not errors and len(results) == len(queries)
    for q in queries:
        direct = engine.search(q, k=3, use_cache=False)
        assert [r["frame_id"] for r in results[q]] == \
            [r["frame_id"] for r in direct]
    co.close()
    for t in co._resolvers:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in co._resolvers)


def test_pipeline_depth_zero_serial(tmp_path, monkeypatch):
    """VQT_COALESCE_PIPELINE=0 keeps the old fully-serial flush path."""
    monkeypatch.setenv("VQT_COALESCE_PIPELINE", "0")
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "ser.mp4", n_frames=20)
    cfg = EngineConfig(api=ApiConfig(max_frames=5), coalesce_width=8)
    cfg.index.embed_dim = 16
    eng = VideoSearchEngine(str(vids), config=cfg,
                            embedder=CLIPEmbedder(model_name=TINY, seed=2))
    eng.startup()
    assert eng.search_coalesced("serial probe", k=2, use_cache=False)
    assert eng._coalescer.pipeline_depth == 0
    assert eng.metrics.counter("pipelined_flushes") == 0


def test_rwlock_cross_thread_handoff():
    """A read lock acquired in one thread may be released by another;
    a queued writer proceeds only after that release."""
    lock = RWLock()
    lock.acquire_read()
    got_write = threading.Event()

    def writer():
        with lock.write():
            got_write.set()

    w = threading.Thread(target=writer)
    w.start()
    time.sleep(0.1)
    assert not got_write.is_set()

    releaser = threading.Thread(target=lock.release_read)
    releaser.start()
    releaser.join(timeout=5)
    w.join(timeout=5)
    assert got_write.is_set()
