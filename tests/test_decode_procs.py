"""Opt-in process-pool decode tier (round-4 VERDICT item 4).

The decode stage (~420 source-f/s/core at 720p) bounds whole-system
ingest on few-core hosts (BASELINE.md); threads only help while OpenCV/
FFmpeg hold the GIL released, and Python-side sampling strategies
(adaptive/hybrid) compute between decodes. ``num_procs > 0`` switches
``batched_frames`` to a spawn-context ProcessPoolExecutor
(ingest/pipeline.py:_make_pool). The contract these tests pin: frame
ORDER, frame BYTES, and batch boundaries are identical under any pool
(consumption follows submission order, never completion order) — so
``frame_id`` assignment, and therefore embeddings and search results,
cannot depend on the worker count.

Reference analog: HOT LOOP 1's strictly serial decode
(video_search_overhaul.py:184-196).
"""

import warnings
from pathlib import Path

import numpy as np
import pytest

from video_quierer_tpu.ingest.pipeline import (_make_pool, batched_frames,
                                               strategy_extract)
from helpers import make_synthetic_video


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    paths = []
    for i, n in enumerate((40, 25, 33)):
        p = d / f"v{i}.mp4"
        make_synthetic_video(p, n_frames=n)
        paths.append(p)
    return paths


def _collect(paths, **kw):
    out = []
    for b in batched_frames(paths, max_frames=20, sampling_mode="high",
                            batch_size=16, **kw):
        out.append((b.frames.copy(), list(b.video_indices),
                    list(b.timestamps)))
    return out


def _assert_same(a, b):
    assert len(a) == len(b)
    for (fa, va, ta), (fb, vb, tb) in zip(a, b):
        np.testing.assert_array_equal(fa, fb)
        assert va == vb
        assert ta == tb


@pytest.mark.slow
def test_process_pool_matches_threads(videos):
    """Identical batches (bytes + order) for threads vs 1-proc vs
    2-proc pools — the determinism bar for frame_id stability."""
    threads = _collect(videos, num_workers=3, num_procs=0)
    assert sum(f.shape[0] for f, _, _ in threads) > 0
    one = _collect(videos, num_procs=1)
    two = _collect(videos, num_procs=2)
    _assert_same(threads, one)
    _assert_same(threads, two)


@pytest.mark.slow
def test_process_pool_strategy_extract(videos):
    """The engine's sampler wiring (functools.partial over the
    module-level strategy_extract) must survive pickling into workers
    and match the thread pool."""
    import functools
    fn = functools.partial(strategy_extract, strategy="uniform",
                           max_frames=10, sampling_mode="high",
                           target_size=224, quality_filter=False)
    threads = _collect(videos, extract_fn=fn, num_procs=0)
    procs = _collect(videos, extract_fn=fn, num_procs=2)
    assert sum(f.shape[0] for f, _, _ in threads) > 0
    _assert_same(threads, procs)


def test_unpicklable_extractor_falls_back_to_threads(videos, caplog):
    """A closure extractor can't cross a process boundary; the pool
    builder must warn and keep working on threads."""
    local = {"calls": 0}

    def closure_fn(path):
        local["calls"] += 1
        from video_quierer_tpu.ingest.frames import extract_frames
        return extract_frames(path, max_frames=5, sampling_mode="high")

    import logging
    with caplog.at_level(logging.WARNING,
                         logger="video_quierer_tpu.ingest.pipeline"):
        out = _collect(videos[:1], extract_fn=closure_fn, num_procs=2)
    assert local["calls"] == 1           # ran in-process (threads)
    assert sum(f.shape[0] for f, _, _ in out) > 0
    assert any("not picklable" in r.message for r in caplog.records)


def test_pool_builder_kinds():
    from concurrent.futures import (ProcessPoolExecutor,
                                    ThreadPoolExecutor)
    p = _make_pool(2, 0, strategy_extract)
    assert isinstance(p, ThreadPoolExecutor)
    p.shutdown()
    p = _make_pool(2, 1, strategy_extract)
    try:
        assert isinstance(p, ProcessPoolExecutor)
    finally:
        p.shutdown()
