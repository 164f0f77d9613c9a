"""Ingest tests: sampling-interval parity with the reference formulas,
extraction behavior on synthetic MP4s, the batching pipeline's ordering
guarantees, and the sampler family."""

import numpy as np
import pytest

from tests.helpers import make_synthetic_video
from video_quierer_tpu.ingest import frames as frames_mod
from video_quierer_tpu.ingest import samplers as samplers_mod
from video_quierer_tpu.ingest.pipeline import batched_frames, group_by_video


# ---------------------------------------------------------------------------
# Interval math — oracle transcribed from video_search_overhaul.py:163-179
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("total,maxf", [
    (9000, 300), (100, 300), (0, 300), (1, 1), (50000, 500), (299, 300),
])
def test_sampling_interval_parity(total, maxf):
    assert frames_mod.sampling_interval(total, maxf, "ultra_high") == \
        max(1, total // (maxf * 2))
    assert frames_mod.sampling_interval(total, maxf, "high") == \
        max(1, total // maxf)
    assert frames_mod.sampling_interval(total, maxf, "medium") == \
        max(1, total // max(1, maxf // 2))
    assert frames_mod.sampling_interval(total, maxf, "low") == \
        max(1, total // max(1, maxf // 4))
    # unknown mode behaves like low (reference's trailing else)
    assert frames_mod.sampling_interval(total, maxf, "bogus") == \
        frames_mod.sampling_interval(total, maxf, "low")


# ---------------------------------------------------------------------------
# Extraction on synthetic videos
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def video_90(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    return make_synthetic_video(d / "v90.mp4", n_frames=90, fps=30.0)


def test_extract_frames_counts_and_timestamps(video_90):
    frames, stamps = frames_mod.extract_frames(video_90, max_frames=10,
                                               sampling_mode="high")
    # interval = max(1, 90 // 10) = 9 → frames 0, 9, 18, ... 81 = 10 frames
    assert frames.shape == (10, 224, 224, 3)
    assert frames.dtype == np.uint8
    np.testing.assert_allclose(stamps, [i * 9 / 30.0 for i in range(10)])


def test_extract_respects_max_frames(video_90):
    frames, stamps = frames_mod.extract_frames(video_90, max_frames=4,
                                               sampling_mode="ultra_high")
    # ultra_high interval = max(1, 90 // 8) = 11; capped at 4 frames
    assert frames.shape[0] == 4
    np.testing.assert_allclose(stamps, [0, 11 / 30, 22 / 30, 33 / 30])


def test_extract_missing_file(tmp_path):
    frames, stamps = frames_mod.extract_frames(tmp_path / "nope.mp4")
    assert frames.shape[0] == 0 and stamps == []


def test_probe_and_identity_hash(video_90, tmp_path):
    meta = frames_mod.probe_video(video_90)
    assert meta is not None
    assert meta.total_frames == 90
    assert abs(meta.fps - 30.0) < 0.1
    h1 = frames_mod.video_identity_hash(video_90)
    assert h1 == frames_mod.video_identity_hash(video_90)
    import shutil
    other = tmp_path / "copy.mp4"
    shutil.copy(video_90, other)
    assert frames_mod.video_identity_hash(other) != h1  # name differs


def test_frame_at_timestamp(video_90):
    frame = frames_mod.frame_at_timestamp(video_90, 1.0)
    assert frame is not None and frame.ndim == 3
    assert frames_mod.frame_at_timestamp(video_90, 9999.0) is None


# ---------------------------------------------------------------------------
# Batching pipeline
# ---------------------------------------------------------------------------

def test_pipeline_order_and_batching(tmp_path):
    paths = [make_synthetic_video(tmp_path / f"v{i}.mp4", n_frames=30)
             for i in range(3)]
    batches = list(batched_frames(paths, max_frames=10, sampling_mode="high",
                                  batch_size=8, num_workers=3))
    all_vidx = [v for b in batches for v in b.video_indices]
    all_ts = [t for b in batches for t in b.timestamps]
    assert len(all_vidx) == 30  # 10 per video
    # deterministic video order, timestamps ascending within each video
    assert all_vidx == sorted(all_vidx)
    for vi in range(3):
        ts = [t for v, t in zip(all_vidx, all_ts) if v == vi]
        assert ts == sorted(ts)
    # all but the last batch are full
    assert all(len(b) == 8 for b in batches[:-1])


def test_pipeline_worker_count_invariant(tmp_path):
    """num_decode_workers is a throughput knob, not a semantics knob:
    byte-identical frames/timestamps for 1 vs 4 workers (round-2 VERDICT
    item 7 — the 8-worker scale projection must be structural)."""
    paths = [make_synthetic_video(tmp_path / f"w{i}.mp4", n_frames=24)
             for i in range(5)]

    def run(workers):
        batches = list(batched_frames(paths, max_frames=8,
                                      sampling_mode="high", batch_size=16,
                                      num_workers=workers))
        frames = np.concatenate([b.frames for b in batches])
        vidx = [v for b in batches for v in b.video_indices]
        ts = [t for b in batches for t in b.timestamps]
        return frames, vidx, ts

    f1, v1, t1 = run(1)
    f4, v4, t4 = run(4)
    assert v1 == v4 and t1 == t4
    np.testing.assert_array_equal(f1, f4)


def test_pipeline_skips_bad_video(tmp_path):
    good = make_synthetic_video(tmp_path / "good.mp4", n_frames=30)
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")
    batches = list(batched_frames([bad, good], max_frames=5,
                                  sampling_mode="high", batch_size=16))
    all_vidx = [v for b in batches for v in b.video_indices]
    assert set(all_vidx) == {1}


def test_group_by_video(tmp_path):
    paths = [make_synthetic_video(tmp_path / f"g{i}.mp4", n_frames=30)
             for i in range(2)]
    batches = list(batched_frames(paths, max_frames=6, sampling_mode="high",
                                  batch_size=12, num_workers=2))
    groups = [g for b in batches for g in group_by_video(b)]
    # 6+6 frames in one 12-batch → two contiguous groups
    assert [g[0] for g in groups] == [0, 1]
    assert all(g[1].shape[0] == 6 for g in groups)


# ---------------------------------------------------------------------------
# Sampler family (dead-path D4 parity surface)
# ---------------------------------------------------------------------------

def test_uniform_sampler(video_90):
    pairs = list(samplers_mod.UniformSampler(count=9).sample(video_90))
    assert len(pairs) == 9
    ts = [t for _, t in pairs]
    assert ts == sorted(ts)
    assert all(f.shape == (224, 224, 3) for f, _ in pairs)


def test_adaptive_sampler_detects_scene_changes(tmp_path):
    v = make_synthetic_video(tmp_path / "scenes.mp4", n_frames=120,
                             scene_every=30)
    pairs = list(samplers_mod.AdaptiveSampler(
        min_interval_s=0.2, decode_stride=1).sample(v))
    ts = [t for _, t in pairs]
    assert ts and ts[0] == 0.0  # first frame always kept
    # scene boundaries at frames 30/60/90 → ~1s/2s/3s must be detected
    for boundary in (1.0, 2.0, 3.0):
        assert any(abs(t - boundary) < 0.25 for t in ts), (boundary, ts)


def test_hybrid_sampler_dedup(tmp_path):
    v = make_synthetic_video(tmp_path / "hy.mp4", n_frames=60)
    sampler = samplers_mod.HybridSampler(uniform_count=10)
    ts = [t for _, t in sampler.sample(v)]
    assert ts == sorted(ts)
    assert all(b - a >= sampler.dedup_window_s - 1e-9
               for a, b in zip(ts, ts[1:]))


def test_choose_strategy():
    assert isinstance(samplers_mod.choose_strategy(60),
                      samplers_mod.UniformSampler)
    assert isinstance(samplers_mod.choose_strategy(7200),
                      samplers_mod.AdaptiveSampler)
    assert isinstance(samplers_mod.choose_strategy(1800),
                      samplers_mod.HybridSampler)


def test_quality_filter():
    dark = np.zeros((64, 64), np.uint8)
    assert not samplers_mod.passes_quality_filter(dark)
    bright = np.full((64, 64), 255, np.uint8)
    assert not samplers_mod.passes_quality_filter(bright)
    rng = np.random.default_rng(0)
    sharp = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    assert samplers_mod.passes_quality_filter(sharp)
    flat = np.full((64, 64), 128, np.uint8)  # mid-brightness but blurry
    assert not samplers_mod.passes_quality_filter(flat)
