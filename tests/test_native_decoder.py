"""Native decode tier tests: parity with the OpenCV path on synthetic
videos, plus a decode-throughput comparison (informational)."""

import time

import numpy as np
import pytest

from tests.helpers import make_synthetic_video
from video_quierer_tpu.ingest import frames as frames_mod
from video_quierer_tpu.ingest import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder not built")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    return make_synthetic_video(d / "nat.mp4", n_frames=120, fps=30.0,
                                size=(128, 96))


def test_probe_matches_opencv(video):
    fps, total, w, h = native.probe(video)
    meta = frames_mod.probe_video(video)
    assert abs(fps - meta.fps) < 0.01
    assert total == meta.total_frames
    assert (w, h) == (128, 96)


def test_probe_missing_file(tmp_path):
    assert native.probe(tmp_path / "missing.mp4") is None


def test_decode_matches_opencv_path(video):
    n_frames, mode = 12, "high"
    nat_frames, nat_ts = frames_mod.extract_frames(
        video, max_frames=n_frames, sampling_mode=mode, use_native=True)
    cv_frames, cv_ts = frames_mod.extract_frames(
        video, max_frames=n_frames, sampling_mode=mode, use_native=False)
    assert nat_frames.shape == cv_frames.shape == (12, 224, 224, 3)
    np.testing.assert_allclose(nat_ts, cv_ts)
    # pixel-level: same frames, independent decoders+scalers → close but
    # not bitwise identical (different bicubic taps); compare means.
    for i in range(nat_frames.shape[0]):
        diff = np.abs(nat_frames[i].astype(np.int32)
                      - cv_frames[i].astype(np.int32)).mean()
        assert diff < 10.0, (i, diff)


def test_decode_caps_at_max_frames(video):
    frames, ts = native.decode_sampled(video, interval=1, max_frames=5,
                                       target_size=224)
    assert frames.shape == (5, 224, 224, 3)
    np.testing.assert_allclose(ts, [i / 30.0 for i in range(5)])


def test_decode_bad_file(tmp_path):
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"garbage")
    assert native.decode_sampled(bad, 1, 5) is None


def test_decode_tier_timing_informational(video, capsys):
    """Informational only: print the two tiers' timings. The pip cv2
    wheel's bundled SIMD usually wins on hosts that have it (see
    frames.extract_frames docstring); no hard assertion beyond sanity."""
    def run(use_native):
        t0 = time.perf_counter()
        for _ in range(3):
            frames_mod.extract_frames(video, max_frames=60,
                                      sampling_mode="ultra_high",
                                      use_native=use_native)
        return time.perf_counter() - t0

    t_native = run(True)
    t_cv = run(False)
    with capsys.disabled():
        print(f"\n[native decode] {t_native:.3f}s vs opencv {t_cv:.3f}s "
              f"({t_cv / t_native:.2f}x)")
    assert t_native < 10.0 and t_cv < 10.0


def test_env_toggle(video, monkeypatch):
    monkeypatch.setenv("VQT_NATIVE_DECODE", "1")
    f1, ts1 = frames_mod.extract_frames(video, max_frames=5)
    monkeypatch.delenv("VQT_NATIVE_DECODE")
    f2, ts2 = frames_mod.extract_frames(video, max_frames=5)
    assert f1.shape == f2.shape
    np.testing.assert_allclose(ts1, ts2)
