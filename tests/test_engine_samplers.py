"""Engine-wired sampling strategies (round 3 — VERDICT r2 item 3).

``ingest.sampling_strategy`` / ``ingest.quality_filter`` (engine/config.py)
route ``VideoSearchEngine._ingest`` through ingest/samplers.py — the dead
path's extractor strategies (frame_extractor.py:365-388) reachable from a
config file / env var, not just tests.
"""

from pathlib import Path

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import (ApiConfig, EngineConfig,
                                      VideoSearchEngine)
from video_quierer_tpu.engine.config import (IngestConfig,
                                             apply_env_overrides)


def _engine(tmp_path, strategy, quality_filter=False, max_frames=12):
    vids = tmp_path / "videos"
    vids.mkdir(exist_ok=True)
    make_synthetic_video(vids / "v.mp4", n_frames=90, scene_every=15)
    cfg = EngineConfig(
        api=ApiConfig(max_frames=max_frames, sampling_mode="high"),
        ingest=IngestConfig(sampling_strategy=strategy,
                            quality_filter=quality_filter))
    cfg.validate()
    return VideoSearchEngine(str(vids), config=cfg,
                             embedder=FakeEmbedder())


@pytest.mark.parametrize("strategy",
                         ["interval", "uniform", "adaptive", "hybrid",
                          "auto"])
def test_engine_ingests_with_each_strategy(tmp_path, strategy):
    eng = _engine(tmp_path, strategy)
    eng.startup()
    assert eng.ready
    n = len(eng.index)
    assert 1 <= n <= 12, f"{strategy}: {n} frames"
    # timestamps must be real video positions, ascending per video
    ts = eng.index._timestamps[:n]
    assert (np.diff(ts) >= 0).all()
    assert ts[-1] <= 4.0  # 90 frames @ 30fps = 3s
    # search still serves results from the strategy-sampled index
    rows = eng.search("anything", k=3)
    assert rows and rows[0]["video_name"] == "v.mp4"


def test_uniform_counts_match_budget(tmp_path):
    eng = _engine(tmp_path, "uniform", max_frames=9)
    eng.startup()
    assert len(eng.index) == 9  # seek-based: exactly the budget


def test_quality_filter_drops_black_frames(tmp_path):
    """A video with solid-black (sub-brightness) scenes: the quality gate
    must drop those frames on the interval path."""
    import cv2
    vids = tmp_path / "videos"
    vids.mkdir()
    path = vids / "dark.mp4"
    w, h = 64, 48
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30.0, (w, h))
    rng = np.random.default_rng(3)
    for i in range(60):
        if (i // 10) % 2 == 0:
            frame = np.zeros((h, w, 3), np.uint8)  # black scene
        else:
            # high-contrast 8px blocks: edges survive the 64->224 crop
            # upscale, so the Laplacian blur gate passes these
            blocks = rng.integers(0, 2, (h // 8, w // 8)).astype(np.uint8)
            frame = np.kron(blocks * 255,
                            np.ones((8, 8), np.uint8))[..., None]
            frame = np.repeat(frame, 3, axis=-1)
        writer.write(frame)
    writer.release()

    base_cfg = EngineConfig(api=ApiConfig(max_frames=12,
                                          sampling_mode="high"))
    eng = VideoSearchEngine(str(vids), config=base_cfg,
                            embedder=FakeEmbedder())
    eng.startup()
    n_all = len(eng.index)

    filt_cfg = EngineConfig(
        api=ApiConfig(max_frames=12, sampling_mode="high"),
        ingest=IngestConfig(quality_filter=True))
    vids2 = tmp_path / "videos2"
    vids2.mkdir()
    (vids2 / "dark.mp4").write_bytes(path.read_bytes())
    eng2 = VideoSearchEngine(str(vids2), config=filt_cfg,
                             embedder=FakeEmbedder())
    eng2.startup()
    assert 0 < len(eng2.index) < n_all


def test_env_overrides_reach_strategy(monkeypatch):
    monkeypatch.setenv("VQT_SAMPLING_STRATEGY", "hybrid")
    monkeypatch.setenv("VQT_QUALITY_FILTER", "1")
    cfg = apply_env_overrides(EngineConfig())
    assert cfg.ingest.sampling_strategy == "hybrid"
    assert cfg.ingest.quality_filter is True
    cfg.validate()
    monkeypatch.setenv("VQT_SAMPLING_STRATEGY", "bogus")
    with pytest.raises(ValueError):
        apply_env_overrides(EngineConfig()).validate()


def test_extract_frames_strategy_interval_matches_live_path(tmp_path):
    """strategy='interval' without the quality gate must reproduce the
    live path's frames exactly (same interval math, same crops)."""
    from video_quierer_tpu.ingest.frames import extract_frames
    from video_quierer_tpu.ingest.samplers import extract_frames_strategy
    v = make_synthetic_video(tmp_path / "v.mp4", n_frames=60)
    want_f, want_ts = extract_frames(v, max_frames=8, sampling_mode="high")
    got_f, got_ts = extract_frames_strategy(
        v, "interval", max_frames=8, sampling_mode="high")
    np.testing.assert_array_equal(got_f, want_f)
    assert got_ts == want_ts
