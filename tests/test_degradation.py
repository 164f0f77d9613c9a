"""Failure-degradation tests: CLIP failure falls back to handcrafted
features (reference behavior), search timeout enforcement, CLI smoke."""

import subprocess
import sys

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine


class ExplodingEmbedder(FakeEmbedder):
    def embed_frames(self, frames_u8):
        raise RuntimeError("device on fire")

    def embed_text(self, text):
        raise RuntimeError("device on fire")

    def embed_texts(self, texts):
        raise RuntimeError("device on fire")


def test_embed_failure_degrades_like_reference(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "d.mp4", n_frames=30)
    cfg = EngineConfig(api=ApiConfig(max_frames=5))
    eng = VideoSearchEngine(str(vids), config=cfg,
                            embedder=ExplodingEmbedder())
    eng.startup()  # must not raise — visual-stats fallback kicks in
    assert len(eng.index) == 5
    assert eng.metrics.counter("embed_fallbacks") >= 1
    res = eng.search("bright", k=2)  # text encode also degrades
    assert len(res) == 2
    norms = [abs(np.linalg.norm(
        eng.index._emb[i]) - 1.0) < 1e-5 for i in range(5)]
    assert all(norms)  # fallback features are unit-normalized


def test_cli_smoke(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "c.mp4", n_frames=20)
    # use_clip false so the CLI runs without loading the big model
    (tmp_path / "config.json").write_text(
        '{"use_clip": false, "max_frames": 5}')
    proc = subprocess.run(
        [sys.executable, "-m", "video_quierer_tpu.cli",
         "--videos-dir", str(vids), "-k", "2"],
        input="bright scene\nquit\n", capture_output=True, text=True,
        timeout=120, cwd=tmp_path,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo",
             "HOME": str(tmp_path)})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Index ready: 5 frames" in proc.stdout
    assert "c.mp4" in proc.stdout
