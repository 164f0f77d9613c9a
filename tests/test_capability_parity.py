"""Tests for the dead-path capability rebuilds: per-video dedup search,
frame-embedding memo, config-hash staleness, YAML engine config."""

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine
from video_quierer_tpu.engine.config import load_engine_config, \
    save_api_config
from video_quierer_tpu.models.clip.embedder import MemoizedEmbedder


@pytest.fixture
def engine(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    for i in range(3):
        make_synthetic_video(vids / f"d{i}.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8))
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()
    return eng


# -- dedup search ----------------------------------------------------------

def test_dedup_videos_one_per_video(engine):
    res = engine.search("any", k=3, dedup_videos=True)
    names = [r["video_name"] for r in res]
    assert len(names) == len(set(names)) == 3
    # best-per-video: each deduped entry is that video's best plain result
    plain = engine.search("any", k=50 if False else 20, use_cache=False)
    best = {}
    for r in plain:
        best.setdefault(r["video_name"], r["frame_id"])
    for r in res:
        assert best[r["video_name"]] == r["frame_id"]


def test_dedup_k_larger_than_videos(engine):
    res = engine.search("any", k=10, dedup_videos=True)
    assert len(res) == 3  # only 3 videos exist


# -- memoized embedder -----------------------------------------------------

def test_memoized_embedder_hits(rng):
    inner = FakeEmbedder()
    memo = MemoizedEmbedder(inner, max_size=100)
    frames = rng.integers(0, 255, (6, 224, 224, 3), dtype=np.uint8)
    first = memo.embed_frames(frames)
    assert memo.misses == 6 and memo.hits == 0
    second = memo.embed_frames(frames)
    assert memo.hits == 6
    np.testing.assert_array_equal(first, second)
    mixed = memo.embed_frames(
        np.concatenate([frames[:2],
                        rng.integers(0, 255, (1, 224, 224, 3),
                                     dtype=np.uint8)]))
    assert memo.hits == 8 and memo.misses == 7
    np.testing.assert_array_equal(mixed[:2], first[:2])


def test_memoized_embedder_eviction(rng):
    memo = MemoizedEmbedder(FakeEmbedder(), max_size=4)
    frames = rng.integers(0, 255, (6, 224, 224, 3), dtype=np.uint8)
    memo.embed_frames(frames)
    assert len(memo._memo) == 4


def test_engine_frame_memo_config(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    cfg = EngineConfig()
    cfg.cache.frame_memo_size = 10
    cfg.api.use_clip = True
    eng = VideoSearchEngine(str(vids), config=cfg)
    # engine wraps the CLIP embedder lazily; force only wrapper check by
    # injecting after construction is not possible — verify via class
    emb = eng._get_embedder()
    assert isinstance(emb, MemoizedEmbedder)


# -- config-hash staleness -------------------------------------------------

def test_config_change_triggers_reprocess(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "c.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8),
                       invalidate_on_config_change=True)
    e1 = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    e1.startup()
    assert len(e1.index) == 8

    # same config → cache reused (no reprocess → same count)
    e2 = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    e2.startup()
    assert len(e2.index) == 8

    # index-affecting change → full reprocess with the new config
    cfg2 = EngineConfig(api=ApiConfig(max_frames=4),
                        invalidate_on_config_change=True)
    e3 = VideoSearchEngine(str(vids), config=cfg2, embedder=FakeEmbedder())
    e3.startup()
    assert len(e3.index) == 4


def test_config_change_ignored_by_default(tmp_path):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "c.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8))
    e1 = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    e1.startup()
    cfg2 = EngineConfig(api=ApiConfig(max_frames=4))
    e2 = VideoSearchEngine(str(vids), config=cfg2, embedder=FakeEmbedder())
    e2.startup()
    assert len(e2.index) == 8  # live-path parity: stale cache kept


# -- YAML engine config ----------------------------------------------------

def test_yaml_engine_config(tmp_path):
    cjson = tmp_path / "config.json"
    save_api_config(ApiConfig(max_frames=123), cjson)
    (tmp_path / "engine.yaml").write_text(
        "ingest:\n  batch_size: 99\n  num_decode_workers: 2\n"
        "index:\n  device_dtype: bfloat16\n"
        "api:\n  sampling_mode: medium\n"
        "unknown_key: 5\n")
    cfg = load_engine_config(cjson)
    assert cfg.ingest.batch_size == 99
    assert cfg.ingest.num_decode_workers == 2
    assert cfg.index.device_dtype == "bfloat16"
    assert cfg.api.sampling_mode == "medium"  # yaml overrides json tier
    assert cfg.api.max_frames == 123          # json value kept
