"""Mesh-sharded DeviceVideoIndex: exact parity with the single-device
index through the full engine path, on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

from tests.fake_embedder import FakeEmbedder
from tests.helpers import make_synthetic_video
from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
    VideoSearchEngine
from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.parallel.mesh import corpus_mesh


@pytest.fixture(scope="module")
def mesh():
    return corpus_mesh(8)


def _rand(rng, n):
    e = rng.standard_normal((n, 512)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_sharded_index_matches_single(rng, mesh):
    embs = _rand(rng, 3000)
    ts = np.arange(3000, dtype=float)
    single = DeviceVideoIndex()
    single.add_batch(embs, "v.mp4", ts)
    sharded = DeviceVideoIndex(mesh=mesh)
    sharded.add_batch(embs, "v.mp4", ts)
    for i in range(5):
        q = rng.standard_normal(512).astype(np.float32)
        rs = single.search(q, k=10)
        rm = sharded.search(q, k=10)
        assert [r["frame_id"] for r in rm] == [r["frame_id"] for r in rs]
        np.testing.assert_allclose([r["score"] for r in rm],
                                   [r["score"] for r in rs], rtol=1e-5)


def test_sharded_index_incremental_append(rng, mesh):
    idx = DeviceVideoIndex(mesh=mesh)
    idx.add_batch(_rand(rng, 100), "a.mp4", np.arange(100, dtype=float))
    idx.search(np.ones(512, np.float32), k=3)  # mirror synced
    spike = np.zeros((1, 512), np.float32)
    spike[0, 7] = 1.0
    idx.add_batch(spike, "b.mp4", [5.0])
    res = idx.search(spike[0], k=1)
    assert res[0]["video_name"] == "b.mp4"
    assert res[0]["frame_id"] == 100


def test_sharded_capacity_granularity(mesh):
    idx = DeviceVideoIndex(mesh=mesh)
    n_shards = 8
    from video_quierer_tpu.ops.topk import BLOCK_ROWS
    assert idx._emb.shape[0] % (n_shards * BLOCK_ROWS) == 0
    idx._ensure_capacity(50_000)
    assert idx._emb.shape[0] % (n_shards * BLOCK_ROWS) == 0


def test_engine_with_corpus_shards(tmp_path, mesh):
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "s.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=10))
    cfg.index.corpus_shards = 8
    eng = VideoSearchEngine(str(vids), config=cfg, embedder=FakeEmbedder())
    eng.startup()
    assert eng.index.mesh is not None
    res = eng.search("query", k=5)
    assert len(res) == 5
    # parity vs single-device engine on the same videos
    cfg2 = EngineConfig(api=ApiConfig(max_frames=10))
    eng2 = VideoSearchEngine(str(vids), config=cfg2,
                             embedder=FakeEmbedder())
    eng2.startup()
    res2 = eng2.search("query", k=5)
    assert [r["frame_id"] for r in res] == [r["frame_id"] for r in res2]
