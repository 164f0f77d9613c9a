"""Multi-slice (DCN) corpus sharding: hierarchical ICI→DCN merge parity
with the single-device scan, on 2×4 and 4×2 virtual meshes (SURVEY.md
§2.3's DCN growth path; no reference analog — it has no distribution)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_quierer_tpu.index.sharded import (
    corpus_spec,
    is_multislice,
    multislice_cosine_topk,
    multislice_cosine_topk_int8,
    shard_corpus,
)
from video_quierer_tpu.ops.topk import cosine_topk
from video_quierer_tpu.parallel.mesh import (
    CORPUS_AXIS,
    DCN_AXIS,
    corpus_mesh,
    initialize_distributed,
    multislice_corpus_mesh,
)


@pytest.fixture(scope="module", params=[(2, 4), (4, 2)],
                ids=["2x4", "4x2"])
def ms_mesh(request):
    n_slices, per_slice = request.param
    assert jax.device_count() >= n_slices * per_slice
    return multislice_corpus_mesh(n_slices,
                                  n_devices=n_slices * per_slice)


def test_mesh_shape_and_helpers(ms_mesh):
    assert set(ms_mesh.axis_names) == {DCN_AXIS, CORPUS_AXIS}
    assert is_multislice(ms_mesh)
    assert not is_multislice(corpus_mesh(8))
    assert corpus_spec(ms_mesh) == jax.sharding.PartitionSpec(
        (DCN_AXIS, CORPUS_AXIS), None)


def test_mesh_divisibility_error():
    with pytest.raises(ValueError, match="divisible"):
        multislice_corpus_mesh(3, n_devices=8)


def test_initialize_distributed_noop(monkeypatch):
    monkeypatch.delenv("VQT_COORDINATOR", raising=False)
    assert initialize_distributed() is False


def test_multislice_matches_single_device(rng, ms_mesh):
    n, b, k = 8 * 1024, 3, 10
    emb = rng.standard_normal((n, 128)).astype(np.float32)
    valid = n - 517
    q = rng.standard_normal((b, 128)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ref_vals, ref_idxs = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                     valid, k=k)
    sharded = shard_corpus(jnp.asarray(emb), ms_mesh)
    vals, idxs = multislice_cosine_topk(sharded, jnp.asarray(q), valid,
                                        k=k, mesh=ms_mesh)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idxs))


def test_multislice_tie_break_across_slices(ms_mesh):
    n_shards = 8
    rows_per = 512
    n = n_shards * rows_per
    emb = np.zeros((n, 64), dtype=np.float32)
    # identical max rows in the first and last shard and one in between
    winners = [7, 3 * rows_per + 2, 7 * rows_per + 11]
    for r in winners:
        emb[r, 0] = 1.0
    q = np.zeros((1, 64), dtype=np.float32)
    q[0, 0] = 1.0
    vals, idxs = multislice_cosine_topk(
        shard_corpus(jnp.asarray(emb), ms_mesh), jnp.asarray(q), n,
        k=3, mesh=ms_mesh)
    np.testing.assert_array_equal(np.asarray(idxs)[0], winners)


def test_multislice_few_valid_rows(rng, ms_mesh):
    n, k = 8 * 512, 10
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    q = rng.standard_normal((1, 64)).astype(np.float32)
    valid = 3  # only the first shard of slice 0 has live rows
    vals, _ = multislice_cosine_topk(shard_corpus(jnp.asarray(emb),
                                                  ms_mesh),
                                     jnp.asarray(q), valid, k=k,
                                     mesh=ms_mesh)
    assert np.isfinite(np.asarray(vals)[0]).sum() == 3


def test_multislice_int8_top1(rng, ms_mesh):
    n = 8 * 512
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    q = emb[1234:1235] + rng.standard_normal((1, 64)).astype(np.float32) \
        * 0.01
    q /= np.linalg.norm(q)
    absmax = np.abs(emb).max(axis=-1, keepdims=True)
    scales = (absmax / 127.0).astype(np.float32)
    codes = np.clip(np.round(emb / scales), -127, 127).astype(np.int8)
    _, idxs = multislice_cosine_topk_int8(
        shard_corpus(jnp.asarray(codes), ms_mesh),
        shard_corpus(jnp.asarray(scales), ms_mesh),
        jnp.asarray(q), n, k=8, mesh=ms_mesh)
    assert int(np.asarray(idxs)[0, 0]) == 1234


def test_device_index_on_multislice_mesh(rng):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    mesh = multislice_corpus_mesh(2, n_devices=8)
    idx = DeviceVideoIndex(dim=64, mesh=mesh)
    ref = DeviceVideoIndex(dim=64)
    emb = rng.standard_normal((500, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for i in range(emb.shape[0]):
        idx.add_frame(emb[i], f"v{i % 7}.mp4", float(i))
        ref.add_frame(emb[i], f"v{i % 7}.mp4", float(i))
    q = emb[123] + 0.01 * rng.standard_normal(64).astype(np.float32)
    got = idx.search(q, k=5)
    want = ref.search(q, k=5)
    assert [r["frame_id"] for r in got] == [r["frame_id"] for r in want]
    np.testing.assert_allclose([r["score"] for r in got],
                               [r["score"] for r in want], rtol=1e-5)


def test_engine_builds_multislice_mesh_from_config(rng, tmp_path):
    """corpus_shards=8 + corpus_slices=2 (VQT_CORPUS_SLICES) gives the
    engine a (dcn, corpus) index mesh; search works end to end."""
    from tests.fake_embedder import FakeEmbedder
    from video_quierer_tpu.engine import EngineConfig, VideoSearchEngine
    from video_quierer_tpu.engine.config import IndexConfig
    cfg = EngineConfig(index=IndexConfig(corpus_shards=8, corpus_slices=2))
    eng = VideoSearchEngine(str(tmp_path), config=cfg,
                            embedder=FakeEmbedder())
    assert set(eng.index.mesh.axis_names) == {DCN_AXIS, CORPUS_AXIS}
    assert eng.index._n_shards == 8
    emb = rng.standard_normal((50, 512)).astype(np.float32)
    for i in range(50):
        eng.index.add_frame(emb[i], "v.mp4", float(i))
    rows = eng.index.search(emb[7], k=3)
    assert rows[0]["frame_id"] == 7


def test_device_index_int8_on_multislice_mesh(rng):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    mesh = multislice_corpus_mesh(2, n_devices=8)
    idx = DeviceVideoIndex(dim=64, device_dtype="int8", mesh=mesh)
    emb = rng.standard_normal((300, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for i in range(emb.shape[0]):
        idx.add_frame(emb[i], "v.mp4", float(i))
    q = emb[42] + 0.005 * rng.standard_normal(64).astype(np.float32)
    got = idx.search(q, k=3)
    assert got[0]["frame_id"] == 42
