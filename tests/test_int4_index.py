"""int4 quantized index tier (round-4 VERDICT item 5).

Packed split-halves nibbles (ops/quantize.py:quantize_rows_int4) halve
int8's HBM traffic again; exactness rides the same contract — deep
candidate fetch + exact f32 re-rank. Covers: pack/unpack parity, fused
kernel (interpret) vs approx scan, index-level parity with f32 after
re-rank, streamed device-resident appends, config gating.

Reference contrast: exceeds src/indexes/hnsw.py's approximate recall at
an eighth of the exact scan's traffic.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.ops.quantize import (quantize_rows_int4,
                                            quantize_rows_int4_np,
                                            unpack_int4_np)
from video_quierer_tpu.ops import topk as topk_mod


@pytest.fixture
def rng():
    return np.random.default_rng(4)


def _unit(rng, n):
    e = rng.standard_normal((n, 512)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_pack_roundtrip_and_host_device_parity(rng):
    emb = _unit(rng, 64)
    pd, sd = quantize_rows_int4(jnp.asarray(emb))
    pn, sn = quantize_rows_int4_np(emb)
    np.testing.assert_array_equal(np.asarray(pd), pn)
    np.testing.assert_array_equal(np.asarray(sd), sn)
    assert pn.shape == (64, 256) and pn.dtype == np.int8
    codes = unpack_int4_np(pn)
    assert codes.min() >= -7 and codes.max() <= 7
    recon = codes.astype(np.float32) * sn
    assert np.abs(recon - emb).max() <= sn.max() / 2 + 1e-7


def test_pack_zero_rows():
    p, s = quantize_rows_int4(jnp.zeros((4, 512)))
    assert np.asarray(p).max() == 0 and np.asarray(s).max() == 0


def test_fused_kernel_matches_approx(rng):
    """Interpret-mode fused int4 kernel vs the XLA approx scan: same
    candidates at the top (both feed the exact re-rank)."""
    n = topk_mod.CAND_BLOCK_ROWS * 2
    emb = _unit(rng, n)
    pn, sn = quantize_rows_int4_np(emb)
    q = emb[rng.integers(0, n, 8)] \
        + 1e-3 * rng.standard_normal((8, 512)).astype(np.float32)
    perm = jnp.arange(n, dtype=jnp.int32)
    for native in (True, False):
        vals, idxs = topk_mod._pallas_cand_scan_int4_prefix(
            jnp.asarray(pn), jnp.asarray(sn), perm, jnp.asarray(q),
            jnp.int32(n), fetch=64, rounds=topk_mod.CAND_ROUNDS,
            bucket=topk_mod.CAND_BUCKET, native=native, orient="col",
            interpret=True)
        av, ai = topk_mod._approx_scan_int4(
            jnp.asarray(pn), jnp.asarray(sn), jnp.asarray(q),
            jnp.int32(n), k=64, recall=0.999, native=native, prefix=True)
        assert (np.asarray(idxs)[:, 0] == np.asarray(ai)[:, 0]).all()


def test_int4_index_matches_f32_after_rerank(rng):
    emb = _unit(rng, 3000)
    ts = np.arange(3000, dtype=float)
    f32 = DeviceVideoIndex()
    f32.add_batch(emb, "v.mp4", ts)
    i4 = DeviceVideoIndex(device_dtype="int4")
    i4.add_batch(emb, "v.mp4", ts)
    assert i4._mirror_layout() == "prefix"
    agree = 0
    for t in range(10):
        qv = emb[t * 100] + 0.05 * rng.standard_normal(512).astype(
            np.float32)
        rf = f32.search(qv, k=10)
        ri = i4.search(qv, k=10)
        assert ri[0]["frame_id"] == rf[0]["frame_id"]
        assert abs(ri[0]["score"] - rf[0]["score"]) < 1e-5
        agree += len({r["frame_id"] for r in rf}
                     & {r["frame_id"] for r in ri})
    assert agree / 100 > 0.9  # recall@10 after re-rank (random corpus)


def test_int4_clustered_recall_exact(rng):
    """Clustered corpus (adjacent near-duplicates — real video ingest):
    recall@10 == 1.0 at default engine knobs, the VERDICT done-bar."""
    base = rng.standard_normal((40, 512)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    rows = np.repeat(base, 160, axis=0)
    rows += 0.08 * rng.standard_normal(rows.shape).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=-1, keepdims=True)
    ts = np.arange(len(rows), dtype=float)
    f32 = DeviceVideoIndex()
    f32.add_batch(rows, "v.mp4", ts)
    i4 = DeviceVideoIndex(device_dtype="int4")
    i4.add_batch(rows, "v.mp4", ts)
    hits = total = 0
    for c in range(0, 40, 7):
        qv = rows[c * 160] + 1e-3 * rng.standard_normal(512).astype(
            np.float32)
        rf = {r["frame_id"] for r in f32.search(qv, k=10)}
        ri = {r["frame_id"] for r in i4.search(qv, k=10)}
        hits += len(rf & ri)
        total += len(rf)
    assert hits == total


def test_int4_streamed_device_append_equals_lazy(rng):
    import jax.numpy as jnp
    batches = [_unit(rng, n) for n in (3000, 4000, 3000)]
    streamed = DeviceVideoIndex(device_dtype="int4")
    for i, rows in enumerate(batches):
        streamed.add_batch_device(jnp.asarray(rows), f"v{i}.mp4",
                                  np.arange(len(rows), dtype=float))
    lazy = DeviceVideoIndex(device_dtype="int4")
    for i, rows in enumerate(batches):
        lazy.add_batch(rows, f"v{i}.mp4",
                       np.arange(len(rows), dtype=float))
    assert streamed._device_rows == streamed._count == lazy._count
    # mirror bytes identical to the host-sync expectation
    n = streamed._count
    perm = streamed._perm
    exp_codes, exp_scales = quantize_rows_int4_np(
        streamed._emb[perm[:n]])
    np.testing.assert_array_equal(
        np.asarray(streamed._device_emb)[:n], exp_codes)
    np.testing.assert_array_equal(
        np.asarray(streamed._device_scales)[:n], exp_scales)
    q = _unit(rng, 3)
    ra, rb = streamed.search_batch(q, k=10), lazy.search_batch(q, k=10)
    for a, b in zip(ra, rb):
        assert [x["frame_id"] for x in a] == [x["frame_id"] for x in b]
        for x, y in zip(a, b):
            assert np.isclose(x["score"], y["score"], rtol=1e-6)


def test_int4_rejects_mesh():
    import jax
    from jax.sharding import Mesh
    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("corpus",))
    with pytest.raises(ValueError, match="corpus mesh"):
        DeviceVideoIndex(device_dtype="int4", mesh=mesh)


def test_config_validation():
    from video_quierer_tpu.engine.config import EngineConfig
    cfg = EngineConfig()
    cfg.index.device_dtype = "int4"
    cfg.validate()
    cfg.index.device_dtype = "int3"
    with pytest.raises(ValueError, match="device_dtype"):
        cfg.validate()
    cfg.index.device_dtype = "int4"
    cfg.index.corpus_shards = 4
    with pytest.raises(ValueError, match="single-device"):
        cfg.validate()


def test_int4_fetch_doubles():
    """int4's default candidate fetch is 2x the int8/bf16 fetch
    (measured recall bar — device_index._rerank_fetch)."""
    i8 = DeviceVideoIndex(device_dtype="int8")
    i4 = DeviceVideoIndex(device_dtype="int4")
    assert i4._rerank_fetch(10) == min(2 * i8._rerank_fetch(10), 1024)


def test_int4_fused_at_b1(monkeypatch):
    """int4 routes to the FUSED kernel at every width (min_b=1) even
    when an operator restores the old approx routing for the other
    dtypes (VQT_FUSED_MIN_B=8): its approx path materializes the
    nibble unpack, and the same-window hardware probe read fused 1.71
    vs approx 2.73 ms/q at B=1 (ops/topk.py:_fused_usable)."""
    from video_quierer_tpu.ops import topk as T
    n = T.CAND_BLOCK_ROWS * 64          # clears prefix_fused_ok @ 256
    assert T._fused_usable(n, 256, 1)   # round-4 default: fused at B=1
    monkeypatch.setattr(T, "FUSED_MIN_B", 8)
    assert T._fused_usable(n, 256, 1, min_b=1)   # int4 override
    assert not T._fused_usable(n, 256, 1)        # operator's gate
