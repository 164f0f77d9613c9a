"""Pallas kernel logic tests (interpreter mode on CPU).

The compiled Pallas path only runs on real TPUs; these tests execute the same
kernel through the Pallas interpreter so the block-scan + merge logic is
covered by the CPU suite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_quierer_tpu.ops import topk as topk_mod


@pytest.fixture
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")


def oracle_topk(emb, q, valid, k):
    scores = emb[:valid].astype(np.float32) @ q.astype(np.float32)
    order = np.argsort(-scores, kind="stable")[:k]
    return scores[order], order


@pytest.mark.parametrize("n,valid,b,k", [
    (1024, 900, 1, 5),
    (2048, 2048, 3, 8),
    (512, 2, 2, 5),
])
def test_pallas_block_scan_matches_oracle(rng, pallas_interpret, n, valid,
                                          b, k):
    emb = rng.standard_normal((n, 512), dtype=np.float32)
    q = rng.standard_normal((b, 512), dtype=np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vals, idxs = topk_mod.cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                      valid, k=k)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    for row in range(b):
        ov, oi = oracle_topk(emb, q[row], valid, k)
        got_n = int(np.isfinite(vals[row]).sum())
        assert got_n == min(k, valid)
        np.testing.assert_allclose(vals[row][:got_n], ov, rtol=1e-5,
                                   atol=1e-5)
        sep = np.abs(np.diff(ov)) > 1e-5
        keep = np.concatenate([[True], sep]) & np.concatenate([sep, [True]])
        np.testing.assert_array_equal(idxs[row][:got_n][keep], oi[keep])


def test_pallas_tie_breaking(pallas_interpret):
    emb = np.zeros((1536, 512), dtype=np.float32)
    emb[600] = emb[2] = emb[1100] = 1.0  # ties across blocks
    q = np.full((1, 512), 1.0 / np.sqrt(512), dtype=np.float32)
    _, idxs = topk_mod.cosine_topk(jnp.asarray(emb), jnp.asarray(q), 1536,
                                   k=3)
    np.testing.assert_array_equal(np.asarray(idxs)[0], [2, 600, 1100])


@pytest.mark.parametrize("vpu", [True, False], ids=["vpu", "mxu"])
def test_b1_scoring_engines_agree(rng, pallas_interpret, monkeypatch, vpu):
    """Both single-query scoring engines (VPU multiply+reduce — the
    default — and the MXU matmul behind VQT_SCAN_VPU=0) must match the
    oracle exactly, including tie order."""
    monkeypatch.setattr(topk_mod, "SCAN_VPU_B1", vpu)
    emb = rng.standard_normal((2048, 512), dtype=np.float32)
    emb[77] = emb[1300]  # cross-block tie
    q = rng.standard_normal((1, 512), dtype=np.float32)
    q /= np.linalg.norm(q)
    vals, idxs = topk_mod.cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                      2048, k=7)
    ov, oi = oracle_topk(emb, q[0], 2048, 7)
    np.testing.assert_allclose(np.asarray(vals)[0], ov, rtol=1e-5,
                               atol=1e-5)
    sep = np.abs(np.diff(ov)) > 1e-5
    keep = np.concatenate([[True], sep]) & np.concatenate([sep, [True]])
    np.testing.assert_array_equal(np.asarray(idxs)[0][keep], oi[keep])


# ---------------------------------------------------------------------------
# Deferred macro-block selection (scores stashed across SELECT_BLOCKS grid
# steps, one k-round selection per macro-block — ops/topk.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,valid,b,k,s", [
    (10240, 10240, 1, 7, 8),    # partial last macro (10 blocks, s=8)
    (10240, 9000, 1, 7, 3),     # macros of 3,3,3,1 + tail masking
    (8192, 8192, 4, 5, 4),      # batched, exact macro split
    (5120, 4100, 16, 9, 8),     # batched, single partial macro path
])
def test_deferred_selection_matches_oracle(rng, pallas_interpret,
                                           monkeypatch, n, valid, b, k, s):
    monkeypatch.setattr(topk_mod, "SELECT_BLOCKS", s)
    topk_mod._pallas_block_scan.clear_cache()
    emb = rng.standard_normal((n, 512), dtype=np.float32)
    q = rng.standard_normal((b, 512), dtype=np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vals, idxs = topk_mod.cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                      valid, k=k)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    for row in range(b):
        ov, oi = oracle_topk(emb, q[row], valid, k)
        np.testing.assert_allclose(vals[row], ov, rtol=1e-5, atol=1e-5)
        sep = np.abs(np.diff(ov)) > 1e-5
        keep = np.concatenate([[True], sep]) & np.concatenate([sep, [True]])
        np.testing.assert_array_equal(idxs[row][keep], oi[keep])


def test_deferred_selection_stale_slots_masked(pallas_interpret,
                                               monkeypatch):
    """The last (partial) macro reuses scratch slots still holding the
    previous macro's scores; a huge score planted there must NOT leak."""
    monkeypatch.setattr(topk_mod, "SELECT_BLOCKS", 4)
    topk_mod._pallas_block_scan.clear_cache()
    n = 5 * 1024  # 5 blocks -> macros of 4 + 1; slots 1..3 stale in macro 2
    emb = np.zeros((n, 512), dtype=np.float32)
    emb[1024 + 7] = 5.0     # lands in scratch slot 1 of macro 0
    emb[4096 + 3] = 1.0     # the only live row of macro 1 (slot 0)
    q = np.zeros((1, 512), dtype=np.float32)
    q[0, 0] = 1.0
    vals, idxs = topk_mod.cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                      n, k=2)
    np.testing.assert_array_equal(np.asarray(idxs)[0], [1024 + 7, 4096 + 3])
    np.testing.assert_allclose(np.asarray(vals)[0], [5.0, 1.0], rtol=1e-6)


def test_deferred_tie_break_across_macros(pallas_interpret, monkeypatch):
    monkeypatch.setattr(topk_mod, "SELECT_BLOCKS", 2)
    topk_mod._pallas_block_scan.clear_cache()
    n = 6 * 1024
    emb = np.zeros((n, 512), dtype=np.float32)
    for r in (5000, 17, 3000):  # ties spanning macro boundaries
        emb[r] = 1.0
    q = np.full((1, 512), 1.0 / np.sqrt(512), dtype=np.float32)
    _, idxs = topk_mod.cosine_topk(jnp.asarray(emb), jnp.asarray(q), n, k=3)
    np.testing.assert_array_equal(np.asarray(idxs)[0], [17, 3000, 5000])


@pytest.mark.parametrize("layout", ["flat", "rows"])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_b1_layouts_agree_quantized(rng, pallas_interpret, monkeypatch,
                                    dtype, layout):
    """The B=1 scan must rank correctly under BOTH scratch layouts for the
    quantized dtypes (VQT_SCAN_B1_LAYOUT — the rows/MXU layout avoids the
    flat path's in-kernel upcast; auto picks per dtype from hardware A/B)."""
    from video_quierer_tpu.ops.quantize import quantize_rows
    monkeypatch.setattr(topk_mod, "_SCAN_B1_LAYOUT", layout)
    topk_mod._pallas_block_scan.clear_cache()
    topk_mod._pallas_block_scan_int8.clear_cache()
    n, valid, k = 3 * 1024, 2900, 6
    emb = rng.standard_normal((n, 512), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    q = rng.standard_normal((1, 512), dtype=np.float32)
    q /= np.linalg.norm(q)
    if dtype == "int8":
        codes, scales = quantize_rows(jnp.asarray(emb))
        vals, idxs = topk_mod.cosine_topk_int8(
            codes, scales, jnp.asarray(q), valid, k=k)
    else:
        vals, idxs = topk_mod.cosine_topk(
            jnp.asarray(emb, dtype=jnp.bfloat16), jnp.asarray(q), valid,
            k=k)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    ov, oi = oracle_topk(emb, q[0], valid, 3 * k)
    # quantized scores carry ~1e-2 error; candidates must come from the
    # oracle's over-fetched set with close scores
    assert set(idxs[0]) <= set(oi)
    np.testing.assert_allclose(vals[0], ov[:k], atol=3e-2)
    topk_mod._pallas_block_scan.clear_cache()
    topk_mod._pallas_block_scan_int8.clear_cache()


def test_deferred_selection_int8(rng, pallas_interpret, monkeypatch):
    from video_quierer_tpu.ops.quantize import quantize_rows
    monkeypatch.setattr(topk_mod, "SELECT_BLOCKS", 3)
    topk_mod._pallas_block_scan_int8.clear_cache()
    n, valid, k = 7 * 1024, 6500, 6
    emb = rng.standard_normal((n, 512), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for b in (1, 4):
        q = rng.standard_normal((b, 512), dtype=np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        codes, scales = quantize_rows(jnp.asarray(emb))
        vals, idxs = topk_mod.cosine_topk_int8(
            codes, scales, jnp.asarray(q), valid, k=k)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        for row in range(b):
            ov, oi = oracle_topk(emb, q[row], valid, 3 * k)
            # int8 carries ~1e-2 quantization error; top candidates must
            # come from the oracle's over-fetched set with close scores
            assert set(idxs[row]) <= set(oi)
            np.testing.assert_allclose(vals[row], ov[:k], atol=3e-2)


def test_packb2_two_level_matches_packb(rng, monkeypatch):
    """Two-level 'packb2' selection (round-4 VERDICT item 1) against
    'packb' on the same corpus: identical top-1, full top-10 overlap,
    no dead rows emitted, matching scores on shared candidates. Both
    modes feed the exact f32 re-rank, so near-tie order may differ at
    the packing resolution — the sets are what matters."""
    import os
    import jax.numpy as jnp
    from video_quierer_tpu.ops import topk as T
    n = T.CAND_BLOCK_ROWS * 2
    emb = rng.standard_normal((n, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    e16 = jnp.asarray(emb, jnp.bfloat16)
    q = emb[rng.integers(0, n - 200, 8)] \
        + 1e-3 * rng.standard_normal((8, 512)).astype(np.float32)
    perm = jnp.arange(n, dtype=jnp.int32)
    outs = {}
    for mode in ("packb", "packb2"):
        monkeypatch.setenv("VQT_CAND_SELECT", mode)
        vals, idxs = T._pallas_cand_scan_prefix(
            e16, perm, jnp.asarray(q), jnp.int32(n - 100), fetch=64,
            rounds=T.CAND_ROUNDS, bucket=T.CAND_BUCKET, orient="col",
            interpret=True)
        outs[mode] = (np.asarray(vals), np.asarray(idxs))
    (va, ia), (vb, ib) = outs["packb"], outs["packb2"]
    assert (ia[:, 0] == ib[:, 0]).all()
    for i in range(8):
        assert ib[i][np.isfinite(vb[i])].max() < n - 100  # liveness
        sa = set(ia[i, :10].tolist())
        sb = set(ib[i, :10].tolist())
        assert len(sa & sb) == 10
        # shared live candidates score identically (same floor map)
        da = dict(zip(ia[i].tolist(), va[i].tolist()))
        for cid, v in zip(ib[i].tolist(), vb[i].tolist()):
            if cid in da and np.isfinite(v):
                assert abs(da[cid] - v) < 1e-6


def test_packb2_int8_int4_kernels(rng, monkeypatch):
    """packb2 through the int8 (col) and int4 prefix kernels."""
    import jax.numpy as jnp
    from video_quierer_tpu.ops import topk as T
    from video_quierer_tpu.ops.quantize import (quantize_rows_int4_np)
    n = T.CAND_BLOCK_ROWS
    emb = rng.standard_normal((n, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    absmax = np.abs(emb).max(axis=-1, keepdims=True)
    scales = absmax * np.float32(1.0 / 127.0)
    codes = np.clip(np.round(emb / scales), -127, 127).astype(np.int8)
    p4, s4 = quantize_rows_int4_np(emb)
    q = emb[rng.integers(0, n, 8)] \
        + 1e-3 * rng.standard_normal((8, 512)).astype(np.float32)
    perm = jnp.arange(n, dtype=jnp.int32)
    monkeypatch.setenv("VQT_CAND_SELECT", "packb2")
    _, i8 = T._pallas_cand_scan_int8_prefix(
        jnp.asarray(codes), jnp.asarray(scales), perm, jnp.asarray(q),
        jnp.int32(n), fetch=64, rounds=T.CAND_ROUNDS,
        bucket=T.CAND_BUCKET, native=True, orient="col", interpret=True)
    _, i4 = T._pallas_cand_scan_int4_prefix(
        jnp.asarray(p4), jnp.asarray(s4), perm, jnp.asarray(q),
        jnp.int32(n), fetch=64, rounds=T.CAND_ROUNDS,
        bucket=T.CAND_BUCKET, native=True, orient="col", interpret=True)
    truth = np.argmax(emb @ q.T, axis=0)
    assert (np.asarray(i8)[:, 0] == truth).all()
    assert (np.asarray(i4)[:, 0] == truth).all()
