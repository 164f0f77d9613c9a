"""Approximate candidate stage (VQT_CANDIDATE_TOPK=approx).

The bf16/int8 index modes fetch CANDIDATES that are exactly re-ranked in
f32 on host; the approx stage swaps the Pallas scan's k-round selection
for one XLA matmul + ``jax.lax.approx_max_k`` (the TPU's hardware
partial-reduce — exact-fallback on CPU). Final results must remain
f32-true, matching the float32 index bit-for-bit on scores/rows.

Capability rebuilt: the candidate/re-rank contract of the reference's
quantized-recall pattern has no direct analog (reference scans f32 only,
video_search_overhaul.py:40-64); this guards our bf16/int8 extension.
"""

import numpy as np
import pytest

from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.ops.topk import (
    candidate_topk,
    candidate_topk_int8,
    cosine_topk,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture
def approx_mode(monkeypatch):
    monkeypatch.setenv("VQT_CANDIDATE_TOPK", "approx")


def _unit_rows(rng, n, d=512):
    e = rng.standard_normal((n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_candidate_topk_defaults_to_exact(rng):
    import jax.numpy as jnp
    emb = _unit_rows(rng, 300)
    q = _unit_rows(rng, 2)
    want = cosine_topk(jnp.asarray(emb), jnp.asarray(q), 300, k=12)
    got = candidate_topk(jnp.asarray(emb), jnp.asarray(q), 300, k=12)
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_candidate_topk_approx_recovers_true_set(rng, approx_mode):
    import jax.numpy as jnp
    emb = _unit_rows(rng, 300)
    q = _unit_rows(rng, 2)
    vals, idxs = candidate_topk(
        jnp.asarray(emb, jnp.bfloat16), jnp.asarray(q), 300, k=40)
    assert idxs.shape == (2, 40)
    # true f32 top-10 must be inside the 40 candidates (CPU fallback is
    # exact; on TPU the recall target + over-fetch gives the same
    # guarantee statistically — the engine-level tests below pin results)
    scores = q @ emb.T
    for b in range(2):
        true10 = set(np.argsort(-scores[b], kind="stable")[:10].tolist())
        assert true10 <= set(np.asarray(idxs[b]).tolist())


def test_candidate_topk_int8_masks_padding(rng, approx_mode):
    import jax.numpy as jnp
    from video_quierer_tpu.ops.quantize import quantize_rows
    emb = _unit_rows(rng, 256)
    codes, scales = quantize_rows(jnp.asarray(emb))
    q = _unit_rows(rng, 1)
    # only the first 100 rows are valid; no candidate may point past them
    _, idxs = candidate_topk_int8(codes, scales, jnp.asarray(q), 100, k=20)
    live = np.asarray(idxs[0])
    assert (live[live < 2**31 - 1] < 100).all()


def test_bf16_approx_results_are_f32_true(rng, approx_mode):
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    emb = _unit_rows(rng, 600)
    # near-ties a bf16 scan alone would misorder
    emb[100] = emb[50] + 1e-5 * emb[51]
    emb[100] /= np.linalg.norm(emb[100])
    for idx in (f32, b16):
        idx.add_batch(emb, "a.mp4", [float(t) for t in range(600)])
    q = emb[50] + 0.01 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=8)
    got = b16.search(q, k=8)
    assert [r["frame_id"] for r in got] == [r["frame_id"] for r in want]
    np.testing.assert_allclose([r["score"] for r in got],
                               [r["score"] for r in want], rtol=1e-6)


def test_int8_approx_top1_matches_f32(rng, approx_mode):
    f32 = DeviceVideoIndex(device_dtype="float32")
    i8 = DeviceVideoIndex(device_dtype="int8")
    emb = _unit_rows(rng, 400)
    for idx in (f32, i8):
        idx.add_batch(emb, "a.mp4", [float(t) for t in range(400)])
    q = emb[123] + 0.05 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=5)
    got = i8.search(q, k=5)
    assert got[0]["frame_id"] == want[0]["frame_id"]
    np.testing.assert_allclose(got[0]["score"], want[0]["score"],
                               rtol=1e-6)


def test_bf16_approx_sharded_matches_f32(rng, approx_mode):
    """Corpus-mesh bf16 index with the approx per-shard candidate stage:
    results still f32-true vs a single-device float32 index."""
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16", mesh=corpus_mesh(8))
    emb = _unit_rows(rng, 700)
    for idx in (f32, b16):
        idx.add_batch(emb, "a.mp4", [float(t) for t in range(700)])
    q = emb[42] + 0.02 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=8)
    got = b16.search(q, k=8)
    assert [r["frame_id"] for r in got] == [r["frame_id"] for r in want]
    np.testing.assert_allclose([r["score"] for r in got],
                               [r["score"] for r in want], rtol=1e-6)


def test_int8_approx_sharded_top1(rng, approx_mode):
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    f32 = DeviceVideoIndex(device_dtype="float32")
    i8 = DeviceVideoIndex(device_dtype="int8", mesh=corpus_mesh(8))
    emb = _unit_rows(rng, 512)
    for idx in (f32, i8):
        idx.add_batch(emb, "a.mp4", [float(t) for t in range(512)])
    q = emb[77] + 0.05 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=5)
    got = i8.search(q, k=5)
    assert got[0]["frame_id"] == want[0]["frame_id"]
    np.testing.assert_allclose(got[0]["score"], want[0]["score"],
                               rtol=1e-6)


def test_int8_native_mxu_contract_results_f32_true(rng, approx_mode,
                                                   monkeypatch):
    """VQT_INT8_MXU=native (the default): the approx scan contracts
    s8×s8→s32 on the MXU — no bf16 upcast of the 1-byte read — and the
    deep fetch + exact f32 re-rank keeps final results f32-true. Both
    contract variants must agree with the f32 index."""
    f32 = DeviceVideoIndex(device_dtype="float32")
    emb = _unit_rows(rng, 480)
    f32.add_batch(emb, "a.mp4", [float(t) for t in range(480)])
    q = emb[200] + 0.03 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=8)
    for contract in ("native", "upcast"):
        monkeypatch.setenv("VQT_INT8_MXU", contract)
        i8 = DeviceVideoIndex(device_dtype="int8")
        i8.add_batch(emb, "a.mp4", [float(t) for t in range(480)])
        got = i8.search(q, k=8)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want], contract
        np.testing.assert_allclose([r["score"] for r in got],
                                   [r["score"] for r in want], rtol=1e-6)


def test_fused_min_b_dispatch_policy(monkeypatch):
    """Measured serving policy (ops/topk.py FUSED_MIN_B): single/small
    queries take the approx scan (its [B, N] score matrix is noise at
    small B and it wins on latency), batched queries the fused in-VMEM
    kernel. Both run over the same permuted mirror, so the recall
    contract is identical either way."""
    from video_quierer_tpu.ops import topk as topk_mod
    # corpus large enough that the bucket-winner list covers the fetch
    # (rounds · n_pad / bucket ≥ 40)
    n_pad = 16 * topk_mod.CAND_BLOCK_ROWS
    monkeypatch.setattr(topk_mod, "FUSED_MIN_B", 8)
    assert not topk_mod._fused_usable(n_pad, 40, 1)
    assert not topk_mod._fused_usable(n_pad, 40, 7)
    assert topk_mod._fused_usable(n_pad, 40, 8)
    assert topk_mod._fused_usable(n_pad, 40, 64)
    # too-small corpora fall back to the approx scan
    assert not topk_mod._fused_usable(topk_mod.CAND_BLOCK_ROWS, 256, 8)


def test_bf16_approx_fused_matches_two_step(rng, approx_mode):
    import jax.numpy as jnp
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    emb = _unit_rows(rng, 512)
    b16.add_batch(emb, "a.mp4", [float(t) for t in range(512)])
    proj = rng.standard_normal((16, 512)).astype(np.float32)

    def encode(params, ids_dev):
        return jnp.take(params, ids_dev % 16, axis=0).mean(axis=1)

    ids = np.asarray(rng.integers(0, 1000, (2, 7)), np.int32)
    fused = b16.search_batch_fused(encode, jnp.asarray(proj), ids, k=6)
    q = np.asarray(encode(jnp.asarray(proj), jnp.asarray(ids)))
    two_step = b16.search_batch(q, k=6)
    for fq, tq in zip(fused, two_step):
        assert [r["frame_id"] for r in fq] == [r["frame_id"] for r in tq]
        np.testing.assert_allclose([r["score"] for r in fq],
                                   [r["score"] for r in tq], rtol=1e-5)


def test_pack_select_matches_iter_select(rng, monkeypatch):
    """The biased pack-key selection ("packb", default), the unbiased
    pack-key selection ("pack") and the two-phase iterative selection
    ("iter") of the fused candidate kernel must recover the same
    candidate sets up to the documented packing resolutions (~1.2e-4 /
    ~5e-4 — far below this corpus's score gaps), and all must contain
    the true f32 top-k. Also exercises the all-dead-bucket path
    (valid < one bucket): "pack"'s floored -inf key must unpack to
    -inf, not NaN, and "packb"'s zero dead-key must emit -inf."""
    import jax.numpy as jnp
    from video_quierer_tpu.ops import topk as T

    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    n_pad = 4 * T.CAND_BLOCK_ROWS
    emb = _unit_rows(rng, n_pad)
    q = _unit_rows(rng, 16)
    valid = n_pad - T.CAND_BUCKET - 3   # leaves a fully-dead tail bucket
    true10 = np.argsort(-(emb[:valid] @ q.T), axis=0)[:10].T

    outs = {}
    for mode in ("packb", "pack", "iter"):
        monkeypatch.setenv("VQT_CAND_SELECT", mode)
        vals, idxs = candidate_topk(
            jnp.asarray(emb, jnp.bfloat16), jnp.asarray(q), valid, k=64)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        assert np.isfinite(vals[vals > -np.inf]).all()
        live = idxs[idxs < 2**31 - 1]
        assert (live < valid).all()
        for b in range(q.shape[0]):
            assert set(true10[b]) <= set(idxs[b].tolist()), mode
        outs[mode] = set(map(tuple, idxs.tolist()))
    assert outs["pack"] == outs["iter"]
    assert outs["packb"] == outs["iter"]


def test_wide_batch_chunks_match_narrow(rng, monkeypatch):
    """Batches wider than VQT_CAND_MAX_B chunk through the fused kernel
    (coalesce_width 512 support): results must equal the per-chunk calls
    exactly, a narrow tail chunk must be handled, and the true top-k
    must be recovered across every chunk."""
    import jax.numpy as jnp
    from video_quierer_tpu.ops import topk as T

    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VQT_CAND_MAX_B", "8")
    n_pad = 2 * T.CAND_BLOCK_ROWS
    emb = _unit_rows(rng, n_pad)
    q = _unit_rows(rng, 20)          # chunks 8 + 8 + 4 (tail < FUSED_MIN_B)
    valid = n_pad - 5
    e16 = jnp.asarray(emb, jnp.bfloat16)
    vals, idxs = candidate_topk(e16, jnp.asarray(q), valid, k=64)
    assert idxs.shape == (20, 64)
    monkeypatch.setenv("VQT_CAND_MAX_B", "256")
    for lo, hi in ((0, 8), (8, 16), (16, 20)):
        v2, i2 = candidate_topk(e16, jnp.asarray(q[lo:hi]), valid, k=64)
        np.testing.assert_array_equal(np.asarray(idxs[lo:hi]),
                                      np.asarray(i2))
    true5 = np.argsort(-(emb[:valid] @ q.T), axis=0, kind="stable")[:5].T
    for b in range(20):
        assert set(true5[b]) <= set(np.asarray(idxs[b]).tolist())
