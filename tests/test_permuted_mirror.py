"""Permuted device mirror + fused in-VMEM candidate stage (round 3).

The bf16/int8 mirrors are stored under a fixed pseudo-random row
permutation (index/device_index.py) so the bucketed candidate stages
(ops/topk.py: fused Pallas kernel, hardware ApproxTopK) cannot lose
near-ties of ADJACENT host rows — the adversarial case for video
corpora, where near-duplicate frames are appended contiguously. This
closes the reference-exactness gap structurally (the reference's scan is
exact, video_search_overhaul.py:40-64) instead of via recall knobs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.ops import topk as topk_mod


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.fixture
def fused_interpret(monkeypatch):
    """Default candidate mode with the fused Pallas kernel interpreted on
    CPU, shrunk to test-scale shapes (bucket 128 so small corpora clear
    the fused-usability bar)."""
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("VQT_CANDIDATE_TOPK", raising=False)
    monkeypatch.setattr(topk_mod, "CAND_BUCKET", 128)
    # serving policy routes B < FUSED_MIN_B to the approx scan; these
    # tests pin the FUSED kernel, so engage it at any batch size
    monkeypatch.setattr(topk_mod, "FUSED_MIN_B", 1)


def _clustered_corpus(rng, n_clusters=40, per_cluster=160, d=512,
                      noise=0.08):
    """Similar frames appended ADJACENTLY, like real video ingest: each
    cluster is one base direction + noise, so a query near a cluster has
    its entire true top-k inside one contiguous row range — the exact
    case contiguous-bucket selection loses without the mirror
    permutation. The default noise keeps within-cluster score gaps well
    above bf16 resolution: candidate RANKING must work; ordering ties
    finer than the mirror dtype are a separate, documented contract
    (bf16 mode is f32-true whenever the true top-k survive the
    candidate pre-filter)."""
    base = rng.standard_normal((n_clusters, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    rows = np.repeat(base, per_cluster, axis=0)
    rows += noise * rng.standard_normal(rows.shape).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=-1, keepdims=True)
    return rows


def test_clustered_recall_is_exact_at_default_knobs(rng, fused_interpret,
                                                    monkeypatch):
    """VERDICT r2 item 4 'done' bar: recall@10 == 1.000 on a clustered
    corpus with the FUSED kernel genuinely engaged, no VQT_APPROX_RECALL
    escape hatch; bf16 results f32-true.

    Toy-scale note: the miss probability for the true rank-r row is
    ((r-1)·bucket/N)^rounds. Production (N=2M, bucket=256, rounds=2)
    sits at ~1e-6; this 16k-row corpus only reaches that regime with
    rounds=3, so the test pins rounds — the maths, not the default knob
    values, is what transfers."""
    monkeypatch.setattr(topk_mod, "CAND_ROUNDS", 3)
    corpus = _clustered_corpus(rng, n_clusters=100)  # 16k rows
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    for idx in (f32, b16):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    assert b16._mirror_permuted()
    assert topk_mod._fused_usable(b16._emb.shape[0], b16._rerank_fetch(10), 1)
    for c in range(0, 100, 17):
        q = corpus[c * 160] + 1e-4 * rng.standard_normal(512).astype(
            np.float32)
        want = f32.search(q, k=10)
        got = b16.search(q, k=10)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want]
        np.testing.assert_allclose([r["score"] for r in got],
                                   [r["score"] for r in want], rtol=1e-6)


def test_identity_layout_would_miss(rng, fused_interpret, monkeypatch):
    """Negative control: the SAME clustered corpus scanned through the
    fused kernel WITHOUT the mirror permutation loses true top-k rows —
    proof the permutation is the load-bearing part of the fix."""
    monkeypatch.setattr(topk_mod, "CAND_ROUNDS", 3)
    corpus = _clustered_corpus(rng, n_clusters=100)
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    monkeypatch.setattr(DeviceVideoIndex, "_mirror_permuted",
                        lambda self: False)
    for idx in (f32, b16):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    assert b16._mirror_layout_cur == "id"
    missed = 0
    for c in range(0, 100, 17):
        q = corpus[c * 160] + 1e-4 * rng.standard_normal(512).astype(
            np.float32)
        want = {r["frame_id"] for r in f32.search(q, k=10)}
        got = {r["frame_id"] for r in b16.search(q, k=10)}
        missed += len(want - got)
    # a 160-row cluster spans ~2 contiguous buckets × 3 rounds ≈ 6
    # candidates — most of every query's true top-10 must be lost
    assert missed >= 10


def test_clustered_recall_int8_native(rng, fused_interpret, monkeypatch):
    """Same bar for the int8 mirror with the native int8 MXU contract."""
    monkeypatch.setenv("VQT_INT8_MXU", "native")
    monkeypatch.setattr(topk_mod, "CAND_ROUNDS", 3)
    corpus = _clustered_corpus(rng, n_clusters=100)
    f32 = DeviceVideoIndex(device_dtype="float32")
    i8 = DeviceVideoIndex(device_dtype="int8")
    for idx in (f32, i8):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    for c in (0, 41, 93):
        q = corpus[c * 160] + 1e-4 * rng.standard_normal(512).astype(
            np.float32)
        want = f32.search(q, k=10)
        got = i8.search(q, k=10)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want]
        np.testing.assert_allclose([r["score"] for r in got],
                                   [r["score"] for r in want], rtol=1e-6)


def test_scatter_append_matches_full_upload(rng, fused_interpret):
    """Incremental appends scatter through the inverse permutation; the
    mirror must stay equivalent to a from-scratch build at every stage,
    including across a capacity regrow (which re-derives the permutation
    for the new capacity)."""
    corpus = _clustered_corpus(rng, n_clusters=40)  # 6400 > _CHUNK
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    lo = 0
    for size in (100, 900, 3000, 2400):  # crosses the 4096 capacity edge
        batch = corpus[lo:lo + size]
        ts = [float(t) for t in range(lo, lo + size)]
        f32.add_batch(batch, "a.mp4", ts)
        b16.add_batch(batch, "a.mp4", ts)
        lo += size
        q = corpus[max(0, lo - 50)] + 1e-4 * rng.standard_normal(
            512).astype(np.float32)
        want = f32.search(q, k=8)
        got = b16.search(q, k=8)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want], f"after {lo} rows"


def test_remove_video_keeps_permuted_mirror_consistent(rng,
                                                       fused_interpret):
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    a = _clustered_corpus(rng, n_clusters=10)
    b = _clustered_corpus(np.random.default_rng(5), n_clusters=10)
    for idx in (f32, b16):
        idx.add_batch(a, "a.mp4", [float(t) for t in range(len(a))])
        idx.add_batch(b, "b.mp4", [float(t) for t in range(len(b))])
        idx.remove_video("a.mp4")
    q = b[400] + 1e-4 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=6)
    got = b16.search(q, k=6)
    assert [r["frame_id"] for r in got] == [r["frame_id"] for r in want]
    assert all(r["video_name"] == "b.mp4" for r in got)


def test_candidate_mode_switch_relays_mirror(rng, fused_interpret,
                                             monkeypatch):
    """Flipping VQT_CANDIDATE_TOPK to the exact escape hatch after a
    permuted sync must re-place the mirror in identity layout (and
    back), never scan a permuted mirror with the identity-layout
    kernel."""
    corpus = rng.standard_normal((2048, 512)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    for idx in (f32, b16):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    q = corpus[300] + 1e-2 * rng.standard_normal(512).astype(np.float32)
    want = [r["frame_id"] for r in f32.search(q, k=6)]
    assert [r["frame_id"] for r in b16.search(q, k=6)] == want
    assert b16._mirror_layout_cur == "prefix"
    monkeypatch.setenv("VQT_CANDIDATE_TOPK", "pallas")
    assert [r["frame_id"] for r in b16.search(q, k=6)] == want
    assert b16._mirror_layout_cur == "id"
    monkeypatch.delenv("VQT_CANDIDATE_TOPK")
    assert [r["frame_id"] for r in b16.search(q, k=6)] == want
    assert b16._mirror_layout_cur == "prefix"


def test_sharded_fused_candidate_stage(rng, fused_interpret, monkeypatch):
    """Corpus-mesh bf16 index with the fused Pallas candidate stage
    running INSIDE shard_map (per-shard kernel + ICI merge), permuted
    mirror sharded alongside."""
    monkeypatch.setenv("VQT_RERANK_FETCH", "32")
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    # unclustered corpus: this test pins the MECHANISM (per-shard fused
    # kernel, sharded perm column, host-id merge) — the adversarial
    # clustered-recall maths lives in the single-device test above,
    # where the bucket/corpus ratio can be made realistic
    corpus = rng.standard_normal((8320, 512)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16", mesh=corpus_mesh(8))
    for idx in (f32, b16):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    shard_rows = b16._emb.shape[0] // 8
    assert topk_mod._fused_usable(shard_rows, 32, 1)
    for c in (333, 7777):
        q = corpus[c] + 1e-2 * rng.standard_normal(512).astype(np.float32)
        want = f32.search(q, k=8)
        got = b16.search(q, k=8)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want]


def test_fused_kernel_flat_and_rows_match_oracle(rng, fused_interpret):
    """Direct kernel check, both layouts (B=1 flat VPU scoring and
    batched MXU), against a NumPy oracle on a permuted mirror."""
    n, d = 4096, 512
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    perm = np.random.default_rng(3).permutation(n).astype(np.int32)
    mirror = emb[perm]
    valid = 3500
    for b in (1, 5):
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        queries = q[0] if b == 1 else q
        vals, idxs = topk_mod.candidate_topk(
            jnp.asarray(mirror, jnp.bfloat16), jnp.asarray(queries),
            valid, k=16, perm=jnp.asarray(perm))
        vals = np.atleast_2d(np.asarray(vals))
        idxs = np.atleast_2d(np.asarray(idxs))
        scores = q @ emb[:valid].T
        for row in range(b):
            live = idxs[row][np.isfinite(vals[row])]
            assert (live < valid).all()
            true6 = set(np.argsort(-scores[row])[:6].tolist())
            assert true6 <= set(live.tolist())


def test_fused_usability_fallback(rng, monkeypatch):
    """Tiny corpora (bucket-winner list shallower than the fetch) must
    fall back to the approx scan — and still honor the permutation."""
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("VQT_CANDIDATE_TOPK", raising=False)
    n = 1024
    monkeypatch.setattr(topk_mod, "FUSED_MIN_B", 1)
    assert not topk_mod._fused_usable(n, 256, 1)
    emb = rng.standard_normal((n, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    perm = np.random.default_rng(4).permutation(n).astype(np.int32)
    q = emb[77] + 1e-3 * rng.standard_normal(512).astype(np.float32)
    vals, idxs = topk_mod.candidate_topk(
        jnp.asarray(emb[perm], jnp.bfloat16), jnp.asarray(q), n, k=256,
        perm=jnp.asarray(perm))
    assert int(np.asarray(idxs)[0]) == 77
