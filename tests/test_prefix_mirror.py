"""Live-PREFIX mirror layout (round 3).

Single-device quantized mirrors keep their live rows in a uniformly
shuffled PREFIX of the device buffer (incremental Fisher–Yates on
append — index/device_index.py:_extend_perm_to), so the candidate
kernels mask dead rows by pure position iota and never read the perm
column in-kernel (ops/topk.py prefix kernels; the col-major matmul
orientation this unlocks measured ~6-11% faster than row-major on v5e,
ROADMAP round-3 probe). The permutation property itself is what keeps
ADJACENT host rows (near-duplicate frames) spread across selection
buckets — same recall contract as the fixed-perm mesh layout
(tests/test_permuted_mirror.py).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.ops import topk as topk_mod


@pytest.fixture
def rng():
    return np.random.default_rng(23)


@pytest.fixture
def fused_interpret(monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("VQT_CANDIDATE_TOPK", raising=False)
    monkeypatch.setattr(topk_mod, "CAND_BUCKET", 128)
    monkeypatch.setattr(topk_mod, "FUSED_MIN_B", 1)


def _rows(rng, n, d=512):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_fy_extension_keeps_uniform_prefix_invariants(rng):
    """After any append history the arrangement must satisfy: positions
    [0, count) hold a permutation of host rows [0, count); inv_perm is
    the exact inverse; positions >= count stay identity (dead)."""
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    cap = idx._emb.shape[0]
    total = 0
    for size in (1, 7, 300, 50, 1000):
        idx._ensure_capacity(total + size)
        cap = idx._emb.shape[0]
        total += size
        changed = idx._extend_perm_to(total, cap)
        perm = idx._perm
        assert sorted(perm[:total].tolist()) == list(range(total))
        assert (perm[total:] == np.arange(total, cap)).all()
        assert (idx._inv_perm[perm] == np.arange(cap)).all()
        if changed is not None:
            assert changed.shape[0] <= 2 * size
            assert (changed < total).all()


def test_fy_prefix_is_actually_shuffled(rng):
    """Statistical sanity: an appended contiguous run must not stay
    contiguous in mirror space (the whole point of the layout). With
    2048 live rows in a 4096-capacity prefix, the mean |position
    difference| of adjacent host rows is ~count/3; a layout bug that
    kept them adjacent would give ~1."""
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    for lo in range(0, 2048, 256):   # many small batches — FY path
        idx._extend_perm_to(lo + 256, idx._emb.shape[0])
    pos = idx._inv_perm[np.arange(2048)]
    gaps = np.abs(np.diff(pos.astype(np.int64)))
    assert gaps.mean() > 2048 / 6


def test_incremental_append_device_state_matches_rebuild(rng,
                                                         fused_interpret):
    """The scattered device mirror + perm column after staged appends
    must equal a from-scratch placement of the same arrangement."""
    corpus = _rows(rng, 3000)
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    lo = 0
    for size in (500, 40, 1200, 1260):
        idx.add_batch(corpus[lo:lo + size], "a.mp4",
                      [float(t) for t in range(lo, lo + size)])
        lo += size
        idx._sync_device()
        perm = idx._perm
        want = corpus[perm[:lo]].astype(jnp.bfloat16)
        got = np.asarray(idx._device_emb)[:lo]
        assert (got == want).all(), f"mirror rows diverged at {lo}"
        assert (np.asarray(idx._perm_dev) == perm).all()


def test_incremental_append_int8_matches_rebuild(rng, fused_interpret):
    """int8 twin: codes, scales and perm column all scatter-correct."""
    corpus = _rows(rng, 2600)
    inc = DeviceVideoIndex(device_dtype="int8")
    fresh = DeviceVideoIndex(device_dtype="int8")
    lo = 0
    for size in (700, 300, 1600):
        inc.add_batch(corpus[lo:lo + size], "a.mp4",
                      [float(t) for t in range(lo, lo + size)])
        lo += size
        inc._sync_device_int8()
    fresh.add_batch(corpus, "a.mp4", [float(t) for t in range(lo)])
    fresh._sync_device_int8()
    # arrangements differ (different append histories) — compare in
    # HOST row space through each index's own perm
    inv_inc = inc._inv_perm[:lo]
    inv_fr = fresh._inv_perm[:lo]
    codes_inc = np.asarray(inc._device_emb)[inv_inc]
    codes_fr = np.asarray(fresh._device_emb)[inv_fr]
    assert (codes_inc == codes_fr).all()
    np.testing.assert_allclose(np.asarray(inc._device_scales)[inv_inc],
                               np.asarray(fresh._device_scales)[inv_fr])
    assert (np.asarray(inc._perm_dev)[inv_inc] == np.arange(lo)).all()


@pytest.mark.parametrize("orient", ["col", "row"])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_orientation_parity(rng, fused_interpret, monkeypatch, orient,
                            dtype):
    """Col- and row-major prefix kernels must produce identical final
    results (they select the same per-bucket winners; only the matmul
    orientation and winner-block layout differ)."""
    monkeypatch.setenv("VQT_CAND_ORIENT", orient)
    corpus = _rows(rng, 4096)
    f32 = DeviceVideoIndex(device_dtype="float32")
    qidx = DeviceVideoIndex(device_dtype=dtype)
    for idx in (f32, qidx):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    q = np.stack([corpus[37] + 1e-3 * rng.standard_normal(512)
                  .astype(np.float32),
                  corpus[2222] + 1e-3 * rng.standard_normal(512)
                  .astype(np.float32)])
    want = f32.search_batch(q, k=8)
    got = qidx.search_batch(q, k=8)
    for w, g in zip(want, got):
        assert [r["frame_id"] for r in g] == [r["frame_id"] for r in w]
        np.testing.assert_allclose([r["score"] for r in g],
                                   [r["score"] for r in w], rtol=1e-6)


def test_prefix_clustered_recall_fused(rng, fused_interpret, monkeypatch):
    """The permuted-mirror recall bar holds under the prefix layout with
    the fused col-major kernel: clustered corpus, recall@10 == 1.000,
    f32-true scores (the live-prefix arrangement is a uniform
    permutation, so the bucket-collision maths of
    tests/test_permuted_mirror.py transfers unchanged)."""
    monkeypatch.setattr(topk_mod, "CAND_ROUNDS", 3)
    base = _rows(rng, 100)
    corpus = np.repeat(base, 160, axis=0)
    corpus += 0.08 * rng.standard_normal(corpus.shape).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    for idx in (f32, b16):
        idx.add_batch(corpus, "a.mp4",
                      [float(t) for t in range(len(corpus))])
    assert b16._mirror_layout() == "prefix"
    b16._sync_device()
    assert b16._mirror_layout_cur == "prefix"
    for c in range(0, 100, 29):
        q = corpus[c * 160] + 1e-4 * rng.standard_normal(512).astype(
            np.float32)
        want = f32.search(q, k=10)
        got = b16.search(q, k=10)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want]


def test_mesh_keeps_fixed_perm_layout(rng):
    """Corpus meshes must stay on the fixed full-capacity permutation
    (live rows spread across shards at any fill level — a live PREFIX
    would pile them onto the first shards)."""
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    mesh = corpus_mesh()
    idx = DeviceVideoIndex(device_dtype="bfloat16", mesh=mesh)
    assert idx._mirror_layout() == "perm"


def test_tiny_live_count_never_returns_short_results(rng, fused_interpret,
                                                     monkeypatch):
    """A prefix mirror concentrates live rows in the FIRST buckets, so
    on a small-count/large-capacity index the fused kernel's live winner
    list (rounds·ceil(count/bucket)) can be smaller than k — the gate
    (ops/topk.py:prefix_fused_ok) must route such dispatches to the
    approx scan so results are never short of min(k, count)."""
    from video_quierer_tpu.ops.topk import prefix_fused_ok
    assert not prefix_fused_ok(100, 128)        # 2 winners < 100
    assert prefix_fused_ok(100 * topk_mod.CAND_BUCKET, 128)
    corpus = _rows(rng, 100)
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    idx.add_batch(corpus, "a.mp4", [float(t) for t in range(100)])
    got = idx.search(corpus[7], k=10)
    assert len(got) == 10
    assert got[0]["frame_id"] == 7
