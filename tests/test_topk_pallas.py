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
