"""Unit tests for the fused cosine top-k scan vs a NumPy oracle.

Oracle semantics: descending-stable — score descending, ties by lowest index
(see ops/topk.py docstring for the relationship to the reference's
``np.argsort(sims)[::-1][:k]``, video_search_overhaul.py:56).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from video_quierer_tpu.ops.topk import MAX_K, cosine_topk, merge_topk


def oracle_topk(emb, q, valid, k):
    scores = emb[:valid].astype(np.float32) @ q.astype(np.float32)
    order = np.argsort(-scores, kind="stable")[:k]
    return scores[order], order


@pytest.mark.parametrize("n,valid,b,k", [
    (1024, 1000, 1, 5),
    (1024, 1024, 4, 10),
    (4096, 3000, 2, 50),
    (512, 3, 1, 5),      # fewer valid rows than k
    (2048, 2048, 8, 1),
])
def test_matches_oracle(rng, n, valid, b, k):
    emb = rng.standard_normal((n, 512), dtype=np.float32)
    q = rng.standard_normal((b, 512), dtype=np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vals, idxs = cosine_topk(jnp.asarray(emb), jnp.asarray(q), valid, k=k)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    for row in range(b):
        ov, oi = oracle_topk(emb, q[row], valid, k)
        got_n = int(np.isfinite(vals[row]).sum())
        assert got_n == min(k, valid)
        np.testing.assert_allclose(vals[row][:got_n], ov, rtol=1e-5,
                                   atol=1e-5)
        # indices must match exactly where scores are well separated
        sep = np.abs(np.diff(ov)) > 1e-5
        keep = np.concatenate([[True], sep]) & np.concatenate([sep, [True]])
        np.testing.assert_array_equal(idxs[row][:got_n][keep], oi[keep])


def test_tie_breaking_lowest_index_first():
    emb = np.zeros((1024, 512), dtype=np.float32)
    # identical rows → identical scores; expect ascending indices
    emb[10] = emb[700] = emb[400] = 1.0
    q = np.zeros(512, dtype=np.float32)
    q[:] = 1.0 / np.sqrt(512)
    vals, idxs = cosine_topk(jnp.asarray(emb), jnp.asarray(q), 1024, k=3)
    np.testing.assert_array_equal(np.asarray(idxs), [10, 400, 700])
    assert np.allclose(np.asarray(vals), vals[0])


def test_single_query_vector_shape(rng):
    emb = rng.standard_normal((512, 512), dtype=np.float32)
    q = rng.standard_normal(512, dtype=np.float32)
    vals, idxs = cosine_topk(jnp.asarray(emb), jnp.asarray(q), 512, k=7)
    assert vals.shape == (7,) and idxs.shape == (7,)


def test_k_bounds():
    emb = np.zeros((512, 512), dtype=np.float32)
    q = np.zeros(512, dtype=np.float32)
    with pytest.raises(ValueError):
        cosine_topk(jnp.asarray(emb), jnp.asarray(q), 1, k=0)
    with pytest.raises(ValueError):
        cosine_topk(jnp.asarray(emb), jnp.asarray(q), 1, k=MAX_K + 1)


def test_merge_topk_stability():
    vals = jnp.asarray([[1.0, 0.5, 1.0, 0.25]])
    idxs = jnp.asarray([[3, 9, 7, 1]], dtype=np.int32)
    mv, mi = merge_topk(vals, idxs, k=3)
    np.testing.assert_array_equal(np.asarray(mi)[0], [3, 7, 9])
    np.testing.assert_allclose(np.asarray(mv)[0], [1.0, 1.0, 0.5])
