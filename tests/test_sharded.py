"""Sharded corpus scan: exact parity with the single-device scan on an
8-virtual-device CPU mesh (SURVEY.md §4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_quierer_tpu.index.sharded import shard_corpus, sharded_cosine_topk
from video_quierer_tpu.ops.topk import cosine_topk
from video_quierer_tpu.parallel.mesh import corpus_mesh


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return corpus_mesh(8)


def test_sharded_matches_single_device(rng, mesh):
    n, b, k = 8 * 2048, 4, 10
    emb = rng.standard_normal((n, 512)).astype(np.float32)
    valid = n - 321
    q = rng.standard_normal((b, 512)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    ref_vals, ref_idxs = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                     valid, k=k)
    emb_sharded = shard_corpus(jnp.asarray(emb), mesh)
    vals, idxs = sharded_cosine_topk(emb_sharded, jnp.asarray(q), valid,
                                     k=k, mesh=mesh)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_idxs))


def test_sharded_tie_break_across_shards(mesh):
    n = 8 * 512
    emb = np.zeros((n, 512), dtype=np.float32)
    # identical max rows on shards 0, 3, 7
    for r in (5, 3 * 512 + 1, 7 * 512 + 9):
        emb[r, 0] = 1.0
    q = np.zeros((1, 512), dtype=np.float32)
    q[0, 0] = 1.0
    emb_sharded = shard_corpus(jnp.asarray(emb), mesh)
    vals, idxs = sharded_cosine_topk(emb_sharded, jnp.asarray(q), n,
                                     k=3, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(idxs)[0],
                                  [5, 3 * 512 + 1, 7 * 512 + 9])


def test_sharded_few_valid_rows(rng, mesh):
    n, k = 8 * 512, 10
    emb = rng.standard_normal((n, 512)).astype(np.float32)
    q = rng.standard_normal((1, 512)).astype(np.float32)
    valid = 4  # only shard 0 has live rows
    vals, idxs = sharded_cosine_topk(shard_corpus(jnp.asarray(emb), mesh),
                                     jnp.asarray(q), valid, k=k, mesh=mesh)
    vals = np.asarray(vals)[0]
    assert np.isfinite(vals).sum() == 4
    assert np.all(np.asarray(idxs)[0][:4] < 4)
