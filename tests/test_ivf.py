"""IVF index tests: k-means sanity, probed-exactness, recall vs the exact
scan, clustered-data behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_quierer_tpu.index.ivf import IVFIndex, _kmeans
from video_quierer_tpu.ops.topk import cosine_topk


def _unit(rng, n, d=512):
    e = rng.standard_normal((n, d)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def _clustered(rng, n_clusters=16, per=200, d=512, spread=0.15):
    centers = _unit(rng, n_clusters, d)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + spread * rng.standard_normal(
            (per, d)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=-1, keepdims=True))
    return np.concatenate(rows), centers


def test_kmeans_separates_clusters(rng):
    emb, centers = _clustered(rng, n_clusters=8, per=100)
    centroids, assign = _kmeans(jnp.asarray(emb), jnp.int32(0),
                                n_clusters=8, iters=10)
    assign = np.asarray(assign)
    # points of the same generating cluster should mostly share a label
    purity = 0
    for c in range(8):
        labels = assign[c * 100: (c + 1) * 100]
        purity += np.bincount(labels, minlength=8).max()
    assert purity / 800 > 0.9


def test_ivf_recall_on_clustered_data(rng):
    emb, _ = _clustered(rng, n_clusters=16, per=200)
    ivf = IVFIndex(nlist=16, nprobe=4, seed=0)
    ivf.build(emb)
    hits = 0
    trials = 20
    for t in range(trials):
        q = emb[t * 150] + 0.02 * rng.standard_normal(512).astype(
            np.float32)
        q /= np.linalg.norm(q)
        exact_vals, exact_idx = cosine_topk(jnp.asarray(emb),
                                            jnp.asarray(q),
                                            emb.shape[0], k=10)
        vals, idxs = ivf.search(q, k=10)
        hits += len(set(np.asarray(exact_idx).tolist())
                    & set(idxs[idxs >= 0].tolist()))
        # probed scores are true cosines
        live = idxs >= 0
        np.testing.assert_allclose(vals[live], emb[idxs[live]] @ q,
                                   atol=1e-5)
    assert hits / (trials * 10) > 0.8  # recall@10 with nprobe=4/16


def test_ivf_full_probe_is_exact(rng):
    emb = _unit(rng, 1500)
    ivf = IVFIndex(nlist=16, nprobe=16, seed=0)  # probe everything
    ivf.build(emb)
    q = _unit(rng, 3)
    exact_vals, exact_idx = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                        1500, k=5)
    vals, idxs = ivf.search(q, k=5)
    for b in range(3):
        assert set(idxs[b].tolist()) == \
            set(np.asarray(exact_idx)[b].tolist())
        np.testing.assert_allclose(np.sort(vals[b]),
                                   np.sort(np.asarray(exact_vals)[b]),
                                   atol=1e-5)


def test_ivf_single_query_shape(rng):
    emb = _unit(rng, 800)
    ivf = IVFIndex(nlist=16, nprobe=2)
    ivf.build(emb)
    vals, idxs = ivf.search(emb[5], k=3)
    assert vals.shape == (3,) and idxs.shape == (3,)
    assert idxs[0] == 5  # own cluster always probed first


def test_ivf_requires_build():
    with pytest.raises(RuntimeError):
        IVFIndex().search(np.zeros(512, np.float32))


def test_ivf_pallas_interpret_matches_xla(rng, monkeypatch):
    """The zero-copy Pallas probe scan (interpreter mode) returns the same
    candidate set as the XLA gather path."""
    emb, _ = _clustered(rng, n_clusters=8, per=150)
    ivf = IVFIndex(nlist=8, nprobe=3, seed=0)
    ivf.build(emb)
    q = emb[100] / np.linalg.norm(emb[100])
    vals_xla, idxs_xla = ivf.search(q, k=5)
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    vals_pl, idxs_pl = ivf.search(q, k=5)
    live = idxs_pl >= 0
    assert set(idxs_pl[live].tolist()) == \
        set(idxs_xla[idxs_xla >= 0].tolist())
    np.testing.assert_allclose(np.sort(vals_pl[live]),
                               np.sort(vals_xla[vals_xla > -1e30]),
                               atol=1e-5)


def test_ivf_pallas_full_probe_exact(rng, monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    emb = _unit(rng, 1200)
    ivf = IVFIndex(nlist=8, nprobe=8, seed=0)
    ivf.build(emb)
    q = _unit(rng, 1)[0]
    exact_vals, exact_idx = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                        1200, k=5)
    vals, idxs = ivf.search(q, k=5)
    assert set(idxs.tolist()) == set(np.asarray(exact_idx).tolist())


def test_balanced_build_caps_cluster_sizes(rng):
    # heavily skewed data: 90% of points near one center
    c1 = _unit(rng, 1)[0]
    big = c1 + 0.05 * rng.standard_normal((1800, 512)).astype(np.float32)
    rest = _unit(rng, 200)
    emb = np.concatenate([big / np.linalg.norm(big, axis=-1,
                                               keepdims=True), rest])
    ivf = IVFIndex(nlist=16, nprobe=4, balance_factor=2.0, seed=0)
    ivf.build(emb)
    counts = np.asarray(ivf._tile_counts) * 0  # placeholder
    from video_quierer_tpu.ops.topk import BLOCK_ROWS
    cap_rows = int(np.ceil(2000 / 16 * 2.0))
    # every cluster's row count ≤ cap (tile counts bound it)
    assert ivf._max_tiles <= -(-cap_rows // BLOCK_ROWS)
    # search still finds exact near-duplicates
    q = emb[5]
    vals, idxs = ivf.search(q, k=1)
    assert idxs[0] == 5


def test_unbalanced_opt_out(rng):
    emb = _unit(rng, 500)
    ivf = IVFIndex(nlist=8, nprobe=8, balance_factor=0, seed=0)
    ivf.build(emb)
    q = emb[7]
    vals, idxs = ivf.search(q, k=1)
    assert idxs[0] == 7


def test_ivf_incremental_add_and_merge(rng):
    emb = _unit(rng, 1000)
    ivf = IVFIndex(nlist=8, nprobe=4, seed=0, rebuild_fraction=0.25)
    ivf.build(emb)
    fresh = _unit(rng, 50)
    ivf.add(fresh)
    # a fresh row must be findable with its continued global id
    q = fresh[7]
    vals, idxs = ivf.search(q, k=3)
    assert idxs[0] == 1000 + 7
    assert vals[0] == pytest.approx(1.0, abs=1e-5)
    # built rows still findable
    vals2, idxs2 = ivf.search(emb[3], k=1)
    assert idxs2[0] == 3
    assert not ivf.needs_rebuild
    ivf.add(_unit(rng, 300))
    assert ivf.needs_rebuild
    ivf.rebuild()
    assert ivf._fresh is None
    # after rebuild the formerly-fresh row keeps its global id
    vals3, idxs3 = ivf.search(fresh[7], k=1)
    assert idxs3[0] == 1000 + 7


def test_ivf_add_requires_build(rng):
    with pytest.raises(RuntimeError):
        IVFIndex().add(_unit(rng, 2))


def test_ivf_pallas_batched_pair_grid(rng, monkeypatch):
    """The single-launch (query, tile) pair-grid kernel must match the XLA
    gather path for batches well beyond the old B<=4 limit."""
    emb, _ = _clustered(rng, n_clusters=8, per=150)
    ivf = IVFIndex(nlist=8, nprobe=3, seed=0)
    ivf.build(emb)
    q = emb[rng.integers(0, emb.shape[0], 12)]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    vals_xla, idxs_xla = ivf.search(q, k=5)
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    vals_pl, idxs_pl = ivf.search(q, k=5)
    for b in range(q.shape[0]):
        live = idxs_pl[b] >= 0
        assert set(idxs_pl[b][live].tolist()) == \
            set(idxs_xla[b][idxs_xla[b] >= 0].tolist())
        np.testing.assert_allclose(np.sort(vals_pl[b][live]),
                                   np.sort(vals_xla[b][vals_xla[b] > -1e30]),
                                   atol=1e-5)


def test_ivf_stats(rng):
    emb = _unit(rng, 1200)
    ivf = IVFIndex(nlist=8, nprobe=3, seed=0)
    assert ivf.stats() == {"built": False}
    ivf.build(emb)
    s = ivf.stats()
    assert s["built"] and s["nlist"] == 8 and s["rows"] == 1200
    assert s["nprobe"] == 3 and s["fresh_rows"] == 0
    ivf.add(_unit(rng, 50))
    assert ivf.stats()["fresh_rows"] == 50


# ---------------------------------------------------------------------------
# Mesh-distributed IVF (ROADMAP round-1 design: replicated centroids,
# greedy cluster->device packing, per-device pair-grid scan, ICI merge)
# ---------------------------------------------------------------------------


def _mesh8():
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    return corpus_mesh(8)


def test_sharded_ivf_matches_single_device(rng):
    emb, _ = _clustered(rng, n_clusters=8, per=200)
    single = IVFIndex(nlist=8, nprobe=3, seed=0)
    single.build(emb)
    sharded = IVFIndex(nlist=8, nprobe=3, seed=0, mesh=_mesh8())
    sharded.build(emb)
    q = emb[rng.integers(0, emb.shape[0], 6)]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    v1, i1 = single.search(q, k=5)
    v2, i2 = sharded.search(q, k=5)
    for b in range(q.shape[0]):
        assert set(i2[b][i2[b] >= 0].tolist()) == \
            set(i1[b][i1[b] >= 0].tolist())
        np.testing.assert_allclose(np.sort(v2[b][i2[b] >= 0]),
                                   np.sort(v1[b][i1[b] >= 0]), atol=1e-5)


def test_sharded_ivf_full_probe_exact(rng):
    emb = _unit(rng, 2048)
    ivf = IVFIndex(nlist=8, nprobe=8, seed=0, mesh=_mesh8())
    ivf.build(emb)
    q = _unit(rng, 2)
    exact_vals, exact_idx = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                        2048, k=5)
    vals, idxs = ivf.search(q, k=5)
    for b in range(2):
        assert set(idxs[b].tolist()) == \
            set(np.asarray(exact_idx)[b].tolist())
        np.testing.assert_allclose(np.sort(vals[b]),
                                   np.sort(np.asarray(exact_vals)[b]),
                                   atol=1e-5)


def test_sharded_ivf_balanced_packing(rng):
    emb, _ = _clustered(rng, n_clusters=16, per=100)
    ivf = IVFIndex(nlist=16, nprobe=4, seed=0, mesh=_mesh8())
    ivf.build(emb)
    s = ivf.stats()
    assert s["devices"] == 8
    load = np.asarray(s["tiles_per_device"])
    assert load.sum() == s["tiles"]
    # greedy balance: no device holds more than the max cluster above the
    # mean
    assert load.max() - load.min() <= s["max_tiles_per_cluster"]


def test_sharded_ivf_fresh_buffer_merge(rng):
    emb = _unit(rng, 1500)
    ivf = IVFIndex(nlist=8, nprobe=8, seed=0, mesh=_mesh8())
    ivf.build(emb)
    fresh = _unit(rng, 30)
    ivf.add(fresh)
    q = fresh[11]
    vals, idxs = ivf.search(q, k=1)
    assert idxs[0] == 1500 + 11
    np.testing.assert_allclose(vals[0], 1.0, rtol=1e-5)


def test_sharded_ivf_full_probe_skewed_packing(rng):
    """Round-2 review fix: the per-device slot list must size to the
    WORST-CASE probes a device owns, not a 2x-average heuristic — greedy
    packing can put every small probed cluster on one device (skewed
    cluster sizes), and the old fixed cap silently dropped the excess."""
    # 4 big clusters + 24 tiny ones -> greedy balance piles the tiny
    # clusters onto the devices not holding a big one
    sizes = [600] * 4 + [16] * 24
    centers = _unit(rng, len(sizes))
    rows = []
    for c, n_c in enumerate(sizes):
        pts = centers[c] + 0.1 * rng.standard_normal(
            (n_c, 512)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=-1, keepdims=True))
    emb = np.concatenate(rows)
    n = emb.shape[0]
    ivf = IVFIndex(nlist=28, nprobe=28, seed=0, balance_factor=0,
                   mesh=_mesh8())
    ivf.build(emb)
    q = _unit(rng, 3)
    exact_vals, exact_idx = cosine_topk(jnp.asarray(emb), jnp.asarray(q),
                                        n, k=6)
    vals, idxs = ivf.search(q, k=6)
    for b in range(3):
        assert set(idxs[b][idxs[b] >= 0].tolist()) == \
            set(np.asarray(exact_idx)[b].tolist()), b


def test_ivf_add_copies_input(rng):
    """Round-2 review fix: add() must snapshot the rows — callers pass
    live index slices that in-place compaction later rewrites."""
    emb = _unit(rng, 600)
    ivf = IVFIndex(nlist=8, nprobe=8, seed=0)
    ivf.build(emb)
    fresh = _unit(rng, 8)
    ivf.add(fresh)
    probe = fresh[3].copy()
    fresh[:] = 0.0  # caller mutates its buffer after add()
    vals, idxs = ivf.search(probe, k=1)
    assert idxs[0] == 600 + 3
    np.testing.assert_allclose(vals[0], 1.0, rtol=1e-5)


def test_ivf_query_bucketing_consistent(rng):
    """Odd batch widths pad to the executable buckets; results must be
    identical to per-query searches and sized to the real batch."""
    emb = _unit(rng, 1024)
    ivf = IVFIndex(nlist=8, nprobe=4, seed=0)
    ivf.build(emb)
    q = _unit(rng, 5)  # pads to the 8-bucket
    vals, idxs = ivf.search(q, k=4)
    assert vals.shape == (5, 4) and idxs.shape == (5, 4)
    for b in range(5):
        v1, i1 = ivf.search(q[b], k=4)
        np.testing.assert_array_equal(idxs[b], i1)
        np.testing.assert_allclose(vals[b], v1, rtol=1e-6)


def test_sharded_ivf_build_keeps_tiles_on_host(rng):
    """Round-2 review fix: mesh-mode build must not replicate the full
    tile array on one device — only the per-device shards go to HBM."""
    emb = _unit(rng, 1024)
    ivf = IVFIndex(nlist=8, nprobe=4, seed=0, mesh=_mesh8())
    ivf.build(emb)
    assert isinstance(ivf._tiled, np.ndarray)
    assert isinstance(ivf._row_ids, np.ndarray)
    # reconstruction still works from the host copies
    rec = ivf._reconstruct_corpus()
    np.testing.assert_allclose(rec, emb, rtol=1e-6)
