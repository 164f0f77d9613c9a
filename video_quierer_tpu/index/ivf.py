"""IVF-Flat approximate index: device k-means + cluster-pruned scan.

The dead path's HNSW (src/indexes/hnsw.py) exists to make search sublinear
in corpus size. Its pointer-chasing graph walk is the opposite of what a
TPU wants; the BASELINE mandate replaces it with the exact HBM scan
(ops/topk.py), which is the right call for anything that fits in HBM. For
corpora beyond that — or latency budgets below the full-scan bound — this
module provides the TPU-idiomatic ANN alternative:

- **Build**: spherical k-means fully on device (chunked assignment matmuls
  on the MXU + ``segment_sum`` centroid updates — no data-dependent Python
  control flow), then rows are reordered cluster-contiguously and padded to
  BLOCK_ROWS tiles.
- **Search**: score the ``[C, D]`` centroid matrix (tiny), take the top
  ``nprobe`` clusters, gather their row tiles, and run the same fused
  top-k scan over just those rows — HBM traffic drops from O(N) to
  O(N * nprobe / nlist).

Approximation contract: results are exact *within* the probed clusters
(scores are true f32 cosines; padding is masked), recall is governed by
``nprobe/nlist`` like any IVF. Tests measure recall against the exact scan.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_quierer_tpu.ops.topk import (
    BLOCK_ROWS,
    MAX_K,
    NEG_INF,
    _block_topk_body,
    _pallas_mode,
)

logger = logging.getLogger(__name__)

_ASSIGN_CHUNK = 65536

# Probe-scan executables are compiled per static batch shape; coalesced
# serving flushes arbitrary widths, so queries pad to these buckets
# (mirrors the fused text path's TEXT_BUCKETS discipline).
_QUERY_BUCKETS = (1, 8, 32, 64)


# ---------------------------------------------------------------------------
# Pallas zero-copy probe scan: the grid walks a *runtime-selected* list of
# cluster tiles. The tile list is a scalar-prefetch operand, so each grid
# step's BlockSpec index_map picks which HBM tile to DMA — the selected
# clusters are scanned in place, never gathered into a contiguous copy
# (the XLA fallback below pays that extra write+read).
# ---------------------------------------------------------------------------


def _ivf_scan_kernel(tiles_ref, qidx_ref, emb_tile_ref, ids_tile_ref,
                     qt_ref, vals_ref, idxs_ref, *, k: int):
    from jax.experimental import pallas as pl
    b = qt_ref.shape[1]
    emb = emb_tile_ref[0]                       # [BLOCK_ROWS, D]
    ids = ids_tile_ref[0, :, 0]                 # [BLOCK_ROWS]
    # HIGHEST precision for f32, same as ops/topk._scan_kernel: the TPU
    # default bf16x1 pass drifts ~4e-3, which would desync rankings from
    # the exact fresh-buffer merge and the XLA fallback
    precision = (jax.lax.Precision.HIGHEST
                 if emb.dtype == jnp.float32 else None)
    # Score the tile against ALL B query columns — the MXU pads the rhs
    # to a 128-lane tile regardless, so this costs the same as one
    # column, and DMAing the whole [D, B] matrix (replicated across
    # steps) satisfies Mosaic's lane-tiling rule; a (D, 1) per-pair
    # block does NOT (1 is neither 128-divisible nor the full lane dim
    # — hardware lowering rejects it; interpret mode masked this).
    scores_all = jnp.dot(emb, qt_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=precision)   # [BLOCK_ROWS, B]
    # one-hot select this pair's query column (qidx is scalar-prefetch)
    col = qidx_ref[pl.program_id(0)]
    onehot = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1) == col
    scores = jnp.sum(jnp.where(onehot, scores_all, 0.0), axis=1,
                     keepdims=True)             # [BLOCK_ROWS, 1]
    ids_b = ids[:, None]
    scores = jnp.where(ids_b >= 0, scores, NEG_INF)
    vals, idxs = _block_topk_body(scores, ids_b, k)
    vals_ref[0] = vals
    idxs_ref[0] = idxs


@functools.partial(jax.jit, static_argnames=("k", "total", "interpret"))
def _pallas_probe_scan(tiled_emb, tiled_ids, tile_list, qidx, qt,
                       *, k: int, total: int, interpret: bool = False):
    """Scan ``total`` (query, tile) pairs in ONE kernel launch.

    The grid walks runtime-selected work pairs: step ``i`` DMAs HBM tile
    ``tile_list[i]`` and scores it against query column ``qidx[i]`` — both
    scalar-prefetch operands driving the BlockSpec index maps, so the
    selected clusters are scanned in place (never gathered into a
    contiguous copy) and ANY batch size runs in a single launch (round-1
    VERDICT item 7: the old kernel launched once per query and only for
    B<=4).

    tiled_emb: [T, BLOCK_ROWS, D]; tiled_ids: [T, BLOCK_ROWS, 1] (−1 pad;
    the unit lane dim satisfies Mosaic's block-tiling rule);
    tile_list/qidx: [total] int32; qt: [D, B].
    Returns per-pair candidates ([total, 1, k], [total, 1, k]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    d = tiled_emb.shape[2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(total,),
        in_specs=[
            pl.BlockSpec((1, BLOCK_ROWS, d),
                         lambda i, tiles_ref, qidx_ref: (tiles_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_ROWS, 1),
                         lambda i, tiles_ref, qidx_ref: (tiles_ref[i], 0, 0),
                         memory_space=pltpu.VMEM),
            # whole [D, B] query matrix each step (replicated block —
            # Pallas skips the re-DMA when the index map is constant);
            # the kernel one-hot-selects its pair's column
            pl.BlockSpec((d, qt.shape[1]),
                         lambda i, tiles_ref, qidx_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k),
                         lambda i, tiles_ref, qidx_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k),
                         lambda i, tiles_ref, qidx_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_ivf_scan_kernel, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((total, 1, k), jnp.float32),
            jax.ShapeDtypeStruct((total, 1, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_list.astype(jnp.int32), qidx.astype(jnp.int32),
      tiled_emb, tiled_ids, qt)


@functools.partial(jax.jit,
                   static_argnames=("k", "dev_slots", "b", "mesh",
                                    "interpret"))
def _sharded_probe_scan(sh_tiled, sh_ids, tile_lists, qidx, qt,
                        *, k: int, dev_slots: int, b: int, mesh,
                        interpret: bool = False):
    """Mesh-distributed IVF probe: each device pair-grid-scans its local
    tile slots, then candidates all_gather over ICI and every device
    computes the same global top-k (the sharded_cosine_topk merge shape).

    sh_tiled: [n_dev, T_local+1, BR, D] sharded P(corpus, ...);
    sh_ids:   [n_dev, T_local+1, BR] (global row ids, -1 pad);
    tile_lists: [n_dev, b*dev_slots] per-device slot lists (sharded);
    qidx: [b*dev_slots] replicated; qt: [D, B] replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from video_quierer_tpu.ops.topk import merge_topk
    from video_quierer_tpu.parallel.mesh import CORPUS_AXIS

    n_dev = mesh.shape[CORPUS_AXIS]
    total = b * dev_slots

    def local_probe(tiled_l, ids_l, tlist_l, qidx_r, qt_r):
        vals, idxs = _pallas_probe_scan(
            tiled_l[0], ids_l[0][:, :, None], tlist_l[0], qidx_r, qt_r,
            k=k, total=total, interpret=interpret)
        vals = vals.reshape(b, dev_slots * k)
        idxs = idxs.reshape(b, dev_slots * k)
        all_vals = jax.lax.all_gather(vals, CORPUS_AXIS)  # [n_dev, b, ...]
        all_idxs = jax.lax.all_gather(idxs, CORPUS_AXIS)
        cand_v = jnp.transpose(all_vals, (1, 0, 2)).reshape(
            b, n_dev * dev_slots * k)
        cand_i = jnp.transpose(all_idxs, (1, 0, 2)).reshape(
            b, n_dev * dev_slots * k)
        return merge_topk(cand_v, cand_i, k=k)

    fn = shard_map(
        local_probe, mesh=mesh,
        in_specs=(P(CORPUS_AXIS, None, None, None),
                  P(CORPUS_AXIS, None, None),
                  P(CORPUS_AXIS, None),
                  P(None), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(sh_tiled, sh_ids, tile_lists, qidx, qt)


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans(emb: jax.Array, seed: jax.Array, *, n_clusters: int,
            iters: int) -> Tuple[jax.Array, jax.Array]:
    """Spherical k-means. ``emb [N, D]`` unit rows → (centroids [C, D],
    assignments [N])."""
    n, d = emb.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (n_clusters,), replace=False)
    centroids = emb[init_idx]

    n_chunks = -(-n // _ASSIGN_CHUNK)
    pad = n_chunks * _ASSIGN_CHUNK - n
    emb_p = jnp.pad(emb, ((0, pad), (0, 0)))
    chunks = emb_p.reshape(n_chunks, _ASSIGN_CHUNK, d)

    def assign_all(centroids):
        def one(chunk):
            sims = jnp.dot(chunk, centroids.T,
                           preferred_element_type=jnp.float32)
            return jnp.argmax(sims, axis=-1).astype(jnp.int32)
        return jax.lax.map(one, chunks).reshape(-1)[:n]

    def body(_, centroids):
        assign = assign_all(centroids)
        sums = jax.ops.segment_sum(emb, assign, num_segments=n_clusters)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign,
                                     num_segments=n_clusters)
        norms = jnp.linalg.norm(sums, axis=-1, keepdims=True)
        fresh = sums / jnp.maximum(norms, 1e-10)
        # empty clusters keep their previous centroid
        centroids = jnp.where(counts[:, None] > 0, fresh, centroids)
        return centroids

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    return centroids, assign_all(centroids)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "tiles"))
def _probe_and_scan(centroids, tiled_emb, tile_cluster_start, tile_counts,
                    row_ids, queries, *, k: int, nprobe: int, tiles: int):
    """Select top-nprobe clusters per query, gather their tiles, exact-scan.

    tiled_emb:   [T, BLOCK_ROWS, D] — cluster-contiguous row tiles.
    tile_cluster_start: [C] first tile of each cluster.
    tile_counts: [C] tiles per cluster.
    row_ids:     [T, BLOCK_ROWS] original row index (-1 padding).
    queries:     [B, D] normalized.
    tiles:       static per-query tile budget = nprobe * max_tiles/cluster.
    """
    b = queries.shape[0]
    csims = jnp.dot(queries, centroids.T,
                    preferred_element_type=jnp.float32)  # [B, C]
    _, top_clusters = jax.lax.top_k(csims, nprobe)       # [B, nprobe]

    tile_budget = tiles // nprobe

    def per_query(q, clusters):
        starts = tile_cluster_start[clusters]            # [nprobe]
        # clamp to the per-probe budget: outsized clusters contribute
        # only their first tiles (IVF is approximate; the budget keeps
        # the gather static and bounded under cluster-size skew)
        counts = jnp.minimum(tile_counts[clusters], tile_budget)
        # flatten cluster tile ranges into a fixed-size tile list; unused
        # slots point at tile 0 with a kill mask
        offs = jnp.cumsum(counts) - counts               # [nprobe]
        slot = jnp.arange(tiles)
        # map slot -> (which probe, offset within that probe's range)
        probe_idx = jnp.searchsorted(jnp.cumsum(counts), slot,
                                     side="right")
        probe_idx = jnp.clip(probe_idx, 0, nprobe - 1)
        within = slot - offs[probe_idx]
        valid_slot = slot < counts.sum()
        tile_ids = jnp.where(valid_slot,
                             starts[probe_idx] + within, 0)
        gathered = tiled_emb[tile_ids]                   # [tiles, BR, D]
        ids = jnp.where(valid_slot[:, None], row_ids[tile_ids], -1)
        scores = jnp.einsum("tbd,d->tb", gathered, q,
                            preferred_element_type=jnp.float32)
        scores = jnp.where(ids >= 0, scores, NEG_INF)
        flat_scores = scores.reshape(-1)
        flat_ids = ids.reshape(-1)
        vals, pos = jax.lax.top_k(flat_scores, k)
        return vals, flat_ids[pos]

    return jax.vmap(per_query)(queries, top_clusters)


def _rebalance(emb: np.ndarray, centroids: np.ndarray,
               assign: np.ndarray, cap: int) -> np.ndarray:
    """Cap cluster sizes: over-full clusters keep their ``cap`` closest
    rows; evicted rows move to their best non-full cluster. Bounds
    ``max_tiles`` so the probe scan's static tile budget never truncates
    live rows (size skew was the measured failure mode on TPU)."""
    assign = assign.copy()
    nlist = centroids.shape[0]
    counts = np.bincount(assign, minlength=nlist)
    evicted = []
    for c in np.nonzero(counts > cap)[0]:
        rows = np.nonzero(assign == c)[0]
        sims = emb[rows] @ centroids[c]
        keep = np.argpartition(-sims, cap - 1)[:cap]
        mask = np.ones(rows.size, bool)
        mask[keep] = False
        evicted.extend(rows[mask].tolist())
        counts[c] = cap
    if not evicted:
        return assign
    evicted = np.asarray(evicted)
    sims = emb[evicted] @ centroids.T                      # [E, C]
    order = np.argsort(-sims, axis=1)
    for i, row in enumerate(evicted):
        for c in order[i]:
            if counts[c] < cap:
                assign[row] = c
                counts[c] += 1
                break
    return assign


class IVFIndex:
    """Cluster-pruned approximate index over a fixed embedding matrix.

    Built once from a corpus snapshot (rebuild to absorb large appends —
    the exact-scan DeviceVideoIndex remains the incremental serving path).
    ``balance_factor`` caps clusters at ``factor * N/nlist`` rows
    (0 disables balancing).

    ``mesh``: a corpus mesh distributes the tier (ROADMAP round-1 design):
    centroids replicate on every device; clusters are assigned to devices
    greedily by descending size; each device packs ITS clusters into a
    local tile array padded to a uniform per-device tile count. A query
    computes probe clusters globally (replicated centroid scores on host),
    maps them to (device, local tiles), and every device runs the SAME
    zero-copy pair-grid scan over its slots (misses point at its padding
    tile); candidates merge over ICI exactly like sharded_cosine_topk.
    Expected per-device HBM traffic: ~nprobe/nlist of its shard, with no
    cross-device tile movement.
    """

    def __init__(self, nlist: Optional[int] = None, nprobe: int = 8,
                 kmeans_iters: int = 10, seed: int = 0,
                 balance_factor: float = 2.0,
                 rebuild_fraction: float = 0.25,
                 mesh=None):
        self.nlist = nlist
        self.nprobe = nprobe
        self.kmeans_iters = kmeans_iters
        self.seed = seed
        self.balance_factor = balance_factor
        # appended rows accumulate in an exact-scanned fresh buffer; once
        # it exceeds this fraction of the built corpus, rebuild() folds
        # them into the clustered tiles (classic IVF + fresh-list design)
        self.rebuild_fraction = rebuild_fraction
        self.mesh = mesh
        if mesh is not None:
            from video_quierer_tpu.parallel.mesh import CORPUS_AXIS
            self._n_dev = mesh.shape[CORPUS_AXIS]
        else:
            self._n_dev = 1
        self._built = False
        self._fresh: Optional[np.ndarray] = None
        self._n_built = 0

    def build(self, emb: np.ndarray) -> None:
        """``emb [N, D]`` float32 (unit rows recommended)."""
        emb = np.asarray(emb, np.float32)
        n, d = emb.shape
        nlist = self.nlist or max(16, 1 << int(np.log2(max(16, n ** 0.5))))
        nlist = min(nlist, max(16, n // 4))
        logger.info("IVF build: N=%d nlist=%d", n, nlist)
        centroids, assign = _kmeans(jnp.asarray(emb),
                                    jnp.int32(self.seed),
                                    n_clusters=nlist,
                                    iters=self.kmeans_iters)
        assign = np.asarray(assign)
        if self.balance_factor > 0:
            cap = max(1, int(np.ceil(n / nlist * self.balance_factor)))
            assign = _rebalance(emb, np.asarray(centroids), assign, cap)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=nlist)

        # pack rows cluster-contiguously into BLOCK_ROWS tiles
        tiles_per_cluster = np.maximum(1, -(-counts // BLOCK_ROWS))
        tile_start = np.concatenate([[0], np.cumsum(tiles_per_cluster)])
        total_tiles = int(tile_start[-1])
        tiled = np.zeros((total_tiles, BLOCK_ROWS, d), np.float32)
        row_ids = np.full((total_tiles, BLOCK_ROWS), -1, np.int64)
        # vectorized packing: for cluster-sorted rows, rank within the
        # cluster determines (tile, offset)
        sorted_assign = assign[order]
        cluster_first = np.concatenate([[0], np.cumsum(counts)])[:-1]
        ranks = np.arange(n) - cluster_first[sorted_assign]
        t = tile_start[sorted_assign] + ranks // BLOCK_ROWS
        o = ranks % BLOCK_ROWS
        tiled[t, o] = emb[order]
        row_ids[t, o] = order
        # one all-padding tile at the end: unused probe slots point here so
        # the Pallas scan's fixed tile list never duplicates live rows
        tiled = np.concatenate([tiled, np.zeros((1, BLOCK_ROWS, d),
                                                np.float32)])
        row_ids = np.concatenate([row_ids,
                                  np.full((1, BLOCK_ROWS), -1, np.int64)])
        self._pad_tile = total_tiles

        self.nlist = nlist
        self._centroids = jnp.asarray(np.asarray(centroids))
        self._centroids_np = np.asarray(self._centroids)
        if self.mesh is not None:
            # mesh mode never scans the unsharded tiles on device; a
            # jnp.asarray here would materialize the FULL corpus on one
            # chip — the exact failure mode the distributed tier exists
            # to avoid. Host copies serve _reconstruct_corpus.
            self._tiled = tiled
            self._row_ids = row_ids.astype(np.int32)
        else:
            self._tiled = jnp.asarray(tiled)
            self._row_ids = jnp.asarray(row_ids.astype(np.int32))
        self._tile_start = jnp.asarray(tile_start[:-1].astype(np.int32))
        self._tile_counts = jnp.asarray(
            tiles_per_cluster.astype(np.int32))
        self._tile_start_np = tile_start[:-1].astype(np.int64)
        self._tile_counts_np = tiles_per_cluster.astype(np.int64)
        self._max_tiles = int(tiles_per_cluster.max())
        self._median_tiles = int(np.median(tiles_per_cluster))
        self._n_built = n
        self._fresh = None
        if self.mesh is not None:
            self._pack_sharded(tiled[:total_tiles], row_ids[:total_tiles],
                               tile_start[:-1], tiles_per_cluster)
        self._built = True
        logger.info("IVF built: %d tiles (%.1f%% padding)", total_tiles,
                    100 * (1 - n / (total_tiles * BLOCK_ROWS)))

    def _pack_sharded(self, tiled: np.ndarray, row_ids: np.ndarray,
                      tile_start: np.ndarray,
                      tiles_per_cluster: np.ndarray) -> None:
        """Distribute cluster tiles over the corpus mesh: greedy balance
        by descending cluster size; per-device tile arrays padded to a
        uniform count (+1 padding tile each device's misses point at).
        Row ids stay GLOBAL, so merged candidates need no offsetting."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from video_quierer_tpu.parallel.mesh import CORPUS_AXIS

        n_dev = self._n_dev
        nlist = int(tiles_per_cluster.shape[0])
        d_model = tiled.shape[-1]
        order = np.argsort(-tiles_per_cluster, kind="stable")
        dev_of = np.zeros(nlist, np.int32)
        local_start = np.zeros(nlist, np.int64)
        load = np.zeros(n_dev, np.int64)
        for c in order:
            d = int(np.argmin(load))
            dev_of[c] = d
            local_start[c] = load[d]
            load[d] += tiles_per_cluster[c]
        t_local = max(1, int(load.max()))
        lt = np.zeros((n_dev, t_local + 1, BLOCK_ROWS, d_model), np.float32)
        li = np.full((n_dev, t_local + 1, BLOCK_ROWS), -1, np.int32)
        for c in range(nlist):
            d, s = dev_of[c], local_start[c]
            g, n_t = tile_start[c], tiles_per_cluster[c]
            lt[d, s: s + n_t] = tiled[g: g + n_t]
            li[d, s: s + n_t] = row_ids[g: g + n_t]
        spec = NamedSharding(self.mesh, P(CORPUS_AXIS, None, None, None))
        ispec = NamedSharding(self.mesh, P(CORPUS_AXIS, None, None))
        # device_put straight from host numpy: each device receives only
        # ITS shard (a jnp.asarray first would stage the full replica on
        # the default device)
        self._sh_tiled = jax.device_put(lt, spec)
        self._sh_ids = jax.device_put(li, ispec)
        self._cluster_dev = dev_of
        self._cluster_local_start = local_start
        self._local_pad_tile = t_local
        self._dev_load = load

    def stats(self) -> dict:
        """Operator-facing tier stats (surfaced via /api/stats)."""
        if not self._built:
            return {"built": False}
        total_tiles = int(self._tile_counts_np.sum())
        return {
            "built": True,
            "nlist": int(self.nlist),
            "nprobe": int(self.nprobe),
            "rows": int(self._n_built),
            "fresh_rows": 0 if self._fresh is None
            else int(self._fresh.shape[0]),
            "tiles": total_tiles,
            "max_tiles_per_cluster": int(self._max_tiles),
            "padding_pct": round(
                100 * (1 - self._n_built
                       / max(1, total_tiles * BLOCK_ROWS)), 2),
            "scanned_fraction": round(
                min(1.0, self.nprobe / max(1, self.nlist)), 4),
            **({"devices": self._n_dev,
                "tiles_per_device": self._dev_load.tolist()}
               if self.mesh is not None and self._built else {}),
        }

    def add(self, emb_new: np.ndarray) -> None:
        """Append rows without rebuilding: they land in a fresh buffer
        that every search scans exactly (tiny until ``rebuild_fraction``
        is hit — then call :meth:`rebuild`). Appended rows get global ids
        continuing after the built corpus."""
        if not self._built:
            raise RuntimeError("IVFIndex.build() first")
        # np.array COPIES: np.asarray of an already-f32 input returns a
        # view, and callers pass live index slices that in-place
        # compaction (DeviceVideoIndex.remove_video) would later rewrite
        # under our stored ids
        emb_new = np.array(emb_new, np.float32)
        self._fresh = emb_new if self._fresh is None else \
            np.concatenate([self._fresh, emb_new])

    @property
    def needs_rebuild(self) -> bool:
        return self._fresh is not None and \
            self._fresh.shape[0] > self.rebuild_fraction * self._n_built

    def _reconstruct_corpus(self) -> np.ndarray:
        """Recover the built corpus from the tiles (no separate snapshot
        is retained — it would double host memory for the index's life)."""
        tiled = np.asarray(self._tiled)
        ids = np.asarray(self._row_ids)
        mask = ids >= 0
        emb = np.empty((self._n_built, tiled.shape[-1]), np.float32)
        emb[ids[mask]] = tiled[mask]
        return emb

    def rebuild(self) -> None:
        """Fold the fresh buffer into the clustered tiles."""
        if self._fresh is None:
            return
        merged = np.concatenate([self._reconstruct_corpus(), self._fresh])
        self.build(merged)

    def search(self, queries: np.ndarray, k: int = 5,
               nprobe: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Normalized queries ``[B, D]`` or ``[D]`` → (scores, orig idx);
        missing slots (fewer than k candidates probed) have -inf / -1."""
        if not self._built:
            raise RuntimeError("IVFIndex.build() first")
        if k > MAX_K:
            raise ValueError(f"k must be <= {MAX_K}")
        nprobe = min(nprobe or self.nprobe, self.nlist)
        queries = np.asarray(queries, np.float32)
        squeeze = queries.ndim == 1
        if squeeze:
            queries = queries[None]
        # Bucket the batch size: the probe-scan executables are compiled
        # per static (b, tiles) shape, and coalesced serving flushes
        # arbitrary widths — without bucketing every new width pays a
        # device compile (minutes over the remote tunnel). Padded query
        # slots route to the padding tile only (no real scan work).
        b_real = queries.shape[0]
        bucket = next((x for x in _QUERY_BUCKETS if x >= b_real), b_real)
        if bucket > b_real:
            queries = np.concatenate(
                [queries, np.zeros((bucket - b_real, queries.shape[1]),
                                   np.float32)])
        # per-probe tile budget: 4× the median cluster keeps the scan
        # bounded when k-means produces skewed cluster sizes
        budget = min(self._max_tiles, max(1, 4 * self._median_tiles))
        tiles = int(nprobe * budget)
        mode = _pallas_mode()
        if self.mesh is not None:
            # off-TPU without the interpret env still works: the pair-grid
            # kernel runs through the Pallas interpreter
            vals, idxs = self._search_sharded(
                queries, k, nprobe, budget, n_real=b_real,
                interpret=(mode != "compiled"))
        # the Pallas pair-grid kernel handles any batch size in one launch
        elif mode != "off":
            vals, idxs = self._search_pallas(
                queries, k, nprobe, budget, tiles, n_real=b_real,
                interpret=(mode == "interpret"))
        else:
            v, i = _probe_and_scan(
                self._centroids, self._tiled, self._tile_start,
                self._tile_counts, self._row_ids, jnp.asarray(queries),
                k=k, nprobe=nprobe, tiles=tiles)
            vals, idxs = np.asarray(v), np.asarray(i)
        vals, idxs = vals[:b_real], idxs[:b_real]
        queries = queries[:b_real]
        if self._fresh is not None and self._fresh.shape[0] > 0:
            vals, idxs = self._merge_fresh(queries, vals, idxs, k)
        if squeeze:
            return vals[0], idxs[0]
        return vals, idxs

    def _merge_fresh(self, queries: np.ndarray, vals: np.ndarray,
                     idxs: np.ndarray, k: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact-scan the fresh buffer and merge into the probed results."""
        fresh_scores = queries @ self._fresh.T                # [B, F]
        f = self._fresh.shape[0]
        fresh_ids = self._n_built + np.arange(f)
        out_v = np.full_like(vals, NEG_INF)
        out_i = np.full_like(idxs, -1)
        for b in range(vals.shape[0]):
            live = idxs[b] >= 0
            cand_v = np.concatenate([vals[b][live], fresh_scores[b]])
            cand_i = np.concatenate([idxs[b][live], fresh_ids])
            order = np.argsort(-cand_v, kind="stable")[:k]
            out_v[b, : order.size] = cand_v[order]
            out_i[b, : order.size] = cand_i[order]
        return out_v, out_i

    def _search_sharded(self, queries: np.ndarray, k: int, nprobe: int,
                        budget: int, n_real: int, interpret: bool
                        ) -> Tuple[np.ndarray, np.ndarray]:
        """Distributed probe scan: host routes each probed cluster to its
        owning device's slot list; every device runs the pair-grid kernel
        on its local tiles; candidates merge over ICI (merge_topk after
        all_gather, as in sharded_cosine_topk)."""
        b = queries.shape[0]
        n_dev = self._n_dev
        csims = queries[:n_real] @ self._centroids_np.T
        # Route first: exact worst-case per-(query, device) slot need, so
        # NO probed cluster is ever dropped (a fixed 2x-headroom budget
        # silently discarded probes when greedy packing put many probed
        # clusters on one device — skewed cluster sizes do that). The
        # need is then rounded up to a power of two so the number of
        # distinct (dev_slots, b) executables stays bounded.
        probes = []
        need = 1
        for qi in range(n_real):
            cl = np.argpartition(-csims[qi], nprobe - 1)[:nprobe]
            cl = cl[np.argsort(-csims[qi][cl], kind="stable")]
            probes.append(cl)
            per_dev = np.zeros(n_dev, np.int64)
            for c in cl:
                per_dev[self._cluster_dev[c]] += min(
                    int(self._tile_counts_np[c]), budget)
            need = max(need, int(per_dev.max()))
        dev_slots = 1 << (need - 1).bit_length()
        pad = self._local_pad_tile
        tile_lists = np.full((n_dev, b * dev_slots), pad, np.int32)
        for qi, cl in enumerate(probes):
            cursor = (qi * dev_slots) * np.ones(n_dev, np.int64)
            for c in cl:
                d = self._cluster_dev[c]
                cnt = int(min(self._tile_counts_np[c], budget))
                s = self._cluster_local_start[c]
                tile_lists[d, cursor[d]: cursor[d] + cnt] = \
                    np.arange(s, s + cnt)
                cursor[d] += cnt
        qidx = np.repeat(np.arange(b, dtype=np.int32), dev_slots)
        vals, idxs = _sharded_probe_scan(
            self._sh_tiled, self._sh_ids, jnp.asarray(tile_lists),
            jnp.asarray(qidx), jnp.asarray(queries.T),
            k=k, dev_slots=dev_slots, b=b, mesh=self.mesh,
            interpret=interpret)
        out_v = np.asarray(vals).astype(np.float32)
        out_i = np.asarray(idxs).astype(np.int64)
        out_i[~np.isfinite(out_v)] = -1
        out_v[~np.isfinite(out_v)] = NEG_INF
        return out_v, out_i

    def _search_pallas(self, queries: np.ndarray, k: int, nprobe: int,
                       budget: int, tiles: int, n_real: int,
                       interpret: bool
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Zero-copy probe scan: build the (query, tile) pair list on host
        (tiny) and let ONE Pallas grid DMA exactly those tiles."""
        b = queries.shape[0]
        csims = queries[:n_real] @ self._centroids_np.T   # [n_real, C]
        tile_list = np.full(b * tiles, self._pad_tile, np.int32)
        qidx = np.repeat(np.arange(b, dtype=np.int32), tiles)
        for qi in range(n_real):
            clusters = np.argpartition(-csims[qi], nprobe - 1)[:nprobe]
            starts = self._tile_start_np[clusters]
            counts = np.minimum(self._tile_counts_np[clusters], budget)
            pos = qi * tiles
            for s, c in zip(starts, counts):
                tile_list[pos: pos + c] = np.arange(s, s + c)
                pos += c
        vals, idxs = _pallas_probe_scan(
            self._tiled, self._row_ids[:, :, None],
            jnp.asarray(tile_list), jnp.asarray(qidx),
            jnp.asarray(queries.T),
            k=k, total=b * tiles, interpret=interpret)
        cand_v = np.asarray(vals).reshape(b, tiles * k)
        cand_i = np.asarray(idxs).reshape(b, tiles * k)
        out_vals = np.full((b, k), NEG_INF, np.float32)
        out_idxs = np.full((b, k), -1, np.int64)
        for qi in range(b):
            live = cand_i[qi] >= 0
            flat_v, flat_i = cand_v[qi][live], cand_i[qi][live]
            order = np.argsort(-flat_v, kind="stable")[:k]
            out_vals[qi, : order.size] = flat_v[order]
            out_idxs[qi, : order.size] = flat_i[order]
        return out_vals, out_idxs
