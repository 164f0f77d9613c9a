"""Mesh-sharded exact corpus scan: per-shard top-k + ICI merge.

This is the "corpus dimension" analog of sequence parallelism called out in
SURVEY.md §2.3/§5: the ``[N_pad, D]`` embedding matrix is row-sharded over the
``corpus`` mesh axis, every device runs the fused matmul+top-k scan on its
shard (ops/topk.py), per-shard candidates are ``all_gather``-ed over ICI and
each device computes the identical global top-k — exact score-ordering parity
with the single-device scan and therefore with the reference's brute-force
search (video_search_overhaul.py:40-64).

Merge exactness: shard ``i`` owns rows ``[i*S, (i+1)*S)``; candidates are
gathered in ascending shard order, and within a shard in descending-stable
order, so ``lax.top_k``'s first-occurrence tie rule yields the global
descending-stable order (see ops/topk.py docstring).

Multi-slice growth path: on a 2-D ``(dcn, corpus)`` mesh
(parallel/mesh.py:multislice_corpus_mesh) the merge is hierarchical —
per-shard candidates merge within each slice over ICI first, then only the
``[B, k]`` slice winners cross DCN, so inter-slice traffic is k candidates
per slice instead of ``shards_per_slice × k``. Same exact ordering: both
gather stages run in ascending owner order.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from video_quierer_tpu.ops.topk import (
    APPROX_FETCH_CAP,
    MAX_K,
    candidate_stage,
    candidate_stage_int8,
    cosine_topk,
    cosine_topk_int8,
    merge_topk,
)
from video_quierer_tpu.parallel.mesh import CORPUS_AXIS, DCN_AXIS


def _scan_impl(impl: str):
    """Per-shard scan for ``impl``: "exact" = the Pallas/XLA exact scan;
    "approx"/"fused"/"cand" = the candidate stage of the re-ranked bf16
    mode (ops/topk.py:candidate_stage — fused in-VMEM bucket selection
    or hardware ApproxTopK per the env mode; callers restore exact
    results with the host f32 re-rank)."""
    if impl != "exact":
        return lambda emb, q, valid, *, k, perm=None: candidate_stage(
            emb, q, jnp.asarray(valid, jnp.int32), k=k, perm=perm)
    return lambda emb, q, valid, *, k, perm=None: cosine_topk(
        emb, q, valid, k=k)


def _scan_impl_int8(impl: str):
    if impl != "exact":
        return lambda c, s, q, valid, *, k, perm=None: \
            candidate_stage_int8(c, s, q, jnp.asarray(valid, jnp.int32),
                                 k=k, perm=perm)
    return lambda c, s, q, valid, *, k, perm=None: cosine_topk_int8(
        c, s, q, valid, k=k)


def is_multislice(mesh: Mesh) -> bool:
    return mesh is not None and DCN_AXIS in mesh.axis_names


def corpus_spec(mesh: Mesh) -> P:
    """Row-shard spec for the mesh: over ``(dcn, corpus)`` on a
    multi-slice mesh, else over ``corpus``."""
    if is_multislice(mesh):
        return P((DCN_AXIS, CORPUS_AXIS), None)
    return P(CORPUS_AXIS, None)


def _vec_spec(mesh: Mesh) -> P:
    if is_multislice(mesh):
        return P((DCN_AXIS, CORPUS_AXIS))
    return P(CORPUS_AXIS)


def shard_corpus(emb, mesh: Mesh) -> jax.Array:
    """Place an ``[N_pad, D]`` matrix row-sharded over the corpus axis
    (both mesh axes on a multi-slice mesh).

    ``N_pad`` must be divisible by the total shard count (the sharded
    index keeps capacity a multiple of ``n_shards * _CHUNK``).
    """
    return jax.device_put(emb, NamedSharding(mesh, corpus_spec(mesh)))


def shard_corpus_vec(vec, mesh: Mesh) -> jax.Array:
    """Place an ``[N_pad]`` per-row column (the mirror permutation)
    sharded like the corpus rows."""
    return jax.device_put(vec, NamedSharding(mesh, _vec_spec(mesh)))


def _gather_merge(vals: jax.Array, idxs: jax.Array, axis_name: str,
                  n: int, k: int) -> Tuple[jax.Array, jax.Array]:
    """all_gather per-participant ``[B, k]`` candidates over ``axis_name``
    (ascending owner order) and merge to the axis-wide top-k."""
    all_vals = jax.lax.all_gather(vals, axis_name)    # [n, B, k]
    all_idxs = jax.lax.all_gather(idxs, axis_name)
    b = vals.shape[0]
    cand_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, n * k)
    cand_idxs = jnp.transpose(all_idxs, (1, 0, 2)).reshape(b, n * k)
    return merge_topk(cand_vals, cand_idxs, k=k)


@functools.partial(jax.jit,
                   static_argnames=("k", "mesh", "impl", "int8"))
def _sharded_topk(operands, queries, valid_count, perm, *, k: int,
                  mesh: Mesh, impl: str, int8: bool
                  ) -> Tuple[jax.Array, jax.Array]:
    """Shared core of the four sharded scans: per-shard scan → ICI merge
    (→ DCN merge on a multi-slice mesh).

    ``operands``: ``(emb,)`` or ``(codes, scales)``, row-sharded.
    ``perm``: optional ``[N_pad]`` i32 mirror permutation column, sharded
    like the rows. With it, validity masks on ``perm < valid`` inside
    each shard and the emitted indices are host rows already (no offset
    translation); candidate impls only.
    """
    k_cap = MAX_K if impl == "exact" else APPROX_FETCH_CAP
    if k <= 0 or k > k_cap:
        raise ValueError(f"k must be in [1, {k_cap}], got {k}")
    if perm is not None and impl == "exact":
        raise ValueError("exact sharded scan requires an identity-layout "
                         "mirror (perm=None)")
    multis = is_multislice(mesh)
    n_slices = mesh.shape[DCN_AXIS] if multis else 1
    per_slice = mesh.shape[CORPUS_AXIS]
    n_shards = n_slices * per_slice
    n_pad = operands[0].shape[0]
    if n_pad % n_shards:
        raise ValueError(f"N_pad={n_pad} not divisible by {n_shards} shards")
    shard_rows = n_pad // n_shards
    scan = _scan_impl_int8(impl) if int8 else _scan_impl(impl)

    def merged(vals, idxs):
        vals, idxs = _gather_merge(vals, idxs, CORPUS_AXIS, per_slice, k)
        if multis:
            vals, idxs = _gather_merge(vals, idxs, DCN_AXIS, n_slices, k)
        return vals, idxs

    def shard_index():
        if multis:
            return (jax.lax.axis_index(DCN_AXIS) * per_slice
                    + jax.lax.axis_index(CORPUS_AXIS))
        return jax.lax.axis_index(CORPUS_AXIS)

    row_spec = corpus_spec(mesh)
    op_specs = (row_spec, row_spec) if int8 else (row_spec,)

    if perm is None:
        def local_scan(ops, q, valid):
            offset = shard_index() * shard_rows
            local_valid = jnp.clip(valid - offset, 0, shard_rows)
            vals, idxs = scan(*ops, q, local_valid, k=k)
            idxs = jnp.where(idxs < 2**31 - 1, idxs + offset, idxs)
            return merged(vals, idxs)

        fn = shard_map(
            local_scan, mesh=mesh,
            in_specs=(op_specs, P(None, None), P()),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
        return fn(operands, jnp.asarray(queries, jnp.float32),
                  jnp.asarray(valid_count, jnp.int32))

    def local_scan_perm(ops, perm_shard, q, valid):
        vals, idxs = scan(*ops, q, valid, k=k, perm=perm_shard)
        return merged(vals, idxs)

    fn = shard_map(
        local_scan_perm, mesh=mesh,
        in_specs=(op_specs, _vec_spec(mesh), P(None, None), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(operands, perm, jnp.asarray(queries, jnp.float32),
              jnp.asarray(valid_count, jnp.int32))


def sharded_cosine_topk(emb: jax.Array, queries: jax.Array, valid_count,
                        *, k: int, mesh: Mesh, impl: str = "exact",
                        perm=None) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a corpus-sharded matrix.

    Args:
        emb: ``[N_pad, D]`` f32/bf16, sharded ``P('corpus', None)``.
        queries: ``[B, D]`` normalized queries (replicated).
        valid_count: scalar int32 — global number of live rows.
        k: static, ≤ MAX_K ("exact") / APPROX_FETCH_CAP (candidate impls).
        perm: optional sharded mirror permutation (candidate impls).

    Returns replicated ``(scores [B, k], global_indices [B, k] i32)``;
    exact impl results are descending-stable.
    """
    return _sharded_topk((emb,), queries, valid_count, perm, k=k,
                         mesh=mesh, impl=impl, int8=False)


def multislice_cosine_topk(emb: jax.Array, queries: jax.Array, valid_count,
                           *, k: int, mesh: Mesh, impl: str = "exact",
                           perm=None) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a corpus sharded across slices: per-shard scan → ICI
    merge within each slice → DCN merge of the slice winners. Args match
    :func:`sharded_cosine_topk`; ``emb`` is sharded
    ``P(('dcn', 'corpus'), None)`` over a 2-D multi-slice mesh."""
    return _sharded_topk((emb,), queries, valid_count, perm, k=k,
                         mesh=mesh, impl=impl, int8=False)


def sharded_cosine_topk_int8(codes: jax.Array, scales: jax.Array,
                             queries: jax.Array, valid_count,
                             *, k: int, mesh: Mesh, impl: str = "exact",
                             perm=None) -> Tuple[jax.Array, jax.Array]:
    """Int8 variant of the sharded scan: per-shard quantized scan + ICI
    merge. Same candidate semantics as cosine_topk_int8 (callers re-rank
    in f32 for exact final ordering)."""
    return _sharded_topk((codes, scales), queries, valid_count, perm,
                         k=k, mesh=mesh, impl=impl, int8=True)


def multislice_cosine_topk_int8(codes: jax.Array, scales: jax.Array,
                                queries: jax.Array, valid_count,
                                *, k: int, mesh: Mesh, impl: str = "exact",
                                perm=None) -> Tuple[jax.Array, jax.Array]:
    """Int8 hierarchical variant: per-shard quantized scan → ICI merge →
    DCN merge. Candidate semantics match cosine_topk_int8 (callers
    re-rank in f32)."""
    return _sharded_topk((codes, scales), queries, valid_count, perm,
                         k=k, mesh=mesh, impl=impl, int8=True)
