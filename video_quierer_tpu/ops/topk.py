"""Fused cosine-similarity top-k over an HBM-resident embedding matrix.

This is the TPU-native replacement for the reference's brute-force scan
(``SimpleVideoIndex.search``, video_search_overhaul.py:40-64: ``np.vstack`` →
``np.dot`` → full ``np.argsort[::-1][:k]``) and for the HNSW graph walk of the
dead path (src/indexes/hnsw.py) — an exact scan that reads the embedding
matrix once at HBM bandwidth.

Design
------
Two stages:

1. **Block scan** (Pallas on TPU, XLA elsewhere): grid over row blocks of the
   ``[N_pad, D]`` matrix. Each step computes ``scores = E_blk @ Q^T`` on the
   MXU and maintains a per-block top-k in VMEM (iterative max+mask — k is
   small, ≤ MAX_K). Only ``[n_blocks, B, k]`` candidates ever leave the chip's
   compute pipeline, so HBM traffic ≈ one read of E.
2. **Merge** (tiny XLA op): top-k over the concatenated block candidates.

Ordering semantics
------------------
Results are *descending-stable*: sorted by score descending, ties broken by
**lowest index first**. The reference's tie order is unspecified (NumPy
quicksort); ours is deterministic. Both stages preserve it:

- within a block, rank ``j`` picks the lowest-index maximum;
- blocks are concatenated in ascending index order, so ``lax.top_k``'s
  lowest-position-first tie rule recovers the global order.

Rows at index ``>= valid_count`` (capacity padding) are masked to ``-inf``;
the caller trims trailing ``-inf`` entries when ``valid_count < k``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_quierer_tpu.utils.env import use_pallas

# Set VQT_PALLAS_INTERPRET=1 to run the Pallas kernels in interpreter mode
# (exercises the kernel logic in the CPU test suite).
import os as _os

def _pallas_mode() -> str:
    if _os.environ.get("VQT_PALLAS_INTERPRET") == "1":
        return "interpret"
    return "compiled" if use_pallas() else "off"

# Row-block size for the Pallas scan. 1024 rows × 512 dims × 4 B = 2 MiB per
# block buffer — small enough for double-buffering in VMEM, large enough to
# amortize per-step overhead (measured on v5e at 2M rows: 1024 beats 512 by
# 1.4× and matches 2048). VQT_BLOCK_ROWS overrides for tuning on direct
# hardware (must divide the index's capacity chunking).
BLOCK_ROWS = int(_os.environ.get("VQT_BLOCK_ROWS", "1024"))

# Scoring engine for the single-query (B=1) kernel path. The MXU matmul
# pads the 1-column rhs to a full 128-lane tile AND (for f32 exactness)
# runs multi-pass fp32 emulation; an exact f32 VPU multiply+lane-reduce
# avoids both. Measured on v5e over the 2M×512 corpus (pipelined,
# completion-forced): 13.6 ms/q VPU vs 18.8 ms/q MXU, identical results.
# VQT_SCAN_VPU=0 restores the MXU path.
SCAN_VPU_B1 = _os.environ.get("VQT_SCAN_VPU", "1") == "1"

# MXU contract precision for batched (B>1) f32 scans. "highest" (the
# default) is exact to 1e-6 vs the NumPy oracle via multi-pass fp32
# emulation; "default" is single-pass bf16 — measured 1.47× faster on
# v5e (19.96 → 13.62 ms per 16-query batch over 2M×512) at ~1e-2 score
# drift, which can flip near-tied ranks. Opt in per deployment with
# VQT_SCAN_PRECISION=default when throughput beats exact tie ordering.
_SCAN_PRECISION_F32 = (
    jax.lax.Precision.DEFAULT
    if _os.environ.get("VQT_SCAN_PRECISION", "highest") == "default"
    else jax.lax.Precision.HIGHEST)
# Upper bound on k (reference API caps k at 50, routes.py:58).
MAX_K = 64

# Python literal so Pallas kernels don't capture a traced constant.
NEG_INF = float("-inf")


def _block_topk_body(scores: jax.Array, row_ids: jax.Array, k: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Iterative top-k of ``scores [R, B]`` along axis 0.

    Returns ``(vals [B, k], idxs [B, k])`` with lowest-row-first tie breaking.
    Pure jnp — usable both inside a Pallas kernel and as plain XLA.
    """
    B = scores.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)
    vals0 = jnp.full((B, k), NEG_INF, dtype=jnp.float32)
    idxs0 = jnp.full((B, k), jnp.int32(2**31 - 1), dtype=jnp.int32)

    def body(j, carry):
        s, vals, idxs = carry
        m = jnp.max(s, axis=0)  # [B]
        # argmax with lowest-row-first ties
        is_max = s == m[None, :]
        cand = jnp.where(is_max, row_ids, jnp.int32(2**31 - 1))
        am = jnp.min(cand, axis=0)  # [B]
        sel = col_ids == j
        vals = jnp.where(sel, m[:, None], vals)
        idxs = jnp.where(sel, am[:, None], idxs)
        s = jnp.where(row_ids == am[None, :], NEG_INF, s)
        return s, vals, idxs

    _, vals, idxs = jax.lax.fori_loop(0, k, body, (scores, vals0, idxs0))
    return vals, idxs


_LANES = 128


def _block_topk_flat(scores: jax.Array, row_ids: jax.Array, k: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Single-query (B=1) top-k with full VPU lane utilization.

    ``_block_topk_body`` reduces ``[R, 1]`` arrays — 1 of 128 lanes live,
    and the k-iteration loop dominates the scan's critical path at
    serving batch sizes. Reshaping the score column to ``[R/128, 128]``
    puts every lane to work: each of the k rounds is a full-array max, a
    tie-breaking full-array min over candidate row ids, and one mask
    store, all on a 128-lane-wide layout (~16× fewer VPU cycles).
    Same descending-stable (lowest-row-first) semantics.
    """
    r = scores.shape[0]
    s = scores.reshape(r // _LANES, _LANES)
    rid = row_ids.reshape(r // _LANES, _LANES)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    vals0 = jnp.full((1, k), NEG_INF, dtype=jnp.float32)
    idxs0 = jnp.full((1, k), jnp.int32(2**31 - 1), dtype=jnp.int32)

    def body(j, carry):
        s, vals, idxs = carry
        m = jnp.max(s)
        cand = jnp.where(s == m, rid, jnp.int32(2**31 - 1))
        am = jnp.min(cand)
        sel = col_ids == j
        vals = jnp.where(sel, m, vals)
        idxs = jnp.where(sel, am, idxs)
        s = jnp.where(rid == am, NEG_INF, s)
        return s, vals, idxs

    _, vals, idxs = jax.lax.fori_loop(0, k, body, (s, vals0, idxs0))
    return vals, idxs


def _block_topk(scores: jax.Array, row_ids: jax.Array, k: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Dispatch: flat lane-packed selection for B=1 when the block is a
    multiple of 128 rows; generic column selection otherwise."""
    if scores.shape[1] == 1 and scores.shape[0] % _LANES == 0:
        return _block_topk_flat(scores[:, 0], row_ids[:, 0], k)
    return _block_topk_body(scores, row_ids, k)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _scan_kernel(valid_ref, emb_ref, qt_ref, vals_ref, idxs_ref, *, k: int):
    """One grid step: score a row block against all queries, emit block top-k.

    valid_ref : SMEM scalar-prefetch, [1] int32 — number of valid rows.
    emb_ref   : VMEM [BLOCK_ROWS, D] f32 — row block of the matrix.
    qt_ref    : VMEM [D, B] f32 — normalized queries, transposed.
    vals_ref  : VMEM [1, B, k] f32 out block.
    idxs_ref  : VMEM [1, B, k] i32 out block.
    """
    i = pl.program_id(0)
    blk = emb_ref.shape[0]
    b = qt_ref.shape[1]
    # f32 inputs: HIGHEST precision (full-f32 MXU passes — free, the scan
    # is HBM-bound, and scores stay within 1e-6 of the NumPy oracle; the
    # default bf16x1 drifts ~4e-3, enough to flip near-tied ranks).
    # bf16 inputs: default precision — Mosaic rejects fp32 contract
    # precision on a bf16 lhs, and bf16 mode trades exactness for
    # bandwidth anyway (accumulation stays f32).
    if b == 1 and SCAN_VPU_B1:
        # exact f32 elementwise multiply + lane reduction — no 128-lane
        # rhs padding, no fp32 MXU emulation passes
        q = qt_ref[:][:, 0]
        scores = jnp.sum(emb_ref[:].astype(jnp.float32) * q[None, :],
                         axis=1, keepdims=True)
    else:
        precision = (_SCAN_PRECISION_F32
                     if emb_ref.dtype == jnp.float32 else None)
        scores = jnp.dot(emb_ref[:], qt_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=precision)
    local_rows = jax.lax.broadcasted_iota(jnp.int32, (blk, b), 0)
    row_ids = local_rows + i * blk
    scores = jnp.where(row_ids < valid_ref[0], scores, NEG_INF)
    vals, idxs = _block_topk(scores, row_ids, k)
    vals_ref[0] = vals
    idxs_ref[0] = idxs


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_block_scan(emb: jax.Array, qt: jax.Array, valid_count: jax.Array,
                       *, k: int, interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    n_pad, d = emb.shape
    b = qt.shape[1]
    n_blocks = n_pad // BLOCK_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, k), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, b, k), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * d * 4 + d * b * 4 + 2 * n_blocks * b * k * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), emb, qt)
    return vals, idxs


def _scan_kernel_int8(valid_ref, emb_ref, scales_ref, qt_ref, vals_ref,
                      idxs_ref, *, k: int):
    """Int8 variant: codes upcast to bf16 in VMEM, scores rescaled by the
    per-row f32 scale. HBM reads 1 byte/element — the point of the mode."""
    i = pl.program_id(0)
    blk = emb_ref.shape[0]
    b = qt_ref.shape[1]
    codes = emb_ref[:].astype(jnp.bfloat16)
    scores = jnp.dot(codes, qt_ref[:].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    scores = scores * scales_ref[:]  # [blk, 1] broadcast
    local_rows = jax.lax.broadcasted_iota(jnp.int32, (blk, b), 0)
    row_ids = local_rows + i * blk
    scores = jnp.where(row_ids < valid_ref[0], scores, NEG_INF)
    vals, idxs = _block_topk(scores, row_ids, k)
    vals_ref[0] = vals
    idxs_ref[0] = idxs


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_block_scan_int8(emb_i8: jax.Array, scales: jax.Array,
                            qt: jax.Array, valid_count: jax.Array,
                            *, k: int, interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    n_pad, d = emb_i8.shape
    b = qt.shape[1]
    n_blocks = n_pad // BLOCK_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, k), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel_int8, k=k),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, b, k), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, b, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * d + n_pad * 4 + d * b * 4
            + 2 * n_blocks * b * k * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), emb_i8, scales, qt)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("k",))
def _xla_scan_int8(emb_i8: jax.Array, scales: jax.Array, qt: jax.Array,
                   valid_count: jax.Array, *, k: int
                   ) -> Tuple[jax.Array, jax.Array]:
    scores = jnp.dot(qt.T.astype(jnp.bfloat16),
                     emb_i8.T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # [B, N]
    scores = scores * scales[:, 0][None, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(rows < valid_count, scores, NEG_INF)
    k_eff = min(k, emb_i8.shape[0])
    vals, idxs = jax.lax.top_k(scores, k_eff)
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        idxs = jnp.pad(idxs, pad, constant_values=2**31 - 1)
    return vals, idxs.astype(jnp.int32)


def cosine_topk_int8(emb_i8: jax.Array, scales: jax.Array,
                     queries: jax.Array, valid_count, *, k: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k over an int8-quantized matrix (see quantize.py).

    Same interface/ordering semantics as :func:`cosine_topk`; scores carry
    int8 quantization error (~1e-2 relative), so callers wanting exact
    ordering re-rank the candidates in f32 (DeviceVideoIndex does).
    """
    if k <= 0 or k > MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")
    squeeze = queries.ndim == 1
    if squeeze:
        queries = queries[None, :]
    valid_count = jnp.asarray(valid_count, jnp.int32)
    qt = jnp.asarray(queries, jnp.float32).T
    mode = _pallas_mode()
    if mode != "off" and emb_i8.shape[0] % BLOCK_ROWS == 0 \
            and emb_i8.shape[0] > 0:
        bvals, bidxs = _pallas_block_scan_int8(
            emb_i8, scales, qt, valid_count, k=k,
            interpret=(mode == "interpret"))
        n_blocks, b, _ = bvals.shape
        cand_vals = jnp.transpose(bvals, (1, 0, 2)).reshape(b, n_blocks * k)
        cand_idxs = jnp.transpose(bidxs, (1, 0, 2)).reshape(b, n_blocks * k)
        vals, idxs = merge_topk(cand_vals, cand_idxs, k=k)
    else:
        vals, idxs = _xla_scan_int8(emb_i8, scales, qt, valid_count, k=k)
    if squeeze:
        return vals[0], idxs[0]
    return vals, idxs


# ---------------------------------------------------------------------------
# Portable XLA path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def _xla_scan(emb: jax.Array, qt: jax.Array, valid_count: jax.Array,
              *, k: int) -> Tuple[jax.Array, jax.Array]:
    n_pad = emb.shape[0]
    precision = (jax.lax.Precision.HIGHEST
                 if emb.dtype == jnp.float32 else None)
    scores = jnp.dot(qt.T, emb.T, preferred_element_type=jnp.float32,
                     precision=precision)  # [B, N]
    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(rows < valid_count, scores, NEG_INF)
    k_eff = min(k, n_pad)
    vals, idxs = jax.lax.top_k(scores, k_eff)  # stable: lowest index first
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        idxs = jnp.pad(idxs, pad, constant_values=2**31 - 1)
    return vals, idxs.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def merge_topk(vals: jax.Array, idxs: jax.Array, *, k: int
               ) -> Tuple[jax.Array, jax.Array]:
    """Merge candidate lists into a global top-k.

    ``vals``/``idxs``: ``[B, M]`` candidates. Candidate positions must be
    ordered so that, among equal values, lower global index comes first (true
    for block-scan output concatenated in ascending block order). Returns
    ``(vals [B, k], idxs [B, k])`` descending-stable by global index.
    """
    m = vals.shape[-1]
    k_eff = min(k, m)
    top_vals, pos = jax.lax.top_k(vals, k_eff)
    top_idxs = jnp.take_along_axis(idxs, pos, axis=-1)
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        top_vals = jnp.pad(top_vals, pad, constant_values=NEG_INF)
        top_idxs = jnp.pad(top_idxs, pad, constant_values=2**31 - 1)
    return top_vals, top_idxs


def cosine_topk(emb: jax.Array, queries: jax.Array, valid_count, *, k: int
                ) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k similarity scan: ``scores = E @ q`` per query.

    Args:
        emb: ``[N_pad, D]`` f32 matrix (rows beyond ``valid_count`` are
            capacity padding and are ignored). ``N_pad`` must be a multiple of
            ``BLOCK_ROWS`` on the Pallas path; the index layer guarantees it.
        queries: ``[B, D]`` or ``[D]`` — already normalized by the caller
            (the reference normalizes queries, not the matrix;
            video_search_overhaul.py:49-53).
        valid_count: scalar int — number of live rows.
        k: number of neighbours (static; ≤ MAX_K).

    Returns:
        ``(scores [B, k] f32, indices [B, k] i32)`` descending-stable.
        Entries past ``valid_count`` results have score ``-inf``.
    """
    if k <= 0 or k > MAX_K:
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")
    squeeze = queries.ndim == 1
    if squeeze:
        queries = queries[None, :]
    valid_count = jnp.asarray(valid_count, jnp.int32)
    emb = jnp.asarray(emb)
    if emb.dtype not in (jnp.float32, jnp.bfloat16):
        emb = emb.astype(jnp.float32)
    # queries follow the matrix dtype (bf16 mode halves the HBM read —
    # the scan's whole cost); accumulation stays f32 via
    # preferred_element_type in both scan paths.
    qt = jnp.asarray(queries).astype(emb.dtype).T  # [D, B]
    mode = _pallas_mode()
    if mode != "off" and emb.shape[0] % BLOCK_ROWS == 0 and emb.shape[0] > 0:
        bvals, bidxs = _pallas_block_scan(emb, qt, valid_count, k=k,
                                          interpret=(mode == "interpret"))
        n_blocks, b, _ = bvals.shape
        cand_vals = jnp.transpose(bvals, (1, 0, 2)).reshape(b, n_blocks * k)
        cand_idxs = jnp.transpose(bidxs, (1, 0, 2)).reshape(b, n_blocks * k)
        vals, idxs = merge_topk(cand_vals, cand_idxs, k=k)
    else:
        vals, idxs = _xla_scan(emb, qt, valid_count, k=k)
    if squeeze:
        return vals[0], idxs[0]
    return vals, idxs
