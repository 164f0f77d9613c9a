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
   ``[N_pad, D]`` matrix. Each step computes ``scores = E_blk @ Q^T`` (MXU
   for batched queries, exact f32 VPU multiply+reduce for B=1) and stashes
   them in a VMEM scratch; once every ``SELECT_BLOCKS`` steps the k-round
   selection runs over the whole macro-block of scores (*deferred
   selection*). The selection loop is the scan's main non-DMA cost — k
   sequential reduce rounds — so amortizing it over ``SELECT_BLOCKS`` blocks
   keeps each grid step under the block's HBM DMA time and the kernel
   bandwidth-bound. Only ``[n_macros, B, k]`` candidates leave the pipeline.
2. **Merge** (tiny XLA op): top-k over the concatenated macro candidates.

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
# avoids both (measured ~1.4× faster on v5e at 2M×512, identical
# results; the exact f32 B=1 scan runs 6.8 ms/q @ 607 GB/s with the
# settle-passed harness). VQT_SCAN_VPU=0 restores the MXU path.
SCAN_VPU_B1 = _os.environ.get("VQT_SCAN_VPU", "1") == "1"

# Number of row blocks whose scores accumulate in VMEM scratch before one
# k-round selection pass runs over the whole macro-block (deferred
# selection, see module docstring). Larger values amortize selection
# further at (s · BLOCK_ROWS · B · 4) bytes of scratch.
SELECT_BLOCKS = int(_os.environ.get("VQT_SELECT_BLOCKS", "8"))

# MXU contract precision for batched (B>1) f32 scans:
#   "highest" (default) — exact vs the NumPy oracle (multi-pass fp32
#       emulation; bf16x6).
#   "high"    — bf16x3 emulation, ~1e-6 score drift; can only flip ranks
#       tied within that.
#   "default" — single-pass bf16, ~1e-2 drift; flips near-tied ranks.
# Opt in per deployment with VQT_SCAN_PRECISION when throughput beats
# exact tie ordering.
_SCAN_PRECISION_F32 = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
}.get(_os.environ.get("VQT_SCAN_PRECISION", "highest"),
      jax.lax.Precision.HIGHEST)
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


# ---------------------------------------------------------------------------
# Pallas TPU kernel — deferred macro-block selection
# ---------------------------------------------------------------------------
#
# Scores for SELECT_BLOCKS consecutive row blocks accumulate in a VMEM
# scratch; the k-round selection loop runs ONCE per macro-block, on the
# last grid step that feeds it. Two scratch layouts:
#
# - B == 1 (``flat``): scratch [s, BLOCK_ROWS/128, 128] — the score column
#   re-tiled so all 8 sublanes × 128 lanes work in every selection round.
# - B >= 2 (``rows``): scratch [s, B, BLOCK_ROWS] — scores transposed to
#   query-major so each query's scores span full 128-lane tiles (the
#   [rows, B] layout would pad B lanes to 128 and waste 8×).


def _macro_topk_flat(sc, slot, macro_base, valid, k: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Selection over flat scratch ``sc [s, R, 128]`` (B=1).

    Element (t, r, c) holds the score of global row
    ``macro_base + t*R*128 + r*128 + c``. Slots > ``slot`` are stale
    (previous macro-block) and masked. Returns ``([1, k], [1, k])``.
    """
    shape = sc.shape
    blk = shape[1] * shape[2]
    slot_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    col_i = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    rid = macro_base + slot_i * blk + row_i * _LANES + col_i
    live = jnp.logical_and(slot_i <= slot, rid < valid)
    s0 = jnp.where(live, sc, NEG_INF)
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

    _, vals, idxs = jax.lax.fori_loop(0, k, body, (s0, vals0, idxs0))
    return vals, idxs


def _macro_topk_rows(sc, slot, macro_base, valid, k: int
                     ) -> Tuple[jax.Array, jax.Array]:
    """Selection over query-major scratch ``sc [s, B, blk]``.

    Element (t, q, c) holds query q's score for global row
    ``macro_base + t*blk + c``. Returns ``([B, k], [B, k])`` with the same
    descending-stable lowest-row-first semantics as `_block_topk_body`.
    """
    s_slots, b, blk = sc.shape
    slot_i = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 2)
    rid = macro_base + slot_i * blk + col_i
    live = jnp.logical_and(slot_i <= slot, rid < valid)
    s0 = jnp.where(live, sc, NEG_INF)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)
    vals0 = jnp.full((b, k), NEG_INF, dtype=jnp.float32)
    idxs0 = jnp.full((b, k), jnp.int32(2**31 - 1), dtype=jnp.int32)

    def body(j, carry):
        s, vals, idxs = carry
        m = jnp.max(s, axis=(0, 2))  # [B]
        cand = jnp.where(s == m[None, :, None], rid, jnp.int32(2**31 - 1))
        am = jnp.min(cand, axis=(0, 2))  # [B]
        sel = col_ids == j
        vals = jnp.where(sel, m[:, None], vals)
        idxs = jnp.where(sel, am[:, None], idxs)
        s = jnp.where(rid == am[None, :, None], NEG_INF, s)
        return s, vals, idxs

    _, vals, idxs = jax.lax.fori_loop(0, k, body, (s0, vals0, idxs0))
    return vals, idxs


# B=1 scoring layout. "flat" is the exact f32 VPU multiply+lane-reduce
# (SCAN_VPU_B1 above — avoids the MXU's fp32 multi-pass emulation,
# measured ~1.4× faster for f32). The round-2 hypothesis that the flat
# path's in-kernel bf16→f32 upcast explained the bf16 scan's 472 GB/s
# (vs f32's 607) was REFUTED by a per-dtype A/B of flat vs the
# rows/MXU layout (scan_bench --batch 1, back-to-back same session
# 2026-08-19 ~19:30-19:55): bf16 flat 4.34 ms vs rows 4.54; f32 flat
# 6.72 vs rows 7.29; int8 6.16 vs 6.18 (that window was heavily
# contended — int8 read 2.5× its recorded 2.46 ms in BOTH layouts, so
# only the within-session comparison stands). Flat stays the default
# for every dtype; VQT_SCAN_B1_LAYOUT=rows forces the MXU layout for
# future A/Bs. ``dtype`` is accepted so a per-dtype "auto" split can
# be reintroduced if different hardware measures differently.
_SCAN_B1_LAYOUT = _os.environ.get("VQT_SCAN_B1_LAYOUT", "auto")


def _use_flat_layout(b: int, dtype=jnp.float32) -> bool:
    del dtype  # auto resolved dtype-independent (see the A/B above)
    if b != 1 or not SCAN_VPU_B1 or BLOCK_ROWS % _LANES != 0:
        return False
    return _SCAN_B1_LAYOUT != "rows"


def _scan_kernel(valid_ref, emb_ref, qt_ref, vals_ref, idxs_ref, sc_ref,
                 *, k: int, s: int):
    """One grid step: score a row block, stash scores; select per macro.

    valid_ref : SMEM scalar-prefetch, [1] int32 — number of valid rows.
    emb_ref   : VMEM [BLOCK_ROWS, D] f32/bf16 — row block of the matrix.
    qt_ref    : VMEM [D, B] — normalized queries, transposed.
    vals_ref  : VMEM [1, B, k] f32 out block (one per macro-block).
    idxs_ref  : VMEM [1, B, k] i32 out block.
    sc_ref    : VMEM scratch — [s, R, 128] (B=1) or [s, B, BLOCK_ROWS].
    """
    i = pl.program_id(0)
    blk = emb_ref.shape[0]
    b = qt_ref.shape[1]
    slot = jax.lax.rem(i, s)
    flat = _use_flat_layout(b, emb_ref.dtype)
    if flat:
        # exact f32 elementwise multiply + lane reduction — no 128-lane
        # rhs padding, no fp32 MXU emulation passes. The block is viewed
        # as [R, 128, D] (a free leading-dim split) so the lane reduction
        # lands DIRECTLY in the scratch's [R, 128] tile layout — scoring
        # into a [blk] column and reshaping would relayout lanes→sublanes
        # every step (measured 2.3× slower end-to-end on v5e).
        q = qt_ref[:][:, 0]
        e3 = emb_ref[:].astype(jnp.float32).reshape(
            blk // _LANES, _LANES, emb_ref.shape[1])
        sc_ref[slot] = jnp.sum(e3 * q[None, None, :], axis=2)
    else:
        # f32 inputs: HIGHEST precision by default (exact vs the NumPy
        # oracle; see _SCAN_PRECISION_F32 for the bf16x3/bf16x1 opt-ins).
        # bf16 inputs: default precision — Mosaic rejects fp32 contract
        # precision on a bf16 lhs, and bf16 mode trades exactness for
        # bandwidth anyway (accumulation stays f32).
        precision = (_SCAN_PRECISION_F32
                     if emb_ref.dtype == jnp.float32 else None)
        scores_t = jax.lax.dot_general(
            qt_ref[:], emb_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)  # [B, blk], query-major
        sc_ref[slot] = scores_t

    is_last = jnp.logical_or(slot == s - 1, i == pl.num_programs(0) - 1)

    @pl.when(is_last)
    def _():
        macro_base = (i - slot) * blk
        select = _macro_topk_flat if flat else _macro_topk_rows
        vals, idxs = select(sc_ref[:], slot, macro_base, valid_ref[0], k)
        vals_ref[0] = vals
        idxs_ref[0] = idxs


def _scan_grid_spec(d: int, b: int, k: int, n_blocks: int, s: int,
                    extra_in_specs=(), dtype=jnp.float32):
    """Grid spec shared by the f32/bf16 and int8 deferred-selection scans."""
    flat = _use_flat_layout(b, dtype)
    scratch = (pltpu.VMEM((s, BLOCK_ROWS // _LANES, _LANES), jnp.float32)
               if flat else
               pltpu.VMEM((s, b, BLOCK_ROWS), jnp.float32))
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            *extra_in_specs,
            pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, k), lambda i, *_: (i // s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, k), lambda i, *_: (i // s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[scratch],
    )


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _pallas_block_scan(emb: jax.Array, qt: jax.Array, valid_count: jax.Array,
                       *, k: int, interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    n_pad, d = emb.shape
    b = qt.shape[1]
    n_blocks = n_pad // BLOCK_ROWS
    s = max(1, min(SELECT_BLOCKS, n_blocks))
    n_macros = -(-n_blocks // s)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel, k=k, s=s),
        out_shape=[
            jax.ShapeDtypeStruct((n_macros, b, k), jnp.float32),
            jax.ShapeDtypeStruct((n_macros, b, k), jnp.int32),
        ],
        grid_spec=_scan_grid_spec(d, b, k, n_blocks, s, dtype=emb.dtype),
        interpret=interpret,
        # grid steps are order-dependent (scratch accumulates across
        # steps; the macro's last step selects), so the single grid
        # dimension must not be treated as reorderable
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * d * emb.dtype.itemsize + d * b * 4
            + 2 * n_macros * b * k * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), emb, qt)
    return vals, idxs


def _scan_kernel_int8(valid_ref, emb_ref, scales_ref, qt_ref, vals_ref,
                      idxs_ref, sc_ref, *, k: int, s: int):
    """Int8 variant of the deferred-selection scan: codes upcast in VMEM,
    scores rescaled by the per-row f32 scale. HBM reads 1 byte/element —
    the point of the mode. Same scratch layouts as `_scan_kernel`."""
    i = pl.program_id(0)
    blk = emb_ref.shape[0]
    b = qt_ref.shape[1]
    slot = jax.lax.rem(i, s)
    flat = _use_flat_layout(b, emb_ref.dtype)
    row_scale = scales_ref[:][:, 0]  # [blk]
    if flat:
        # B=1: exact f32 VPU multiply + lane reduce on the upcast codes
        q = qt_ref[:][:, 0]
        e3 = emb_ref[:].astype(jnp.float32).reshape(
            blk // _LANES, _LANES, emb_ref.shape[1])
        col = jnp.sum(e3 * q[None, None, :], axis=2)
        sc_ref[slot] = col * row_scale.reshape(blk // _LANES, _LANES)
    else:
        codes = emb_ref[:].astype(jnp.bfloat16)
        scores_t = jax.lax.dot_general(
            qt_ref[:].astype(jnp.bfloat16), codes,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [B, blk]
        sc_ref[slot] = scores_t * row_scale[None, :]

    is_last = jnp.logical_or(slot == s - 1, i == pl.num_programs(0) - 1)

    @pl.when(is_last)
    def _():
        macro_base = (i - slot) * blk
        select = _macro_topk_flat if flat else _macro_topk_rows
        vals, idxs = select(sc_ref[:], slot, macro_base, valid_ref[0], k)
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
    s = max(1, min(SELECT_BLOCKS, n_blocks))
    n_macros = -(-n_blocks // s)
    scales_spec = pl.BlockSpec((BLOCK_ROWS, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    vals, idxs = pl.pallas_call(
        functools.partial(_scan_kernel_int8, k=k, s=s),
        out_shape=[
            jax.ShapeDtypeStruct((n_macros, b, k), jnp.float32),
            jax.ShapeDtypeStruct((n_macros, b, k), jnp.int32),
        ],
        grid_spec=_scan_grid_spec(d, b, k, n_blocks, s,
                                  extra_in_specs=(scales_spec,),
                                  dtype=emb_i8.dtype),
        interpret=interpret,
        # grid steps are order-dependent (scratch accumulates across
        # steps; the macro's last step selects), so the single grid
        # dimension must not be treated as reorderable
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * d + n_pad * 4 + d * b * 4
            + 2 * n_macros * b * k * 4,
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
# Candidate-stage top-k (bf16 / int8 mirrors)
# ---------------------------------------------------------------------------
#
# The bf16/int8 index modes never return device scores to the caller: they
# over-fetch CANDIDATES (k up to MAX_K) that DeviceVideoIndex re-ranks
# exactly in f32 against its host rows. The candidate set needs high
# recall, not exact order — so the exact kernel's k sequential selection
# rounds (the scan's only cost that grows with k: measured +2.6 ms going
# k=10→40 at 2M rows on v5e, both dtypes) buy nothing here.
#
# Three candidate-stage implementations (VQT_CANDIDATE_TOPK):
#
# - "fused" (default): a Pallas scan that selects candidates IN VMEM —
#   each grid step scores one row block on the MXU and keeps the top
#   CAND_ROUNDS rows of every CAND_BUCKET-row bucket; only
#   ``rounds · N/bucket`` (vals, host-row) pairs ever reach HBM. The
#   [B, N] score matrix the "approx" stage materializes (8 MB/query at
#   N=2M — ~1 GB of extra HBM traffic at the 64-way coalescing width,
#   ~3× the bf16 matrix read itself) never exists.
# - "approx": one XLA matmul + the TPU's hardware ApproxTopK partial
#   reduction (jax.lax.approx_max_k) over materialized [B, N] scores.
#   The fallback whenever the fused kernel's shape rules don't hold.
# - "pallas": the exact deferred-selection scan (cosine_topk) — exact
#   candidates, k serial selection rounds.
#
# Both bucketed stages (fused's in-kernel buckets, approx's hardware
# buckets) take per-bucket winners over CONTIGUOUS mirror rows, so
# near-ties of adjacent rows can collide in one bucket and drop a true
# top-k row — exactly the adversarial case for video corpora, where
# near-duplicate frames are adjacent. The structural fix lives in the
# index layer: the bf16/int8 device mirrors are stored under a fixed
# pseudo-random row PERMUTATION (index/device_index.py), scattering
# near-duplicates across buckets, and every candidate scan here takes a
# ``perm`` column (mirror row → host row) used for both validity
# masking (``perm[row] < valid_count``) and emitting host indices
# directly. With the permutation, a true top-k row is lost only if
# ``rounds`` strictly-better rows land in its bucket by chance:
# P(miss, rank r) ≈ (r · bucket / N)^rounds ≈ 2.6e-5 at r=10,
# bucket=1024, N=2M, rounds=2 — engine recall@10 is 1.000 at default
# knobs with no recall-knob escape hatch needed.


def _candidate_mode() -> str:
    return _os.environ.get("VQT_CANDIDATE_TOPK", "fused")


def _approx_recall() -> float:
    # 0.99 costs the same as 0.95 on v5e (3.70 vs 3.73 ms/q at 2M rows).
    return float(_os.environ.get("VQT_APPROX_RECALL", "0.99"))


# Candidate depth (over-fetch) for the re-ranked quantized modes.
# History: before the permuted mirror, bucketed selection over
# contiguous index ranges lost index-ADJACENT near-ties at shallow
# fetch (measured round 2 on a 100×2000-row clustered corpus: engine
# recall@10 0.980 at fetch=40 → 0.995 at fetch=256), which is why the
# default went deep. With the mirror permutation the adjacency failure
# mode is structural history; what fetch depth still buys is headroom
# against rows tied within the mirror dtype's RESOLUTION (~4e-3 bf16 /
# ~8e-3 int8), whose candidate ranking is arbitrary inside the tie
# band. The default is 128 (≥ 12× k at the reference k≤10): the
# re-rank gather is the cost that scales with fetch — measured v5e
# 2M×512 B=256 (decomp_bench 2026-08-18): 1.95 ms/batch at fetch 256 →
# 1.18 at 128 → 1.10 at 96 — and clustered-corpus engine recall@10 is
# 1.000 at fetch=128 on the same hardware (recall_bench, 2M rows, 64
# queries). VQT_RERANK_FETCH raises it for corpora with >100-deep
# exact ties; VQT_CANDIDATE_TOPK=pallas gives exact candidates.
APPROX_FETCH_CAP = 1024


def _approx_fetch(k: int) -> int:
    # clamped to >= k so an operator-set VQT_RERANK_FETCH below the
    # requested k can never shrink the result set
    return max(k, int(_os.environ.get("VQT_RERANK_FETCH",
                                      str(max(128, 4 * k)))))


# Rows per in-kernel selection bucket for the fused candidate scan, and
# winners kept per bucket. Candidate count = rounds * N / bucket
# (N=2M → 3,907/query at the defaults); miss probability for the true
# rank-r row on a PERMUTED mirror ≈ (r·bucket/N)^rounds — see the
# candidate-stage overview above. Default bucket 1024 (= one whole
# BLOCK_ROWS step): the selection's VPU cost is dominated by per-bucket
# reduction-op COUNT, not elements — measured at 2M×512 B=64 on v5e
# (round 3): bucket 256 → 5.24 ms/batch, 512 → 4.86, 1024 → 4.73
# (int8 3.89), vs the 3.96 ms pure bf16 matmul+rowmax floor. Miss
# probability at r=10, bucket=1024, rounds=2 is (10·1024/2M)² ≈ 2.6e-5 —
# engine clustered-corpus recall@10 stays 1.000.
CAND_BUCKET = int(_os.environ.get("VQT_CAND_BUCKET", "1024"))
CAND_ROUNDS = int(_os.environ.get("VQT_CAND_ROUNDS", "2"))

# Row-block size for the CANDIDATE kernels (decoupled from the exact
# scan's BLOCK_ROWS): the candidate mirrors are bf16/int8, so a 1024-row
# block is only 1 MB / 0.5 MB of DMA per grid step — too small for full
# HBM streaming efficiency on v5e. Measured at 2M×512, B=64, bucket=1024
# (round 3): bf16 4.73 (1024) → 4.41 (2048) → 4.32 ms/batch (4096);
# int8 3.89 → 3.19 → 2.95 (8192 gains nothing further: 2.91). The
# kernels sit ~0.3 ms over XLA's own bare matmul+rowmax at this shape
# (bf16 3.83 ms / int8 2.51 — measured round 3), i.e. selection is
# amortized and the matmul core itself is the wall. Must divide the
# index's capacity chunking (device_index.py sizes its growth chunk to
# cover this).
CAND_BLOCK_ROWS = int(_os.environ.get("VQT_CAND_BLOCK_ROWS", "4096"))

_IMAX = 2**31 - 1


def _approx_topk_from_scores(scores: jax.Array, valid_count: jax.Array,
                             *, k: int, recall: float, perm=None,
                             prefix: bool = False
                             ) -> Tuple[jax.Array, jax.Array]:
    """Mask capacity padding, hardware ApproxTopK, pad short results —
    the shared tail of both approx scans. With ``perm`` (mirror row →
    host row) validity masks on the host index and the returned indices
    are translated to host rows; under the live-PREFIX layout
    (``prefix=True``) liveness is positional and ``perm`` is only the
    output translation."""
    if perm is None or prefix:
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(rows < valid_count, scores, NEG_INF)
    else:
        scores = jnp.where((perm < valid_count)[None, :], scores, NEG_INF)
    k_eff = min(k, scores.shape[1])
    vals, idxs = jax.lax.approx_max_k(scores, k_eff, recall_target=recall)
    idxs = idxs.astype(jnp.int32)
    if perm is not None:
        idxs = jnp.take(perm, idxs, mode="fill", fill_value=_IMAX)
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        idxs = jnp.pad(idxs, pad, constant_values=_IMAX)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("k", "recall", "prefix"))
def _approx_scan(emb: jax.Array, queries: jax.Array,
                 valid_count: jax.Array, *, k: int, recall: float,
                 perm=None, prefix: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    # contract queries[B, D] with emb[N, D] on D without materializing a
    # transpose; f32 accumulation regardless of the mirror dtype
    scores = jax.lax.dot_general(
        queries.astype(emb.dtype), emb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, N]
    return _approx_topk_from_scores(scores, valid_count, k=k,
                                    recall=recall, perm=perm,
                                    prefix=prefix)


@functools.partial(jax.jit,
                   static_argnames=("k", "recall", "native", "prefix"))
def _approx_scan_int8(emb_i8: jax.Array, scales: jax.Array,
                      queries: jax.Array, valid_count: jax.Array,
                      *, k: int, recall: float, perm=None,
                      native: bool = False, prefix: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    if native:
        # native int8 MXU contract (VQT_INT8_MXU=native, the default):
        # queries symmetrically quantized on device, s8×s8→s32 matmul —
        # no bf16 upcast of the 1-byte/element read. The ~0.4% extra
        # relative candidate error is absorbed by the deep fetch + exact
        # f32 re-rank, same contract as the fused int8 kernel.
        qabs = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
        qscale = (qabs / 127.0).astype(jnp.float32)
        qsafe = jnp.where(qscale > 0, qscale, 1.0)
        q_i8 = jnp.clip(jnp.round(queries / qsafe), -127,
                        127).astype(jnp.int8)
        raw = jax.lax.dot_general(
            q_i8, emb_i8,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # [B, N] i32
        scores = raw.astype(jnp.float32) * qscale \
            * scales[:, 0][None, :]
    else:
        scores = jax.lax.dot_general(
            queries.astype(jnp.bfloat16), emb_i8.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [B, N]
        scores = scores * scales[:, 0][None, :]
    return _approx_topk_from_scores(scores, valid_count, k=k,
                                    recall=recall, perm=perm,
                                    prefix=prefix)


# -- int4 tier --------------------------------------------------------------
# Half int8's HBM traffic again (0.5 B/element): two 4-bit codes pack
# into one int8 byte in a SPLIT-HALVES layout — byte j of a row holds
# feature j in its low nibble and feature j + D/2 in its high nibble —
# so the in-kernel unpack yields two CONTIGUOUS [blk, D/2] code blocks
# (no lane interleave) and the score is two half-depth MXU dots:
#   score = lo · q[:D/2] + hi · q[D/2:]
# Exactness contract is the int8 one: candidates only feed the exact
# f32 re-rank, and the deep fetch absorbs the coarser (scale = max|row|
# / 7) quantization (recall_bench: recall@10 = 1.000 at default knobs).
# Exceeds /root/reference/src/indexes/hnsw.py's approximate recall at a
# fraction of its cost.


def _unpack_nibbles(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``[..., D/2] int8`` packed → ``(lo, hi)`` int8 nibbles, sign
    extended via arithmetic shifts (values in [-8, 7]; the quantizer
    only emits [-7, 7]). Shifts run in int32: hardware Mosaic does not
    legalize ``arith.shli`` on int8 vectors (measured round 4 — the
    interpreter accepts it)."""
    x = packed.astype(jnp.int32)
    lo = ((x << 28) >> 28).astype(jnp.int8)
    hi = (x >> 4).astype(jnp.int8)
    return lo, hi


@functools.partial(jax.jit,
                   static_argnames=("k", "recall", "native", "prefix"))
def _approx_scan_int4(packed: jax.Array, scales: jax.Array,
                      queries: jax.Array, valid_count: jax.Array,
                      *, k: int, recall: float, perm=None,
                      native: bool = False, prefix: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """Portable XLA int4 scan (materializes the unpacked codes, so it
    reads more than the Pallas kernel — correctness/fallback tier; the
    fused kernel unpacks in VMEM after the 0.5 B/element HBM read)."""
    half = packed.shape[1]
    lo, hi = _unpack_nibbles(packed)
    q_lo, q_hi = queries[:, :half], queries[:, half:]
    if native:
        qabs = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
        qscale = (qabs / 127.0).astype(jnp.float32)
        qsafe = jnp.where(qscale > 0, qscale, 1.0)
        dn = (((1,), (1,)), ((), ()))
        raw = (jax.lax.dot_general(
                   jnp.clip(jnp.round(q_lo / qsafe), -127,
                            127).astype(jnp.int8), lo,
                   dimension_numbers=dn,
                   preferred_element_type=jnp.int32)
               + jax.lax.dot_general(
                   jnp.clip(jnp.round(q_hi / qsafe), -127,
                            127).astype(jnp.int8), hi,
                   dimension_numbers=dn,
                   preferred_element_type=jnp.int32))
        scores = raw.astype(jnp.float32) * qscale * scales[:, 0][None, :]
    else:
        dn = (((1,), (1,)), ((), ()))
        scores = (jax.lax.dot_general(
                      q_lo.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
                      dimension_numbers=dn,
                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(
                      q_hi.astype(jnp.bfloat16), hi.astype(jnp.bfloat16),
                      dimension_numbers=dn,
                      preferred_element_type=jnp.float32))
        scores = scores * scales[:, 0][None, :]
    return _approx_topk_from_scores(scores, valid_count, k=k,
                                    recall=recall, perm=perm,
                                    prefix=prefix)


# ---------------------------------------------------------------------------
# Fused candidate scan — in-VMEM bucket selection, no [B, N] score matrix
# ---------------------------------------------------------------------------


# Selection algorithm for the fused candidate kernels:
#   "packb" (default) — "pack" with BIASED keys: cosine scores (the
#       candidate-stage contract — normalized rows × normalized queries,
#       |score| ≤ ~1 + quantization error) are shifted by +2.0 into the
#       all-positive float range, where the raw bit pattern IS the
#       sortable int32 key — the sign-fix compare/xor/select passes of
#       "pack" and the kernel's separate dead-row -inf masking pass both
#       collapse into ONE fused select in key space (dead rows → key 0,
#       below every live biased key). Packing floors the low
#       ``ceil_log2(bucket)`` mantissa bits of (score + 2.0): absolute
#       selection resolution 2.4-4.9e-4 at bucket=1024 — still ~8-16×
#       finer than the bf16 mirror's own ~4e-3 score resolution, so the
#       candidate contract is unchanged (candidates only feed the exact
#       f32 re-rank). PRECONDITION: scores > -2 (any cosine is).
#   "pack" — unbiased sortable keys (monotone sign-fix map), exact
#       selection resolution ~1.2e-4; for corpora whose "scores" are not
#       cosines. Measured v5e 2M×512 B=256 (probe round 3) vs "iter":
#       bf16 scan 8.94 → 5.10 ms/batch, int8 7.69 → 3.94.
#   "iter" — the two-phase max / masked-iota-argmin rounds (~6 VPU
#       reduce passes per element vs pack's ~2); the portable fallback.
#   "packb2" (opt-in SPEED knob) — two-level packb (col orientation
#       only): a
#       progressive contiguous-half fold collapses groups of 8 rows to
#       one (in-group position packed into the low 3 key bits during
#       the fold — no iota operand), and the bucket key-adjust/max/mask
#       rounds then run on the 8x smaller group surface with the group
#       position at bits 3..9 — same 10-bit floor as packb. Measured
#       same-window A/B on v5e (2026-08-20 ~14:10-14:28, 2M x 256):
#       bf16@col 5.14 vs packb 5.36 ms/batch, int4@col 6.10 vs 6.57.
#       Row-orientation callers and non-pow2 block/bucket shapes fall
#       back to packb keys (_bucket_select_cols2 preconditions).
#       NOT the default: the group fold discards a same-group-of-8
#       runner-up BEFORE the rounds, weakening the adversarial
#       exactness tail to ~1.5e-4 lost-row probability per top-10
#       query at 2M rows (vs packb's ~1e-6 double-collision tail) —
#       one imperfect top-10 per ~6,600 queries in exchange for ~4%
#       scan time. Operators who want that trade set
#       VQT_CAND_SELECT=packb2; the default keeps the stronger
#       contract (toy-scale pins: tests/test_permuted_mirror.py).
def _cand_select() -> str:
    return _os.environ.get("VQT_CAND_SELECT", "packb")

# Key-space bias for "packb": live scores land in [1, 3] (all-positive
# floats, whose int32 bit patterns sort like the floats); dead keys are
# 0. Unpacked winners subtract it back out.
_KEY_BIAS = 2.0


def _sortable_keys(sc: jax.Array) -> jax.Array:
    """Monotone f32 → int32 map (signed-compare order == float order)."""
    bits = jax.lax.bitcast_convert_type(sc, jnp.int32)
    return jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)


def _bucket_select_rows(sc, live, base, vals_ref, idxs_ref, *,
                        rounds: int, bucket: int,
                        select: str = None):
    """Per-bucket top-``rounds`` selection over query-major scores.

    ``sc [B, blk]`` f32 raw block scores; ``live [1, blk]`` bool marks
    rows below the valid count (dead/pad rows must never be emitted as
    candidates); ``base`` = this grid step's global row offset. Buckets
    are contiguous ``bucket``-lane ranges; each bucket's top ``rounds``
    winners are assembled into ``[B, rounds·nb]`` (vals) + their global
    MIRROR positions (idxs). Callers translate mirror positions to host
    rows through the permutation OUTSIDE the kernel (``_cand_merge``).
    Ties within a bucket break to the lowest mirror position (exact
    under "iter"; under "pack"/"packb" scores are first floored to the
    packing resolution, so rows within ~1e-4 tie-break together — see
    ``_cand_select``).

    Hardware-Mosaic rules this shape is built around (found by probing
    the real lowering — interpreter mode accepts every rejected form):
    reductions keep a size-1 trailing axis (keepdims; multi-trailing-
    axis and rank-reducing forms are rejected), and selection compares
    against a FRESH position iota per bucket — broadcasting a
    lane-offset slice of an id row is an invalid vector layout, which is
    why the kernel emits positions, not ids.
    """
    b, blk = sc.shape
    nb = blk // bucket
    w = rounds * nb
    mode = select if select is not None else _cand_select()
    if mode == "packb2":
        mode = "packb"   # two-level is col-orientation only (see doc)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    vals = jnp.full((b, w), NEG_INF, jnp.float32)
    idxs = jnp.full((b, w), jnp.int32(_IMAX), jnp.int32)
    if mode in ("pack", "packb"):
        pbits = max((bucket - 1).bit_length(), 1)
        lowmask = (1 << pbits) - 1
        if mode == "packb":
            # biased keys: one fused select does dead-row masking AND
            # the float→sortable-int map (see _cand_select)
            keys = jnp.where(
                live,
                jax.lax.bitcast_convert_type(sc + jnp.float32(_KEY_BIAS),
                                             jnp.int32),
                jnp.int32(0))                            # [B, blk] i32
        else:
            keys = _sortable_keys(
                jnp.where(live, sc, NEG_INF))            # [B, blk] i32
        for j in range(nb):                              # static, small
            kj = keys[:, j * bucket:(j + 1) * bucket]
            pos = jax.lax.broadcasted_iota(jnp.int32, (b, bucket), 1)
            # floor to packing resolution, pack (lowmask - pos) so the
            # LOWEST position wins max among packed-equal scores; the
            # addend <= lowmask can't carry past the cleared bits
            kj = (kj & jnp.int32(~lowmask)) + (jnp.int32(lowmask) - pos)
            for r in range(rounds):
                wk = jnp.max(kj, axis=-1, keepdims=True)   # [B, 1]
                p = jnp.int32(lowmask) - (wk & jnp.int32(lowmask))
                vb = wk & jnp.int32(~lowmask)
                if mode == "packb":
                    # vb == 0 ⇔ every row in the bucket is dead (live
                    # biased keys are ≥ bitcast(1.0) ≫ lowmask)
                    v = jnp.where(
                        vb == 0, NEG_INF,
                        jax.lax.bitcast_convert_type(vb, jnp.float32)
                        - jnp.float32(_KEY_BIAS))
                else:
                    v = jax.lax.bitcast_convert_type(
                        jnp.where(vb < 0, vb ^ jnp.int32(0x7FFFFFFF), vb),
                        jnp.float32)
                    # an all-dead bucket's floored -inf key unpacks to
                    # NaN; emit -inf so the merge can never promote it
                    v = jnp.where(jnp.isnan(v), NEG_INF, v)
                sel = col_ids == (r * nb + j)
                vals = jnp.where(sel, v, vals)
                idxs = jnp.where(sel, base + j * bucket + p, idxs)
                if r + 1 < rounds:
                    kj = jnp.where(kj == wk, jnp.int32(-2**31), kj)
    else:
        sc = jnp.where(live, sc, NEG_INF)
        for j in range(nb):                              # static, small
            sj = sc[:, j * bucket:(j + 1) * bucket]      # [B, bucket]
            pos = jax.lax.broadcasted_iota(jnp.int32, (b, bucket), 1)
            for r in range(rounds):
                m = jnp.max(sj, axis=-1, keepdims=True)  # [B, 1]
                cand = jnp.where(sj == m, pos, jnp.int32(_IMAX))
                ap = jnp.min(cand, axis=-1, keepdims=True)   # [B, 1]
                sel = col_ids == (r * nb + j)
                vals = jnp.where(sel, m, vals)
                idxs = jnp.where(sel, base + j * bucket + ap, idxs)
                if r + 1 < rounds:
                    sj = jnp.where(pos == ap, NEG_INF, sj)
    vals_ref[0] = vals
    idxs_ref[0] = idxs


# Two-level selection group: one native f32 sublane tile. 8 rows fold
# into one in a single pass, so the per-bucket max/mask rounds run on an
# 8x smaller surface.
_GROUP = 8


def _bucket_select_cols2(sc, base, valid, vals_ref, idxs_ref, *,
                         rounds: int, bucket: int):
    """Two-level ``packb2`` selection (round-4 VERDICT item 1): the
    selection residual of the candidate scan is VPU passes over the
    whole ``[blk, B]`` score surface (bias/bitcast + per-bucket
    key-adjust + per-round max/mask). Here ONE full-surface pass packs
    the within-group-of-8 position into the low 3 key bits and folds
    each 8-sublane group to its max; every later pass (key-adjust,
    ``rounds`` maxes, the round-1 winner re-mask) runs on the 8×
    smaller ``[blk/8, B]`` group surface with the group position packed
    at bits 3..9.

    Key layout (bucket=1024): ``[score bits 31..10][group pos 9..3]
    [in-group pos 2..0]`` — the same 10 low mantissa bits ``packb``
    floors, so selection RESOLUTION is unchanged. A "group" is the 8
    rows ``{p + j·blk/8}`` (spaced, from the contiguous-half fold —
    see level 1 below); under the uniformly shuffled mirror any fixed
    equal-size partition is statistically equivalent, so the recall
    math is the adjacent-group one. Semantics deltas vs ``packb``,
    both confined to ~1e-4 near-ties that the exact f32 re-rank
    reorders anyway: round 2 returns the second-best GROUP winner
    (misses a same-group-of-8 runner-up: ~(r-1)·8/N adversarial tail
    under the permuted mirror, ≈4e-6/rank at 2M rows — same order as
    packb's bucket-collision tail), and ties floored to the pbits
    resolution break by (in-level-1 fine score, group pos, in-group
    pos) rather than globally lowest position.
    """
    blk, b = sc.shape
    G = _GROUP
    ng = blk // G
    nb = blk // bucket
    gpb = bucket // G
    w = rounds * nb
    pbits = max((bucket - 1).bit_length(), 1)
    gbits = (G - 1).bit_length()
    hbits = pbits - gbits
    glow = (1 << gbits) - 1
    hmask = ((1 << hbits) - 1) << gbits
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (w, b), 0)
    vals = jnp.full((w, b), NEG_INF, jnp.float32)
    idxs = jnp.full((w, b), jnp.int32(_IMAX), jnp.int32)
    live = (jax.lax.broadcasted_iota(jnp.int32, (blk, b), 0)
            + base) < valid
    keys = jnp.where(
        live,
        jax.lax.bitcast_convert_type(sc + jnp.float32(_KEY_BIAS),
                                     jnp.int32),
        jnp.int32(0))                                    # [blk, B] i32
    # level 1: pack in-group position, fold to the [blk/8, B] group
    # surface by CONTIGUOUS-HALF maxima (3 halvings: 2048+1024+512 rows
    # touched ≈ 0.9 of one full pass). Groups are therefore rows spaced
    # ng apart ({p + j·ng}), not adjacent rows — statistically
    # equivalent partitions under the uniformly shuffled mirror, and
    # the only forms hardware Mosaic lowers cheaply (a reshape-to-3D
    # fold measured 6.00 vs packb's 5.28 ms/256-batch; [i::8] strided
    # slices lower to rejected gathers / extract_strided_slice).
    # The in-group index j = row // ng packs PROGRESSIVELY during the
    # fold — the bottom half of each halving holds rows whose j is
    # larger by h/ng, so subtracting that delta from its packed low
    # bits (initialized to glow, so no borrow is possible) encodes j
    # without materializing a [blk, B] iota (which blew scoped VMEM by
    # 80 KB at 4096×256).
    g = (keys & jnp.int32(~glow)) | jnp.int32(glow)
    while g.shape[0] > ng:
        h = g.shape[0] // 2
        g = jnp.maximum(g[:h], g[h:] - jnp.int32(h // ng))  # → [ng, B]
    # level 2: bucket rounds over the group surface
    for j in range(nb):                                  # static, small
        gj = g[j * gpb:(j + 1) * gpb, :]
        gpos = jax.lax.broadcasted_iota(jnp.int32, (gpb, b), 0)
        gj = (gj & jnp.int32(~hmask)) \
            | ((jnp.int32(gpb - 1) - gpos) << gbits)
        for r in range(rounds):
            wk = jnp.max(gj, axis=0, keepdims=True)      # [1, B]
            gsel = jnp.int32(gpb - 1) - ((wk >> gbits)
                                         & jnp.int32((1 << hbits) - 1))
            pin = jnp.int32(glow) - (wk & jnp.int32(glow))
            vb = wk & jnp.int32(~((1 << pbits) - 1))
            v = jnp.where(
                vb == 0, NEG_INF,
                jax.lax.bitcast_convert_type(vb, jnp.float32)
                - jnp.float32(_KEY_BIAS))
            sel = row_ids == (r * nb + j)
            vals = jnp.where(sel, v, vals)
            # group entry e = j·gpb + gsel holds rows {e + j'·ng}; the
            # winner's in-group index rides the low bits
            idxs = jnp.where(sel,
                             base + j * gpb + gsel + pin * ng, idxs)
            if r + 1 < rounds:
                gj = jnp.where(gj == wk, jnp.int32(-2**31), gj)
    vals_ref[0] = vals
    idxs_ref[0] = idxs


def _cand_kernel(valid_ref, emb_ref, perm_ref, qt_ref, vals_ref, idxs_ref,
                 *, rounds: int, bucket: int, select: str = None):
    """One grid step of the fused candidate scan (f32/bf16 matrix):
    score a row block on the MXU, mask dead rows via the perm row, keep
    the top ``rounds`` of every ``bucket``-row bucket — scores never
    leave VMEM. No B=1 VPU special-case: the candidate mirrors are
    bf16/int8, so the matmul path has no fp32-emulation penalty and the
    1-column rhs only wastes MXU cycles the HBM-bound scan has spare.
    """
    valid = valid_ref[0]
    blk = emb_ref.shape[0]
    precision = (_SCAN_PRECISION_F32
                 if emb_ref.dtype == jnp.float32 else None)
    sc = jax.lax.dot_general(
        qt_ref[:], emb_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision)                            # [B, blk]
    # dead-row liveness from the HOST id carried by the perm row
    # ([1, blk] → [B, blk] is an offset-0 broadcast — hardware-valid);
    # masking itself happens inside the selection (key-fused in packb)
    _bucket_select_rows(sc, perm_ref[0] < valid, pl.program_id(0) * blk,
                        vals_ref, idxs_ref, rounds=rounds, bucket=bucket,
                        select=select)


def _cand_kernel_int8(valid_ref, emb_ref, scales_ref, perm_ref, qt_ref,
                      qscale_ref, vals_ref, idxs_ref, *, rounds: int,
                      bucket: int, native: bool, select: str = None):
    """Int8 fused candidate step. ``native=True`` contracts int8 codes
    against int8-quantized queries on the MXU (int32 accumulate — no
    upcast of the 1-byte/element HBM read), rescaling by
    row_scale · query_scale afterward; ``native=False`` upcasts both to
    bf16 (the portable contract). ``scales_ref [1, blk]`` lane-major,
    ``qscale_ref [B, 1]`` sublane-major — both already in the layout the
    ``[B, blk]`` score tensor broadcasts from (offset-0 broadcasts)."""
    valid = valid_ref[0]
    blk = emb_ref.shape[0]
    row_scale = scales_ref[0]                           # [1, blk]
    if native:
        raw = jax.lax.dot_general(
            qt_ref[:], emb_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)           # [B, blk] i32
        sc = raw.astype(jnp.float32) * row_scale * qscale_ref[:]
    else:
        raw = jax.lax.dot_general(
            qt_ref[:].astype(jnp.bfloat16),
            emb_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        sc = raw * row_scale
    _bucket_select_rows(sc, perm_ref[0] < valid, pl.program_id(0) * blk,
                        vals_ref, idxs_ref, rounds=rounds, bucket=bucket,
                        select=select)


# --------------------------------------------------------------------------
# Live-PREFIX mirror kernels
# --------------------------------------------------------------------------
#
# When the mirror's live rows occupy a shuffled PREFIX of the device
# buffer (DeviceVideoIndex's single-device layout: incremental
# Fisher–Yates appends keep mirror positions [0, count) a uniform random
# permutation of the host rows), liveness is ``position < valid_count``
# — pure iota, no perm column read in-kernel. That removes 4 B/row of
# HBM traffic AND unblocks the col-major ``[blk, B]`` matmul
# orientation, which the row-major form measured ~6% (bf16) / ~11%
# (int8) slower at B=256 but previously required a ``[blk, 1]``
# perm block that lane-pads to 2 MB of VMEM (ROADMAP round-3 probe).
# The perm column still exists — ``_merge_tail`` translates winner
# positions to host rows OUTSIDE the kernel, exactly as before.
#
# Orientation knob: "col" scores blocks as ``emb[blk,D] @ qt[D,B]``
# (selection reduces over sublanes), "row" keeps the query-major
# ``[B, blk]`` form of the perm kernels. Measured (v5e, 2M×512, B=256,
# decomp_bench 2026-08-18): bf16 col 5.05 vs row 5.50 ms/batch — but
# int8 col 6.55 vs row 4.70, because the int8 kernel's per-row scale
# multiply needs the scales as a lane-padded ``[blk, 1]`` operand whose
# lane-splat relayout costs more than the matmul orientation saves. So
# the default is per-dtype: col for bf16/f32 (no per-row operand left),
# row for int8. Col-major selection implements the "packb" key scheme
# only; other VQT_CAND_SELECT values force "row".
def _cand_orient(int8: bool = False) -> str:
    default = "row" if int8 else "col"
    mode = _os.environ.get("VQT_CAND_ORIENT", default)
    return mode if _cand_select() in ("packb", "packb2") \
        else "row"


def _bucket_select_cols(sc, base, valid, vals_ref, idxs_ref, *,
                        rounds: int, bucket: int,
                        select: str = None):
    """Block-major twin of :func:`_bucket_select_rows` (packb keys only).

    ``sc [blk, B]`` f32 raw block scores; liveness = global mirror
    position (``base`` + row) < ``valid`` — the live-prefix layout's
    contract. Buckets are contiguous ``bucket``-SUBLANE ranges; winners
    assemble into ``[rounds·nb, B]`` vals + global mirror positions.
    Reductions run over the sublane axis with a size-1 keepdims result
    (``[1, B]``), broadcast back over offset-0 — the forms the hardware
    Mosaic lowering accepts (validated in benchmarks/tpu_smoke.py).

    ``VQT_CAND_SELECT=packb2`` routes to the two-level variant
    (:func:`_bucket_select_cols2`), which folds 8-sublane groups first
    so the bucket rounds run on an 8× smaller surface.
    """
    blk0 = sc.shape[0]
    sel = select if select is not None else _cand_select()
    if (sel == "packb2" and bucket % _GROUP == 0
            and blk0 % _GROUP == 0
            and blk0 & (blk0 - 1) == 0
            and bucket & (bucket - 1) == 0):
        return _bucket_select_cols2(sc, base, valid, vals_ref, idxs_ref,
                                    rounds=rounds, bucket=bucket)
    blk, b = sc.shape
    nb = blk // bucket
    w = rounds * nb
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (w, b), 0)
    vals = jnp.full((w, b), NEG_INF, jnp.float32)
    idxs = jnp.full((w, b), jnp.int32(_IMAX), jnp.int32)
    pbits = max((bucket - 1).bit_length(), 1)
    lowmask = (1 << pbits) - 1
    live = (jax.lax.broadcasted_iota(jnp.int32, (blk, b), 0)
            + base) < valid
    keys = jnp.where(
        live,
        jax.lax.bitcast_convert_type(sc + jnp.float32(_KEY_BIAS),
                                     jnp.int32),
        jnp.int32(0))                                    # [blk, B] i32
    for j in range(nb):                                  # static, small
        kj = keys[j * bucket:(j + 1) * bucket, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (bucket, b), 0)
        kj = (kj & jnp.int32(~lowmask)) + (jnp.int32(lowmask) - pos)
        for r in range(rounds):
            wk = jnp.max(kj, axis=0, keepdims=True)      # [1, B]
            p = jnp.int32(lowmask) - (wk & jnp.int32(lowmask))
            vb = wk & jnp.int32(~lowmask)
            v = jnp.where(
                vb == 0, NEG_INF,
                jax.lax.bitcast_convert_type(vb, jnp.float32)
                - jnp.float32(_KEY_BIAS))
            sel = row_ids == (r * nb + j)
            vals = jnp.where(sel, v, vals)
            idxs = jnp.where(sel, base + j * bucket + p, idxs)
            if r + 1 < rounds:
                kj = jnp.where(kj == wk, jnp.int32(-2**31), kj)
    vals_ref[0] = vals
    idxs_ref[0] = idxs


def _cand_kernel_prefix(valid_ref, emb_ref, qt_ref, vals_ref, idxs_ref,
                        *, rounds: int, bucket: int, orient: str, select: str = None):
    """Fused candidate step over a live-prefix mirror (f32/bf16): no
    perm operand — liveness is position iota vs the valid count."""
    valid = valid_ref[0]
    blk = emb_ref.shape[0]
    base = pl.program_id(0) * blk
    precision = (_SCAN_PRECISION_F32
                 if emb_ref.dtype == jnp.float32 else None)
    if orient == "col":
        sc = jax.lax.dot_general(
            emb_ref[:], qt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                        # [blk, B]
        _bucket_select_cols(sc, base, valid, vals_ref, idxs_ref,
                            rounds=rounds, bucket=bucket, select=select)
    else:
        sc = jax.lax.dot_general(
            qt_ref[:], emb_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                        # [B, blk]
        live = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
                + base) < valid
        _bucket_select_rows(sc, live, base, vals_ref, idxs_ref,
                            rounds=rounds, bucket=bucket, select=select)


def _cand_kernel_int8_prefix(valid_ref, emb_ref, scales_ref, qt_ref,
                             qscale_ref, vals_ref, idxs_ref, *,
                             rounds: int, bucket: int, native: bool,
                             orient: str, select: str = None):
    """Int8 live-prefix candidate step. Col orientation takes the row
    scales as a ``[blk, 1]`` block (lane-padded — ~1 MB VMEM per 2048
    rows; the layout the perm column could not afford, but the scales
    are the ONLY per-row operand left) and the query scales lane-major
    ``[1, B]``; row orientation keeps the perm kernels' layouts."""
    valid = valid_ref[0]
    blk = emb_ref.shape[0]
    base = pl.program_id(0) * blk
    if orient == "col":
        row_scale = scales_ref[0]                       # [blk, 1]
        if native:
            raw = jax.lax.dot_general(
                emb_ref[:], qt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)       # [blk, B] i32
            sc = raw.astype(jnp.float32) * row_scale * qscale_ref[:]
        else:
            raw = jax.lax.dot_general(
                emb_ref[:].astype(jnp.bfloat16),
                qt_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc = raw * row_scale
        _bucket_select_cols(sc, base, valid, vals_ref, idxs_ref,
                            rounds=rounds, bucket=bucket, select=select)
    else:
        row_scale = scales_ref[0]                       # [1, blk]
        if native:
            raw = jax.lax.dot_general(
                qt_ref[:], emb_ref[:],
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)       # [B, blk] i32
            sc = raw.astype(jnp.float32) * row_scale * qscale_ref[:]
        else:
            raw = jax.lax.dot_general(
                qt_ref[:].astype(jnp.bfloat16),
                emb_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            sc = raw * row_scale
        live = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
                + base) < valid
        _bucket_select_rows(sc, live, base, vals_ref, idxs_ref,
                            rounds=rounds, bucket=bucket, select=select)


def _cand_merge(bvals: jax.Array, bidxs: jax.Array, perm: jax.Array,
                *, fetch: int) -> Tuple[jax.Array, jax.Array]:
    """Merge per-block bucket winners ``[n_blocks, B, w]`` to the global
    top-``fetch`` candidates and translate their mirror positions to
    host rows through ``perm``. ApproxTopK over the (already permuted,
    therefore unclustered) winner list at a 0.999 recall target — the
    list is ~N/bucket·rounds entries, so this is microseconds; exact
    top_k on CPU.

    The per-query regroup is a free-reshape sandwich around ONE clean 2D
    transpose: ``[n_blocks, B, w] → [n_blocks, B·w] →ᵀ [B·w, n_blocks] →
    [B, w·n_blocks]`` — row ``q`` of the result is exactly query ``q``'s
    winner set (block-minor order; candidate order is irrelevant to the
    top-``fetch`` reduction, and vals/idxs go through the same plan so
    they stay aligned). The direct ``transpose(1, 0, 2)`` with the w=8
    minor axis cost ~0.8 ms/batch at B=64, N=2M (strided 32-byte lines);
    the 2D form is XLA's canonical tiled transpose (measured round 3)."""
    n_blocks, b, w = bvals.shape
    cand_vals = bvals.reshape(n_blocks, b * w).T.reshape(b, w * n_blocks)
    cand_idxs = bidxs.reshape(n_blocks, b * w).T.reshape(b, w * n_blocks)
    return _merge_tail(cand_vals, cand_idxs, perm, fetch=fetch)


def _cand_merge_cols(bvals: jax.Array, bidxs: jax.Array, perm: jax.Array,
                     *, fetch: int) -> Tuple[jax.Array, jax.Array]:
    """:func:`_cand_merge` for block-major winner blocks ``[n_blocks, w,
    B]`` (the col-major kernels): one free reshape + one clean 2D
    transpose lands query-major directly."""
    n_blocks, w, b = bvals.shape
    cand_vals = bvals.reshape(n_blocks * w, b).T
    cand_idxs = bidxs.reshape(n_blocks * w, b).T
    return _merge_tail(cand_vals, cand_idxs, perm, fetch=fetch)


def _merge_tail(cand_vals: jax.Array, cand_idxs: jax.Array,
                perm: jax.Array, *, fetch: int
                ) -> Tuple[jax.Array, jax.Array]:
    k_eff = min(fetch, cand_vals.shape[1])
    vals, pos = jax.lax.approx_max_k(cand_vals, k_eff,
                                     recall_target=0.999)
    idxs = jnp.take_along_axis(cand_idxs, pos.astype(jnp.int32), axis=-1)
    # mirror position → host row (XLA-side [B, fetch] gather — the
    # kernel emits positions; see _bucket_select_rows)
    n_pad = perm.shape[0]
    idxs = jnp.where(idxs < n_pad,
                     jnp.take(perm, jnp.minimum(idxs, n_pad - 1)), _IMAX)
    if k_eff < fetch:
        pad = ((0, 0), (0, fetch - k_eff))
        vals = jnp.pad(vals, pad, constant_values=NEG_INF)
        idxs = jnp.pad(idxs, pad, constant_values=_IMAX)
    return vals, idxs


def _cand_out_specs(b: int, w: int):
    return [
        pl.BlockSpec((1, b, w), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, w), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


# perm rides as [n_blocks, CAND_BLOCK_ROWS] — one lane-major row per
# grid step, the same layout as the kernel's [B, blk] scores
# [n_blocks, 1, CAND_BLOCK_ROWS]: the leading axis is the grid split, so
# the LAST TWO block dims equal the array dims — the form the Pallas TPU
# lowering accepts for a 1-sublane row (a flat (1, CAND_BLOCK_ROWS)
# block over [n_blocks, CAND_BLOCK_ROWS] violates the /8-sublane rule).
_PERM_SPEC = pl.BlockSpec((1, 1, CAND_BLOCK_ROWS),
                          lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("fetch", "rounds", "bucket",
                                    "select", "interpret"))
def _pallas_cand_scan(emb: jax.Array, perm: jax.Array, queries: jax.Array,
                      valid_count: jax.Array, *, fetch: int, rounds: int,
                      bucket: int, select: str = None,
                             interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    n_pad, d = emb.shape
    b = queries.shape[0]
    qt = queries.astype(emb.dtype).T  # [D, B]
    n_blocks = n_pad // CAND_BLOCK_ROWS
    w = rounds * (CAND_BLOCK_ROWS // bucket)
    bvals, bidxs = pl.pallas_call(
        functools.partial(_cand_kernel, rounds=rounds, bucket=bucket,
                          select=select),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, b, w), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, b, w), jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((CAND_BLOCK_ROWS, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                _PERM_SPEC,
                pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=_cand_out_specs(b, w),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * (d * emb.dtype.itemsize + 4)
            + d * b * 4 + 2 * n_blocks * b * w * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), emb,
      perm.reshape(n_blocks, 1, CAND_BLOCK_ROWS), qt)
    return _cand_merge(bvals, bidxs, perm, fetch=fetch)


@functools.partial(jax.jit,
                   static_argnames=("fetch", "rounds", "bucket", "native",
                                    "select", "interpret"))
def _pallas_cand_scan_int8(codes: jax.Array, scales: jax.Array,
                           perm: jax.Array, queries: jax.Array,
                           valid_count: jax.Array, *, fetch: int,
                           rounds: int, bucket: int, native: bool,
                           select: str = None,
                             interpret: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    n_pad, d = codes.shape
    b = queries.shape[0]
    n_blocks = n_pad // CAND_BLOCK_ROWS
    w = rounds * (CAND_BLOCK_ROWS // bucket)
    if native:
        # symmetric per-query int8 quantization on device: the candidate
        # scores carry ~0.4% extra relative error, absorbed by the exact
        # f32 re-rank downstream
        qabs = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
        qscale = (qabs / 127.0).astype(jnp.float32)
        qsafe = jnp.where(qscale > 0, qscale, 1.0)
        qt = jnp.clip(jnp.round(queries / qsafe), -127,
                      127).astype(jnp.int8).T            # [D, B]
        qs = qscale                                      # [B, 1]
    else:
        qt = queries.astype(jnp.bfloat16).T
        qs = jnp.ones((b, 1), jnp.float32)
    scales_spec = pl.BlockSpec((1, 1, CAND_BLOCK_ROWS),
                               lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    bvals, bidxs = pl.pallas_call(
        functools.partial(_cand_kernel_int8, rounds=rounds, bucket=bucket,
                          native=native, select=select),
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, b, w), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, b, w), jnp.int32),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((CAND_BLOCK_ROWS, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                scales_spec,
                _PERM_SPEC,
                pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=_cand_out_specs(b, w),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * (d + 8) + d * b
            + 2 * n_blocks * b * w * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), codes,
      scales[:, 0].reshape(n_blocks, 1, CAND_BLOCK_ROWS),
      perm.reshape(n_blocks, 1, CAND_BLOCK_ROWS), qt, qs)
    return _cand_merge(bvals, bidxs, perm, fetch=fetch)


def _prefix_out(orient: str, n_blocks: int, b: int, w: int):
    """Out shapes + specs for the prefix kernels: block-major
    ``[n_blocks, w, B]`` under "col", query-major ``[n_blocks, B, w]``
    under "row"."""
    dims = (w, b) if orient == "col" else (b, w)
    shapes = [jax.ShapeDtypeStruct((n_blocks,) + dims, jnp.float32),
              jax.ShapeDtypeStruct((n_blocks,) + dims, jnp.int32)]
    specs = [pl.BlockSpec((1,) + dims, lambda i, *_: (i, 0, 0),
                          memory_space=pltpu.VMEM) for _ in range(2)]
    return shapes, specs


@functools.partial(jax.jit,
                   static_argnames=("fetch", "rounds", "bucket", "orient",
                                    "select", "interpret"))
def _pallas_cand_scan_prefix(emb: jax.Array, perm: jax.Array,
                             queries: jax.Array, valid_count: jax.Array,
                             *, fetch: int, rounds: int, bucket: int,
                             orient: str, select: str = None,
                             interpret: bool = False
                             ) -> Tuple[jax.Array, jax.Array]:
    """Fused candidate scan over a live-PREFIX mirror (f32/bf16): the
    kernel reads only the matrix block and the query panel — dead-row
    masking is iota vs ``valid_count``; ``perm`` is used OUTSIDE the
    kernel to translate winner positions to host rows."""
    n_pad, d = emb.shape
    b = queries.shape[0]
    qt = queries.astype(emb.dtype).T  # [D, B]
    n_blocks = n_pad // CAND_BLOCK_ROWS
    w = rounds * (CAND_BLOCK_ROWS // bucket)
    out_shapes, out_specs = _prefix_out(orient, n_blocks, b, w)
    bvals, bidxs = pl.pallas_call(
        functools.partial(_cand_kernel_prefix, rounds=rounds,
                          bucket=bucket, orient=orient, select=select),
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((CAND_BLOCK_ROWS, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * d * emb.dtype.itemsize
            + d * b * 4 + 2 * n_blocks * b * w * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), emb, qt)
    merge = _cand_merge_cols if orient == "col" else _cand_merge
    return merge(bvals, bidxs, perm, fetch=fetch)


@functools.partial(jax.jit,
                   static_argnames=("fetch", "rounds", "bucket", "native",
                                    "orient", "select", "interpret"))
def _pallas_cand_scan_int8_prefix(codes: jax.Array, scales: jax.Array,
                                  perm: jax.Array, queries: jax.Array,
                                  valid_count: jax.Array, *, fetch: int,
                                  rounds: int, bucket: int, native: bool,
                                  orient: str, select: str = None,
                             interpret: bool = False
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Int8 twin of :func:`_pallas_cand_scan_prefix`. The row scales are
    the one per-row operand left in-kernel: ``[1, 1, blk]`` lane-major
    blocks under "row", ``[1, blk, 1]`` sublane-major (lane-padded, ~1 MB
    VMEM per 2048 rows) under "col"."""
    n_pad, d = codes.shape
    b = queries.shape[0]
    n_blocks = n_pad // CAND_BLOCK_ROWS
    w = rounds * (CAND_BLOCK_ROWS // bucket)
    if native:
        qabs = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
        qscale = (qabs / 127.0).astype(jnp.float32)
        qsafe = jnp.where(qscale > 0, qscale, 1.0)
        qt = jnp.clip(jnp.round(queries / qsafe), -127,
                      127).astype(jnp.int8).T            # [D, B]
        qs = qscale                                      # [B, 1]
    else:
        qt = queries.astype(jnp.bfloat16).T
        qs = jnp.ones((b, 1), jnp.float32)
    if orient == "col":
        scales_op = scales[:, 0].reshape(n_blocks, CAND_BLOCK_ROWS, 1)
        scales_spec = pl.BlockSpec((1, CAND_BLOCK_ROWS, 1),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        qs_op = qs.T                                     # [1, B]
        qs_spec = pl.BlockSpec((1, b), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        scales_op = scales[:, 0].reshape(n_blocks, 1, CAND_BLOCK_ROWS)
        scales_spec = pl.BlockSpec((1, 1, CAND_BLOCK_ROWS),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        qs_op = qs                                       # [B, 1]
        qs_spec = pl.BlockSpec((b, 1), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    out_shapes, out_specs = _prefix_out(orient, n_blocks, b, w)
    bvals, bidxs = pl.pallas_call(
        functools.partial(_cand_kernel_int8_prefix, rounds=rounds,
                          bucket=bucket, native=native, orient=orient, select=select),
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((CAND_BLOCK_ROWS, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                scales_spec,
                pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                qs_spec,
            ],
            out_specs=out_specs,
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * (d + 4) + d * b
            + 2 * n_blocks * b * w * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), codes, scales_op, qt, qs_op)
    merge = _cand_merge_cols if orient == "col" else _cand_merge
    return merge(bvals, bidxs, perm, fetch=fetch)


def _cand_kernel_int4_prefix(valid_ref, emb_ref, scales_ref, qt_ref,
                             qscale_ref, vals_ref, idxs_ref, *,
                             rounds: int, bucket: int, native: bool,
                             orient: str, select: str = None):
    """Int4 live-prefix candidate step: the packed ``[blk, D/2]`` block
    is read from HBM at 0.5 B/element and unpacked IN VMEM into the two
    split-halves code blocks; the score is two half-depth MXU dots (see
    the int4 tier overview). Scale/orientation handling matches
    :func:`_cand_kernel_int8_prefix`."""
    valid = valid_ref[0]
    blk = emb_ref.shape[0]
    half = emb_ref.shape[1]
    base = pl.program_id(0) * blk
    lo, hi = _unpack_nibbles(emb_ref[:])
    qt = qt_ref[:]                                       # [D, B]
    q_lo, q_hi = qt[:half], qt[half:]
    if orient == "col":
        row_scale = scales_ref[0]                        # [blk, 1]
        dn = (((1,), (0,)), ((), ()))
        if native:
            raw = (jax.lax.dot_general(
                       lo, q_lo, dimension_numbers=dn,
                       preferred_element_type=jnp.int32)
                   + jax.lax.dot_general(
                       hi, q_hi, dimension_numbers=dn,
                       preferred_element_type=jnp.int32))  # [blk, B]
            sc = raw.astype(jnp.float32) * row_scale * qscale_ref[:]
        else:
            raw = (jax.lax.dot_general(
                       lo.astype(jnp.bfloat16),
                       q_lo.astype(jnp.bfloat16), dimension_numbers=dn,
                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       hi.astype(jnp.bfloat16),
                       q_hi.astype(jnp.bfloat16), dimension_numbers=dn,
                       preferred_element_type=jnp.float32))
            sc = raw * row_scale
        _bucket_select_cols(sc, base, valid, vals_ref, idxs_ref,
                            rounds=rounds, bucket=bucket, select=select)
    else:
        row_scale = scales_ref[0]                        # [1, blk]
        dn = (((0,), (1,)), ((), ()))
        if native:
            raw = (jax.lax.dot_general(
                       q_lo, lo, dimension_numbers=dn,
                       preferred_element_type=jnp.int32)
                   + jax.lax.dot_general(
                       q_hi, hi, dimension_numbers=dn,
                       preferred_element_type=jnp.int32))  # [B, blk]
            sc = raw.astype(jnp.float32) * row_scale * qscale_ref[:]
        else:
            raw = (jax.lax.dot_general(
                       q_lo.astype(jnp.bfloat16), lo.astype(jnp.bfloat16),
                       dimension_numbers=dn,
                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(
                       q_hi.astype(jnp.bfloat16), hi.astype(jnp.bfloat16),
                       dimension_numbers=dn,
                       preferred_element_type=jnp.float32))
            sc = raw * row_scale
        live = (jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
                + base) < valid
        _bucket_select_rows(sc, live, base, vals_ref, idxs_ref,
                            rounds=rounds, bucket=bucket, select=select)


@functools.partial(jax.jit,
                   static_argnames=("fetch", "rounds", "bucket", "native",
                                    "orient", "select", "interpret"))
def _pallas_cand_scan_int4_prefix(packed: jax.Array, scales: jax.Array,
                                  perm: jax.Array, queries: jax.Array,
                                  valid_count: jax.Array, *, fetch: int,
                                  rounds: int, bucket: int, native: bool,
                                  orient: str, select: str = None,
                             interpret: bool = False
                                  ) -> Tuple[jax.Array, jax.Array]:
    """Int4 twin of :func:`_pallas_cand_scan_int8_prefix` over the packed
    split-halves mirror (``[N, D/2]`` int8 carrying two nibbles/byte)."""
    n_pad, half = packed.shape
    d = 2 * half
    b = queries.shape[0]
    n_blocks = n_pad // CAND_BLOCK_ROWS
    w = rounds * (CAND_BLOCK_ROWS // bucket)
    if native:
        qabs = jnp.max(jnp.abs(queries), axis=-1, keepdims=True)
        qscale = (qabs / 127.0).astype(jnp.float32)
        qsafe = jnp.where(qscale > 0, qscale, 1.0)
        qt = jnp.clip(jnp.round(queries / qsafe), -127,
                      127).astype(jnp.int8).T            # [D, B]
        qs = qscale                                      # [B, 1]
    else:
        qt = queries.astype(jnp.bfloat16).T
        qs = jnp.ones((b, 1), jnp.float32)
    if orient == "col":
        scales_op = scales[:, 0].reshape(n_blocks, CAND_BLOCK_ROWS, 1)
        scales_spec = pl.BlockSpec((1, CAND_BLOCK_ROWS, 1),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        qs_op = qs.T                                     # [1, B]
        qs_spec = pl.BlockSpec((1, b), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        scales_op = scales[:, 0].reshape(n_blocks, 1, CAND_BLOCK_ROWS)
        scales_spec = pl.BlockSpec((1, 1, CAND_BLOCK_ROWS),
                                   lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
        qs_op = qs                                       # [B, 1]
        qs_spec = pl.BlockSpec((b, 1), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)
    out_shapes, out_specs = _prefix_out(orient, n_blocks, b, w)
    bvals, bidxs = pl.pallas_call(
        functools.partial(_cand_kernel_int4_prefix, rounds=rounds,
                          bucket=bucket, native=native, orient=orient, select=select),
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((CAND_BLOCK_ROWS, half),
                             lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                scales_spec,
                pl.BlockSpec((d, b), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                qs_spec,
            ],
            out_specs=out_specs,
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b,
            bytes_accessed=n_pad * (half + 4) + d * b
            + 2 * n_blocks * b * w * 4,
            transcendentals=0,
        ),
    )(valid_count.reshape(1).astype(jnp.int32), packed, scales_op, qt,
      qs_op)
    merge = _cand_merge_cols if orient == "col" else _cand_merge
    return merge(bvals, bidxs, perm, fetch=fetch)


def _int8_native() -> bool:
    return _os.environ.get("VQT_INT8_MXU", "native") == "native"


# Minimum query batch for the fused kernel. Round 4 default: 1 — two
# consecutive same-window B=1 A/Bs (2026-08-20 ~17:15 and ~17:29, 2M
# rows, stacked-jit) read the FUSED kernel ahead at every dtype (bf16
# 3.49 vs approx 4.20 ms/q; int8 2.14 vs 2.44; int4 1.71 vs 2.73),
# reversing the round-3 record (approx 2.54 vs fused 5.18), whose
# probe window ROADMAP itself flagged as heavily contended. At B>=64
# the fused kernel wins by ~2x (the approx [B, N] score matrix
# materializes), so the gate now only guards environments where an
# operator re-measures the other way (VQT_FUSED_MIN_B=8 restores the
# old routing). Both stages run over the SAME permuted mirror, so the
# recall contract is identical either way.
FUSED_MIN_B = int(_os.environ.get("VQT_FUSED_MIN_B", "1"))


def _fused_usable(n_pad: int, fetch: int, b: int,
                  min_b: int = None) -> bool:
    """The fused kernel engages for batched queries (``b >= FUSED_MIN_B``
    — see above) when the Pallas path is on, blocks and buckets divide
    evenly, and the bucket-winner list is at least as deep as the fetch
    (tiny corpora fall back to the approx scan, which is cheap at that
    size). All dtypes now default to fused at every width
    (``FUSED_MIN_B = 1`` — the round-4 same-window B=1 A/Bs above).
    ``min_b=1`` (int4) pins that routing even when an operator raises
    ``VQT_FUSED_MIN_B``: int4's approx path MATERIALIZES the nibble
    unpack (two [N, D/2] int8 temps ≈ 2× the packed read at 2M rows),
    so the fused kernel wins there unconditionally (B=1 probe
    2026-08-20 ~17:15: fused 1.71 vs approx 2.73 ms/q)."""
    if b < (FUSED_MIN_B if min_b is None else min_b):
        return False
    if n_pad <= 0 or n_pad % CAND_BLOCK_ROWS:
        return False
    if CAND_BLOCK_ROWS % CAND_BUCKET or CAND_BUCKET % _LANES:
        return False
    return (n_pad // CAND_BUCKET) * CAND_ROUNDS >= fetch


def prefix_fused_ok(live: int, fetch: int) -> bool:
    """Live-count gate for the fused kernel over a live-PREFIX mirror.

    Under the prefix arrangement every live row sits in the first
    ``ceil(live / bucket)`` buckets, so the kernel emits exactly
    ``rounds · ceil(live / bucket)`` live candidates — a small corpus in
    a large capacity (e.g. after mass deletion) could return FEWER
    candidates than the caller's k. The fixed-perm mesh layout doesn't
    share the failure mode (live rows spread over all buckets), so only
    prefix callers consult this; below the bar the approx scan serves
    (cheap at these sizes). Callers snapshot it per dispatch — crossing
    the bar later re-keys the fused executable."""
    if live <= 0:
        return True
    winners = CAND_ROUNDS * -(-live // CAND_BUCKET)
    return winners >= min(fetch, live)


# Widest query batch one fused-kernel launch takes. The row-major
# [B, blk] score surface plus its packed-key twin must fit VMEM next to
# the double-buffered matrix block: B=256 at CAND_BLOCK_ROWS=4096
# compiles and runs on v5e; 512 exceeds scoped VMEM. Wider serving
# batches (coalesce_width 512) chunk here — matmul efficiency saturates
# by B=256 (per-query scan cost is flat from 64 to 256, probe round 3),
# so chunking costs nothing while the caller's text encode and dispatch
# overhead still amortize over the full width.
def _cand_max_b() -> int:
    return int(_os.environ.get("VQT_CAND_MAX_B", "256"))


def _chunked_stage(stage, queries: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """Split ``queries`` into ``_cand_max_b()``-wide chunks (static
    Python slicing — shapes stay jit-stable per chunk) and concatenate
    the per-chunk candidate lists."""
    step = _cand_max_b()
    outs = [stage(queries[i:i + step])
            for i in range(0, queries.shape[0], step)]
    return (jnp.concatenate([v for v, _ in outs], axis=0),
            jnp.concatenate([i for _, i in outs], axis=0))


def candidate_stage(emb: jax.Array, queries: jax.Array, valid_count,
                    *, k: int, perm=None, prefix: bool = False,
                    live: int = None
                    ) -> Tuple[jax.Array, jax.Array]:
    """Local bf16/f32 candidate scan — fused kernel when usable, approx
    otherwise (``VQT_CANDIDATE_TOPK=approx`` forces the latter). No
    exact fallback, no 1-D squeeze: the building block shared by the
    single-device dispatch and the per-shard sharded scans. Batches
    wider than ``CAND_MAX_B`` are chunked (each chunk re-decides
    fused-vs-approx, so a narrow tail chunk simply takes the approx
    path). ``prefix=True`` asserts the live-PREFIX mirror layout
    (liveness = position < valid_count; ``perm`` translates only)."""
    if queries.shape[0] > _cand_max_b():
        return _chunked_stage(
            lambda q: candidate_stage(emb, q, valid_count, k=k, perm=perm,
                                      prefix=prefix, live=live),
            queries)
    pallas = _pallas_mode()
    if _candidate_mode() != "approx" and pallas != "off" \
            and _fused_usable(emb.shape[0], k, queries.shape[0]) \
            and (not prefix or live is None or prefix_fused_ok(live, k)):
        if perm is None:
            perm = jnp.arange(emb.shape[0], dtype=jnp.int32)
        if prefix:
            return _pallas_cand_scan_prefix(
                emb, perm, queries, valid_count, fetch=k,
                rounds=CAND_ROUNDS, bucket=CAND_BUCKET,
                orient=_cand_orient(), select=_cand_select(),
                interpret=pallas == "interpret")
        return _pallas_cand_scan(emb, perm, queries, valid_count, fetch=k,
                                 rounds=CAND_ROUNDS, bucket=CAND_BUCKET,
                                 select=_cand_select(),
                                 interpret=pallas == "interpret")
    return _approx_scan(emb, queries, valid_count, k=k,
                        recall=_approx_recall(), perm=perm, prefix=prefix)


def candidate_stage_int8(codes: jax.Array, scales: jax.Array,
                         queries: jax.Array, valid_count, *, k: int,
                         perm=None, prefix: bool = False,
                         live: int = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Int8 twin of :func:`candidate_stage`."""
    if queries.shape[0] > _cand_max_b():
        return _chunked_stage(
            lambda q: candidate_stage_int8(codes, scales, q, valid_count,
                                           k=k, perm=perm, prefix=prefix,
                                           live=live),
            queries)
    pallas = _pallas_mode()
    if _candidate_mode() != "approx" and pallas != "off" \
            and _fused_usable(codes.shape[0], k, queries.shape[0]) \
            and (not prefix or live is None or prefix_fused_ok(live, k)):
        if perm is None:
            perm = jnp.arange(codes.shape[0], dtype=jnp.int32)
        if prefix:
            return _pallas_cand_scan_int8_prefix(
                codes, scales, perm, queries, valid_count, fetch=k,
                rounds=CAND_ROUNDS, bucket=CAND_BUCKET,
                native=_int8_native(), orient=_cand_orient(int8=True),
                select=_cand_select(), interpret=pallas == "interpret")
        return _pallas_cand_scan_int8(
            codes, scales, perm, queries, valid_count, fetch=k,
            rounds=CAND_ROUNDS, bucket=CAND_BUCKET,
            native=_int8_native(), select=_cand_select(),
            interpret=pallas == "interpret")
    return _approx_scan_int8(codes, scales, queries, valid_count, k=k,
                             recall=_approx_recall(), perm=perm,
                             native=_int8_native(), prefix=prefix)


def candidate_stage_int4(packed: jax.Array, scales: jax.Array,
                         queries: jax.Array, valid_count, *, k: int,
                         perm=None, prefix: bool = False,
                         live: int = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Int4 twin of :func:`candidate_stage_int8` over the packed
    split-halves mirror. The fused kernel serves the live-PREFIX layout
    (the only layout the int4 mirror uses — single-device tier); other
    layouts take the portable approx scan."""
    if queries.shape[0] > _cand_max_b():
        return _chunked_stage(
            lambda q: candidate_stage_int4(packed, scales, q, valid_count,
                                           k=k, perm=perm, prefix=prefix,
                                           live=live),
            queries)
    pallas = _pallas_mode()
    if prefix and pallas != "off" and _candidate_mode() != "approx" \
            and _fused_usable(packed.shape[0], k, queries.shape[0],
                              min_b=1) \
            and (live is None or prefix_fused_ok(live, k)):
        if perm is None:
            perm = jnp.arange(packed.shape[0], dtype=jnp.int32)
        return _pallas_cand_scan_int4_prefix(
            packed, scales, perm, queries, valid_count, fetch=k,
            rounds=CAND_ROUNDS, bucket=CAND_BUCKET,
            native=_int8_native(), orient=_cand_orient(int8=True),
            select=_cand_select(), interpret=pallas == "interpret")
    return _approx_scan_int4(packed, scales, queries, valid_count, k=k,
                             recall=_approx_recall(), perm=perm,
                             native=_int8_native(), prefix=prefix)


def candidate_topk_int4(packed: jax.Array, scales: jax.Array,
                        queries: jax.Array, valid_count, *, k: int,
                        perm=None, prefix: bool = False,
                        live: int = None) -> Tuple[jax.Array, jax.Array]:
    """Top-k for the int4 candidate stage (:func:`candidate_topk`
    interface). int4 has no exact Pallas fallback — the
    ``VQT_CANDIDATE_TOPK=pallas`` escape hatch routes int4 mirrors to
    the approx scan instead (the exact contract lives in the f32
    re-rank either way)."""
    if k <= 0 or k > APPROX_FETCH_CAP:
        raise ValueError(f"k must be in [1, {APPROX_FETCH_CAP}], got {k}")
    squeeze = queries.ndim == 1
    if squeeze:
        queries = queries[None, :]
    vals, idxs = candidate_stage_int4(
        packed, scales, jnp.asarray(queries, jnp.float32),
        jnp.asarray(valid_count, jnp.int32), k=k, perm=perm,
        prefix=prefix, live=live)
    return (vals[0], idxs[0]) if squeeze else (vals, idxs)


def _candidate_dispatch(exact_fn, stage_fn, queries, valid_count, k, perm):
    """Shared candidate-stage dispatch (see the overview above): the
    exact scan under ``VQT_CANDIDATE_TOPK=pallas`` (identity-layout
    mirrors only), else the fused/approx stage with 1-D query
    squeezing. ``perm`` is the mirror permutation column or None."""
    if _candidate_mode() == "pallas" and perm is None:
        return exact_fn(min(k, MAX_K))
    if k <= 0 or k > APPROX_FETCH_CAP:
        raise ValueError(f"k must be in [1, {APPROX_FETCH_CAP}], got {k}")
    squeeze = queries.ndim == 1
    if squeeze:
        queries = queries[None, :]
    vals, idxs = stage_fn(jnp.asarray(queries, jnp.float32),
                          jnp.asarray(valid_count, jnp.int32), perm)
    return (vals[0], idxs[0]) if squeeze else (vals, idxs)


def candidate_topk(emb: jax.Array, queries: jax.Array, valid_count, *,
                   k: int, perm=None, prefix: bool = False,
                   live: int = None) -> Tuple[jax.Array, jax.Array]:
    """Top-k for the bf16 candidate stage: :func:`cosine_topk` interface,
    but scores/order only feed the caller's exact f32 re-rank, and ``k``
    may exceed MAX_K (deep fetch, up to APPROX_FETCH_CAP). ``perm`` is
    the mirror's row permutation (mirror row → host row); indices are
    returned in HOST row space. ``prefix=True`` = live-prefix layout
    (mirror positions [0, valid) live, perm translates only). The
    ``pallas`` exact fallback requires an identity-layout mirror
    (perm=None)."""
    return _candidate_dispatch(
        lambda kk: cosine_topk(emb, queries, valid_count, k=kk),
        lambda q, v, p: candidate_stage(emb, q, v, k=k, perm=p,
                                        prefix=prefix, live=live),
        queries, valid_count, k, perm)


def candidate_topk_int8(emb_i8: jax.Array, scales: jax.Array,
                        queries: jax.Array, valid_count, *, k: int,
                        perm=None, prefix: bool = False,
                        live: int = None) -> Tuple[jax.Array, jax.Array]:
    """Top-k for the int8 candidate stage (see :func:`candidate_topk`)."""
    return _candidate_dispatch(
        lambda kk: cosine_topk_int8(emb_i8, scales, queries, valid_count,
                                    k=kk),
        lambda q, v, p: candidate_stage_int8(emb_i8, scales, q, v, k=k,
                                             perm=p, prefix=prefix,
                                             live=live),
        queries, valid_count, k, perm)


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
