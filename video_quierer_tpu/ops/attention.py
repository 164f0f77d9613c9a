"""Fused single-block attention for the CLIP/SigLIP towers.

TPU-native replacement for the einsum-softmax attention the towers
shipped with (models/clip/model.py:Attention — itself the JAX analog of
the reference's HF ``CLIPAttention``, used via
/root/reference/video_search_overhaul.py:127-130). Measured on v5e
(ViT-B/32, batch 256, bf16): the einsum path runs the tower at 9,372
frames/s (41% MFU) while an identical tower with attention removed runs
16,618 f/s (74%) — the per-head ``[B,H,S,S]`` einsums, their layout
changes, and the HBM-materialized logits cost ~46% of the runtime even
though attention math is ~1% of the tower's FLOPs.

Design — the head-stacked single-block kernel
---------------------------------------------
CLIP sequence lengths are tiny (50 image patches + CLS, 77 text
tokens), so the whole score matrix fits in VMEM — no online-softmax
streaming needed. The trick that makes it ONE clean kernel with zero
relayouts: for projections laid out ``[B, S, H·hd]`` (h-minor, exactly
what the q/k/v Dense layers emit), the reshape to ``[B, S·H, hd]`` is
FREE — row ``r`` is the (s, h) pair ``s = r // H, h = r % H``. One
``[S·H, S·H]`` matmul per batch item then computes every head's logits
at once; cross-head products are masked with ``row % H == col % H``
before an ordinary f32 softmax, and the ``@ V`` epilogue returns
``[S·H, hd]`` whose free reshape back is ``[S, H·hd]``. Scores live and
die in VMEM: the einsum path's per-layer logit materialization
(``[256, 8, 50, 50]`` f32 ≈ 20 MB written + read, twice, per layer)
never happens.

Cost of the trick: H× redundant MXU work on the masked cross-head
products — but attention matmuls are ~1% of tower FLOPs, so the waste
is noise next to the layout/materialization cost it removes. The fused
path engages when ``S·H ≤ MAX_ROWS`` (VMEM bound on the f32 score
block): ViT-B/32 (S·H = 400) and all text towers (≤ 616) qualify;
ViT-B/16 / L/14 keep the einsum path (their bigger matmuls already run
at ~50% MFU, and their score blocks would not fit).

Numerics: logits accumulate in f32 on the MXU (``preferred_element_type``),
softmax runs in f32, weights cast back to the compute dtype for the
``@ V`` — the same contract as the einsum path. The scale is applied to
the f32 logits rather than to bf16 ``q`` (equal or better rounding).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_quierer_tpu.utils.env import use_pallas

NEG_INF = float("-inf")

# Upper bound on S·H for the fused path: the [S·H, S·H] f32 score block
# plus its exp live in VMEM per in-flight batch item (~3.4 MB at 640).
MAX_ROWS = int(_os.environ.get("VQT_ATTN_MAX_ROWS", "1024"))

# Batch items per grid step. The per-item score blocks dominate VMEM;
# 2 keeps the worst eligible case (S·H=1024: 2·(4+4) MB scores + operand
# blocks) inside the ~16 MB budget.
BATCH_BLOCK = int(_os.environ.get("VQT_ATTN_BATCH_BLOCK", "2"))


def _pallas_mode() -> str:
    if _os.environ.get("VQT_PALLAS_INTERPRET") == "1":
        return "interpret"
    return "compiled" if use_pallas() else "off"


def fused_attention_eligible(s: int, num_heads: int, d: int) -> bool:
    """Shape rules for the fused kernel: head-minor rows must tile the
    sublane dim and the score block must fit VMEM."""
    if _pallas_mode() == "off":
        return False
    if _os.environ.get("VQT_FUSED_ATTN") == "0":   # A/B + escape hatch
        return False
    if d % num_heads:
        return False
    rows = s * num_heads
    return rows % 8 == 0 and rows <= MAX_ROWS


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, valid: int,
                 causal: bool):
    """One grid step: full attention for ``BATCH_BLOCK`` batch items.

    Refs are ``[Bb, S·H, hd]`` (head-minor rows). Per item: one
    ``[S·H, S·H]`` logits matmul (f32 accumulate), the head-block /
    validity / causal mask from fresh iotas, f32 softmax, ``@ V``.
    Reductions keep a size-1 trailing axis (the hardware-Mosaic rule —
    see ops/topk.py:_bucket_select_rows).
    """
    bb, rows, _ = q_ref.shape
    fast = q_ref.dtype == jnp.bfloat16
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    mask = (row % heads == col % heads) & (col < valid * heads)
    if causal:
        mask &= (row // heads) >= (col // heads)
    for i in range(bb):                                # static, small
        logits = jax.lax.dot_general(
            q_ref[i], k_ref[i],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [S·H, S·H]
        logits = jnp.where(mask, logits, NEG_INF)
        if fast:
            # bf16 towers: unstabilized softmax, elementwise chain in
            # bf16 (2-per-lane VPU rate). The kernel is VPU-bound on
            # these passes — the H×-redundant score block makes them
            # the whole cost (measured 0.81 ms/application vs einsum's
            # 0.86 with the stabilized f32 chain). No max-subtract:
            # bf16 carries f32's exponent range, so exp overflows only
            # past ~88 — the clamp at 60 caps trained CLIP logits
            # (≲30) harmlessly; masked lanes are -inf → exp = 0.
            e = jnp.exp(jnp.minimum(logits, 60.0).astype(jnp.bfloat16))
            den = jnp.sum(e, axis=-1, keepdims=True)
            w = e * (1.0 / den)
        else:
            # f32 towers: exact stabilized softmax (bit-parity work)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            den = jnp.sum(e, axis=-1, keepdims=True)
            w = (e / den).astype(v_ref.dtype)
        # f32 accumulate: hardware Mosaic requires a 32-bit matmul acc
        # for bf16 operands (found on the real lowering; the interpreter
        # accepts a bf16 acc)
        o_ref[i] = jax.lax.dot_general(
            w, v_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)                            # [S·H, hd]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "valid_len", "causal",
                                    "interpret"))
def _fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     num_heads: int, valid_len: int, causal: bool,
                     interpret: bool) -> jax.Array:
    b, s, d = q.shape
    hd = d // num_heads
    rows = s * num_heads
    # fold the 1/sqrt(hd) scale into q OUTSIDE the kernel (f32 — better
    # rounding than the einsum path's bf16 q*scale): saves one full
    # f32 pass over the [S*H, S*H] score block per item in the
    # VPU-bound kernel
    q = (q.astype(jnp.float32) * (hd ** -0.5)).astype(q.dtype)

    bb = BATCH_BLOCK
    b_pad = -(-b // bb) * bb
    if b_pad != b:                 # tiny batch-dim pad (serving B=1..)
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    # free reshapes: [B, S, H·hd] → [B, S·H, hd] (h-minor rows)
    qs, ks, vs = (t.reshape(b_pad, rows, hd) for t in (q, k, v))
    spec = pl.BlockSpec((bb, rows, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, heads=num_heads, valid=valid_len,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((b_pad, rows, hd), q.dtype),
        grid=(b_pad // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qs, ks, vs)
    return out.reshape(b_pad, s, d)[:b]


def _einsum_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_heads: int, valid_len: int,
                      causal: bool) -> jax.Array:
    """The towers' original per-head XLA path — the differentiable
    reference the custom VJP below transposes through (and the parity
    oracle in tests/test_attention.py)."""
    b, s, d = q.shape
    hd = d // num_heads
    split = lambda t: t.reshape(b, s, num_heads, hd)
    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    mask = jnp.ones((s, s), dtype=bool)
    if causal:
        mask &= jnp.tril(mask)
    if valid_len < s:
        mask &= (jnp.arange(s) < valid_len)[None, :]
    logits = jnp.where(mask[None, None], logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, s, d)


# ``pallas_call`` has no autodiff rule, but the towers train (CLIPTrainer
# differentiates straight through Attention): forward runs the fused
# kernel, backward transposes the einsum reference (same math; gradients
# agree to rounding). Residuals are just (q, k, v) — the score block is
# recomputed by the VJP, which is exactly the rematerialization a
# seq≤77 attention wants anyway.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attn(q, k, v, num_heads: int, valid_len: int, causal: bool):
    return _fused_attention(q, k, v, num_heads=num_heads,
                            valid_len=valid_len, causal=causal,
                            interpret=_pallas_mode() == "interpret")


def _attn_fwd(q, k, v, num_heads, valid_len, causal):
    return _attn(q, k, v, num_heads, valid_len, causal), (q, k, v)


def _attn_bwd(num_heads, valid_len, causal, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _einsum_attention(q_, k_, v_, num_heads,
                                             valid_len, causal), q, k, v)
    return vjp(g)


_attn.defvjp(_attn_fwd, _attn_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    num_heads: int, valid_len: int | None = None,
                    causal: bool = False) -> jax.Array:
    """Full (non-streamed) multi-head attention, scores VMEM-resident.

    ``q, k, v``: ``[B, S, D]`` in the h-minor projection layout the
    towers' Dense layers produce. ``valid_len`` masks trailing key
    positions (``None`` → all ``S`` attend). Output ``[B, S, D]``; rows
    at ``s >= valid_len`` receive garbage (their keys are masked for
    everyone else) — callers pool from valid positions only, matching
    how capacity padding is handled everywhere else in this codebase.
    Differentiable (custom VJP through the einsum reference).
    """
    return _attn(q, k, v, num_heads,
                 q.shape[1] if valid_len is None else valid_len, causal)
