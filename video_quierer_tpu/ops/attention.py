"""Fused per-head attention for the CLIP/SigLIP towers.

TPU-native replacement for the einsum-softmax attention the towers
shipped with (models/clip/model.py:Attention — itself the JAX analog of
the reference's HF ``CLIPAttention``, used via
/root/reference/video_search_overhaul.py:127-130). Measured on v5e
(ViT-B/32, batch 256, bf16): the einsum path runs the tower at 9,372
frames/s (41% MFU) while an identical tower with attention removed runs
16,618 f/s (74%) — the per-head ``[B,H,S,S]`` einsums, their layout
changes, and the HBM-materialized logits cost ~46% of the runtime even
though attention math is ~1% of the tower's FLOPs.

Design — lane-grouped per-head kernel
-------------------------------------
CLIP sequence lengths are tiny (50–257 tokens), so a whole per-head
``[S, S]`` score block fits comfortably in VMEM — no online-softmax
streaming. The kernel tiles the BATCH and the HEAD axes instead:

- grid ``(B/bb, D/128)``: each step loads ``[bb, S, 128]`` lane-blocks
  of q/k/v — 128 lanes = ``128/hd`` whole heads, sliced straight out of
  the ``[B, S, H·hd]`` h-minor projection layout by the BlockSpec index
  map (no transposes, no reshapes, anywhere);
- per item and head: one ``[S, hd]·[hd, S]`` logits matmul (f32
  accumulate on the MXU), mask + softmax in VMEM, ``@ V``, heads
  re-concatenated along lanes for a single block store.

Scores live and die in VMEM — the einsum path's per-layer logit
materialization (``[256, 8, 50, 50]`` f32 ≈ 20 MB written + read,
twice, per layer) never happens — and unlike a head-stacked single
matmul (tried first: one ``[S·H, S·H]`` block-masked score matrix per
item) there is NO H× redundant MXU/VPU work; that redundancy kept the
stacked variant as slow as the einsum path it replaced (measured
0.81 vs 0.86 ms/application).

Numerics: logits accumulate in f32 (``preferred_element_type``); bf16
towers use an unstabilized softmax with the elementwise chain in bf16
(bf16 shares f32's exponent range, so ``exp`` is safe under a clamp —
trained CLIP logits stay ≲30, clamped at 60; masked lanes are -inf → 0);
f32 towers keep the exact stabilized f32 softmax (bit-parity work).
The ``1/sqrt(hd)`` scale folds into q outside the kernel in f32.
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

# Lane width per grid step (= one VMEM block of whole heads). Must be
# a multiple of the 128-lane tile; hd must divide it. Wider groups cut
# grid-step count (fixed per-step machinery) at the cost of VMEM.
GROUP_LANES = int(_os.environ.get("VQT_ATTN_GROUP_LANES", "128"))

# Batch items per grid step: amortizes per-step machinery over
# bb · (128/hd) per-head attentions. VMEM per step is tiny
# (bb·3·S·128·2 B + one [S,S] f32 score block), so this is a pure
# step-count / compile-time trade.
BATCH_BLOCK = int(_os.environ.get("VQT_ATTN_BATCH_BLOCK", "8"))


def _pallas_mode() -> str:
    if _os.environ.get("VQT_PALLAS_INTERPRET") == "1":
        return "interpret"
    return "compiled" if use_pallas() else "off"


def fused_attention_eligible(s: int, num_heads: int, d: int) -> bool:
    """Shape rules: whole heads must tile the 128-lane block. Covers
    every tower in the model zoo (B/32, B/16, L/14, SigLIP, all text
    towers); ``s`` is unconstrained — the per-head [S, S] score block
    is VMEM-resident at any model seq length."""
    if _pallas_mode() == "off":
        return False
    if _os.environ.get("VQT_FUSED_ATTN") == "0":   # A/B + escape hatch
        return False
    gl = min(GROUP_LANES, d)
    if d % num_heads or d % gl or gl % 128:
        return False
    hd = d // num_heads
    return gl % hd == 0


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, hd: int, valid: int,
                 causal: bool):
    """One grid step: ``bb`` items × ``128/hd`` heads of full attention.

    Refs are ``[bb, S, 128]`` lane-blocks of the h-minor projections.
    Reductions keep a size-1 trailing axis (the hardware-Mosaic rule —
    see ops/topk.py:_bucket_select_rows); matmul accumulators are f32
    (Mosaic rejects bf16 accs on hardware).
    """
    bb, s, gl = q_ref.shape
    fast = q_ref.dtype == jnp.bfloat16
    masked = causal or valid < s
    if masked:       # vision towers (valid == S, non-causal) skip the
        col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)  # mask pass
        mask = col < valid
        if causal:
            mask &= jax.lax.broadcasted_iota(jnp.int32, (s, s), 0) >= col
    for i in range(bb):                                # static, small
        qi, ki, vi = q_ref[i], k_ref[i], v_ref[i]      # [S, 128]
        outs = []
        for h in range(gl // hd):                      # heads in block
            sl = slice(h * hd, (h + 1) * hd)
            logits = jax.lax.dot_general(
                qi[:, sl], ki[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [S, S]
            if masked:
                logits = jnp.where(mask, logits, NEG_INF)
            if fast:
                # unstabilized bf16 softmax (see module docstring)
                e = jnp.exp(jnp.minimum(logits, 60.0)
                            .astype(jnp.bfloat16))
                den = jnp.sum(e, axis=-1, keepdims=True)
                w = e * (1.0 / den)
            else:
                m = jnp.max(logits, axis=-1, keepdims=True)
                e = jnp.exp(logits - m)
                den = jnp.sum(e, axis=-1, keepdims=True)
                w = (e / den).astype(vi.dtype)
            outs.append(jax.lax.dot_general(
                w, vi[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype))                     # [S, hd]
        # one concatenated [S, 128] block store (sliced stores are the
        # riskier Mosaic form)
        o_ref[i] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "valid_len", "causal",
                                    "interpret"))
def _fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     num_heads: int, valid_len: int, causal: bool,
                     interpret: bool) -> jax.Array:
    b, s, d = q.shape
    hd = d // num_heads
    # fold the 1/sqrt(hd) scale into q OUTSIDE the kernel in f32
    # (better rounding than the einsum path's bf16 q*scale, and one
    # fewer pass in the kernel)
    q = (q.astype(jnp.float32) * (hd ** -0.5)).astype(q.dtype)

    bb = min(BATCH_BLOCK, b) if b % BATCH_BLOCK else BATCH_BLOCK
    b_pad = -(-b // bb) * bb
    if b_pad != b:                 # tiny batch-dim pad (serving B=1..)
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    gl = min(GROUP_LANES, d)
    spec = pl.BlockSpec((bb, s, gl), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, hd=hd, valid=valid_len,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((b_pad, s, d), q.dtype),
        grid=(b_pad // bb, d // gl),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)
    return out[:b]


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
# short-sequence attention wants anyway.
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
