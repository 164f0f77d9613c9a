"""Whole-transformer-layer Pallas kernels for the CLIP towers.

TPU-native replacement for the per-op XLA lowering of the towers'
encoder blocks (models/clip/model.py:EncoderBlock — the JAX analog of the
reference's HF ``CLIPEncoderLayer``, used via
/root/reference/video_search_overhaul.py:120-141, 278-295). Motivation
(measured, v5e, B=256 stacked-jit 2026-08-19): the text encode has a
~1.7 ms seq-INDEPENDENT floor per 256-batch — s8 2.80 / s16 3.94 /
s32 5.98 ms — while its pure matmul time at s16 is ~0.8 ms. At these
shapes every matmul retires in single-digit microseconds, so the floor
is ~10 XLA kernel launches per layer × 12 layers of fixed per-op
overhead, not FLOPs or bandwidth. The fix is structural: run the ENTIRE
encoder block — LN1 → fused-QKV matmul → per-head attention →
out-projection → residual → LN2 → MLP (quick-GELU) → residual — as ONE
``pallas_call`` per layer, with the layer's full weight set resident in
VMEM (6.3 MB in bf16 for the 512-wide CLIP towers) and activations
never touching HBM between ops. Measured win (decomp_bench, second-loop
steady state, v5e): text encode 3.99 → 3.19 ms per 256-batch at s16,
6.95 → 5.52 per 512-batch.

Design
------
- the layer operates on a FLAT ``[T, D]`` token matrix (``T = B·S``,
  item-major); the grid tiles it as ``(T/t,)`` with ``t ≈ 512`` tokens
  per step — large enough that the five weight matmuls hit the MXU with
  full tiles, small enough that activations + weights fit VMEM. Weight
  BlockSpecs are grid-invariant, so Mosaic fetches them once per call.
- ALL matmuls — projections and attention — run on the whole ``[t, D]``
  tile: attention is one ``[t, hd]·[hd, t]`` logits matmul per head
  under an item-block (+ causal, for text) mask, with the same
  f32-accumulate / bf16-fast-softmax contract as ops/attention.py
  (unstabilized clamped-exp softmax in bf16; stabilized f32 otherwise).
  Cross-item logits are masked redundancy — cheap at CLIP sequence
  lengths, and MXU-shaped matmuls beat the loop-shaped alternative (a
  per-item ``fori_loop`` issuing bt·heads·3 tiny matmuls per step
  measured SLOWER than the unfused tower: 4.50 vs 3.97 ms/256-batch).
- the item-of-token test rides two tiny int32 operands (``[t, 1]`` /
  ``[1, t]`` local item ids, identical for every tile since ``t`` is a
  multiple of ``S``) — no integer division in-kernel, and no
  power-of-two restriction on S (the vision tower's S=50 qualifies).
- LayerNorm statistics are f32 (matching flax's ``_compute_stats``
  upcast); scale/bias apply in f32 then cast to the residual dtype.
- text: causal masking only — like the unfused tower, key padding
  columns are NOT masked: under a causal mask no position after a row's
  EOT can reach that row, and only EOT rows are pooled
  (embedder.trim_text_ids relies on the same invariant).

Serving-only by design: the trainer differentiates the flax tower
(models/clip/model.py), which keeps its own fused-attention custom VJP.
This path has no VJP and is used by CLIPEmbedder for inference.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_quierer_tpu.utils.env import use_pallas

NEG_INF = float("-inf")

# Full-layer weight budget (bytes) for VMEM residency. The bf16
# 512-wide CLIP layer needs 6.3 MB; wider towers (768-wide: 14.2 MB
# bf16) fall through to SPLIT mode or, beyond HALF_BUDGET, the unfused
# flax tower.
WEIGHT_BUDGET = int(_os.environ.get("VQT_FUSED_LAYER_BUDGET",
                                    str(9 * 2 ** 20)))
# Split-mode budget: when the FULL layer's weights exceed WEIGHT_BUDGET
# but each half (attention: 4d² / MLP: 2·r·d²) fits this, the layer runs
# as TWO pallas_calls (attn-half, mlp-half) — still 2 kernels per layer
# instead of ~10 XLA ops. The 768-wide B/32 vision tower takes this path
# in bf16 (4.7 / 9.4 MB halves).
HALF_BUDGET = int(_os.environ.get("VQT_FUSED_HALF_BUDGET",
                                  str(12 * 2 ** 20)))
# Minimum tokens (B·S) for the fused towers — THE single-batch policy
# (round-4 VERDICT item 6, resolved as a documented gate rather than a
# small-batch kernel variant):
# - measured crossover: fused loses at B=1 (bench.py singles bf16 3.54
#   → 4.44 ms/q; 12 pallas_call launches can't amortize over 16
#   tokens) and wins from B·S ≈ 256 up (3.99 → 3.19 ms/256-batch at
#   s16, decomp_bench 2026-08-19);
# - a dedicated small-batch tile variant cannot win here: B=1 latency
#   on this class of deployment is DISPATCH-bound (~2 ms per-dispatch
#   floor, CLAUDE.md) and a 16-token tile leaves the MXU idle — there
#   is no kernel shape that beats XLA's single fused executable at
#   B=1, so the flax tower (which must exist anyway for training and
#   ineligible shapes) serves singles by design;
# - tests/test_fused_layer.py:test_min_tokens_policy pins both sides
#   of the boundary so a knob change can't silently re-route singles.
MIN_TOKENS = int(_os.environ.get("VQT_FUSED_LAYER_MIN_TOKENS", "256"))
# Target tokens per grid step (tile = largest bt·S <= target with bt a
# divisor of B and bt·S a sublane multiple): balances MXU tile size and
# VMEM scratch against the t²-scaled cross-item attention redundancy —
# measured sweep at s16 B=512 (decomp_bench): 256 → 5.19-5.78 ms,
# 512 → 5.52, 1024 → 7.90.
TOKEN_TARGET = int(_os.environ.get("VQT_FUSED_LAYER_TOKENS", "512"))


def _pallas_mode() -> str:
    if _os.environ.get("VQT_PALLAS_INTERPRET") == "1":
        return "interpret"
    return "compiled" if use_pallas() else "off"


def _attn_weight_bytes(d: int, itemsize: int) -> int:
    # qkv [D,3D] + out [D,D] + biases (tower dtype) + LN rows (always
    # f32 — _layer_operands materializes them at 4 B/elem)
    return (4 * d * d + 4 * d) * itemsize + 4 * d * 4


def _mlp_weight_bytes(d: int, mlp_ratio: int, itemsize: int) -> int:
    # fc1 [D,rD] + fc2 [rD,D] + biases
    return (2 * mlp_ratio * d * d + (1 + mlp_ratio) * d) * itemsize


def _layer_mode(d: int, mlp_ratio: int, dtype) -> str:
    """"full" = whole block in one pallas_call; "split" = attn + MLP
    halves; "" = weights don't fit VMEM residency either way."""
    itemsize = jnp.dtype(dtype).itemsize
    full = _attn_weight_bytes(d, itemsize) \
        + _mlp_weight_bytes(d, mlp_ratio, itemsize)
    if full <= WEIGHT_BUDGET:
        return "full"
    if max(_attn_weight_bytes(d, itemsize),
           _mlp_weight_bytes(d, mlp_ratio, itemsize)) <= HALF_BUDGET:
        return "split"
    return ""


def _width_eligible(d: int, heads: int, mlp_ratio: int, dtype,
                    mesh) -> bool:
    if _pallas_mode() == "off":
        return False
    if _os.environ.get("VQT_FUSED_LAYER") == "0":  # A/B + escape hatch
        return False
    if mesh is not None and getattr(mesh, "shape", None) is not None \
            and "pipe" in mesh.shape:
        # the GPipe tower has its own stage-sharded path
        return False
    if d % 128 or d % heads:
        return False
    return _layer_mode(d, mlp_ratio, dtype) != ""


def fused_text_tower_eligible(cfg_text: Any, dtype, mesh=None) -> bool:
    """Static (init-time) eligibility of the whole fused text tower."""
    return _width_eligible(cfg_text.hidden_size, cfg_text.num_heads,
                           cfg_text.mlp_ratio, dtype, mesh)


def fused_vision_tower_eligible(cfg_vision: Any, dtype,
                                mesh=None) -> bool:
    """Static eligibility of the fused vision tower (B/32 bf16 fits the
    weight budget; B/16 and L/14 are 768/1024-wide → unfused). MoE
    towers keep the flax encoder (their expert FFN is not a dense
    [D, rD] pair)."""
    if getattr(cfg_vision, "moe_experts", 0):
        return False
    return _width_eligible(cfg_vision.hidden_size, cfg_vision.num_heads,
                           cfg_vision.mlp_ratio, dtype, mesh)


def fused_seq_eligible(s: int) -> bool:
    """Per-call shape gate for TEXT seq buckets: S must tile sublanes so
    every batch tile is a sublane multiple (buckets 8/16/32 qualify; the
    full-77 bucket falls back to the flax tower)."""
    return s % 8 == 0


def _tile_tokens(b: int, s: int, itemsize: int = 2,
                 token_target: int = None) -> int:
    """Tokens per grid step: the largest ``bt·s`` with ``bt`` a divisor
    of ``b``, ``bt·s`` under the token target (cross-item attention
    redundancy grows with the tile; f32 tiles halve so split-mode
    activations stay inside VMEM next to the weights) and ``bt·s`` a
    sublane multiple. 0 = no valid tile (caller falls back to the
    unfused tower)."""
    if token_target is None:
        token_target = TOKEN_TARGET
    target = max(1, token_target * 2 // itemsize // s)
    best = 0
    for cand in range(1, min(b, target) + 1):
        if b % cand == 0 and (cand * s) % 8 == 0:
            best = cand
    return best * s


# Scoped-VMEM ceiling the split-half tiles must fit (bytes; the
# hardware limit is 16 MB — small headroom for Mosaic's fixed
# temporaries). Found the hard way (round 5): the padded-vision MLP
# half at t=896 / d=768 exceeds the scoped limit on a FRESH compile —
# it had shipped working only because a cached executable kept
# serving; any program change around it forced a recompile and an AOT
# "Ran out of memory in vmem while allocating on stack" error. The
# per-token coefficients below are fitted to the compiler's OWN
# accounting from that failure: at d=768/r=4 bf16, t=400 reports
# 15.60M (fits) and t=448 16.21-16.33M (rejected) -> MLP per-token
# bytes = 2 double-buffered [t,d] stream blocks + the [t,r·d]
# intermediate + one f32 [t,d] working copy = d·(4i + r·i + 4).
_SCOPED_VMEM = int(_os.environ.get("VQT_SCOPED_VMEM_BYTES",
                                   str(15_800_000)))


def _mlp_tile_max(d: int, mlp_ratio: int, itemsize: int) -> int:
    """Largest token tile whose MLP-half working set fits scoped VMEM
    (coefficients fitted to the hardware compiler's accounting — see
    _SCOPED_VMEM)."""
    budget = _SCOPED_VMEM - _mlp_weight_bytes(d, mlp_ratio, itemsize)
    per_tok = d * (4 * itemsize + mlp_ratio * itemsize + 4)
    return max(8, budget // per_tok)


def _attn_tile_max(d: int, itemsize: int) -> int:
    """Largest token tile whose attention-half working set (weights +
    double-buffered [t, d] stream blocks + [t, 3d] qkv + one f32
    [t, d] copy + two f32 [t, t] score surfaces) fits scoped VMEM —
    conservative quadratic solve."""
    w = _attn_weight_bytes(d, itemsize)
    budget = _SCOPED_VMEM - w
    lin = d * (7 * itemsize + 4)
    quad = 8.0
    disc = lin * lin + 4.0 * quad * budget
    return max(8, int(((disc ** 0.5) - lin) / (2 * quad)))


def _fit_tile(t: int, b: int, s: int, itemsize: int,
              max_tokens: int) -> int:
    """Shrink ``t`` to the largest legal tile (bt | b, bt·s sublane
    multiple) not exceeding ``max_tokens``; returns t unchanged when it
    already fits, 0 when no legal tile fits."""
    if t <= max_tokens:
        return t
    best = 0
    for cand in range(1, b + 1):
        if b % cand == 0 and (cand * s) % 8 == 0 \
                and cand * s <= max_tokens:
            best = cand
    return best * s


# Split-mode attention-half token target (vision towers): smaller than
# the shared TOKEN_TARGET because the attention surface pays t² x
# cross-item redundancy — see _run_layers for the measured win. 0
# disables the mixed-tile path (attn shares the MLP tile).
ATTN_TOKEN_TARGET = int(_os.environ.get("VQT_FUSED_ATTN_TOKENS", "256"))


def _ln_f32(x2: jax.Array, scale: jax.Array, bias: jax.Array,
            eps: float, out_dtype) -> jax.Array:
    """LayerNorm over lanes with f32 statistics (flax parity)."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


def _dot(a, w_ref, b_ref, dtype):
    """``a @ w + bias`` with f32 MXU accumulation, cast to ``dtype``."""
    out = jax.lax.dot_general(
        a, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    return out if b_ref is None else out + b_ref[:]


def _attn_math(x2, idr_ref, idc_ref, ln_ref, wqkv_ref, bqkv_ref,
               wout_ref, bout_ref, *, heads: int, eps: float,
               causal: bool):
    """LN1 → QKV → per-head whole-tile attention → out-proj → residual.

    Attention runs per HEAD over the whole [t, hd] tile — one
    [t, hd]·[hd, t] logits matmul per head under the item-block mask
    (tokens of different batch items never attend; the local item ids
    ride as [t, 1]/[1, t] operands). Cross-item score entries are
    redundant work the mask discards — cheap at CLIP seq lengths, and
    MXU-shaped beats loop-shaped (see module docstring).
    """
    t, d = x2.shape
    hd = d // heads
    dtype = x2.dtype
    fast = dtype == jnp.bfloat16
    y = _ln_f32(x2, ln_ref[0:1], ln_ref[1:2], eps, dtype)
    qkv = _dot(y, wqkv_ref, bqkv_ref, dtype)
    live = idr_ref[:] == idc_ref[:]                       # [t, t]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        live &= row >= col
    scale = hd ** -0.5
    outs = []
    for h in range(heads):
        q_h = qkv[:, h * hd:(h + 1) * hd]
        k_h = qkv[:, d + h * hd: d + (h + 1) * hd]
        v_h = qkv[:, 2 * d + h * hd: 2 * d + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(live, logits, NEG_INF)
        if fast:
            # unstabilized clamped-exp bf16 softmax — the
            # ops/attention.py serving contract (masked lanes -inf → 0)
            e = jnp.exp(jnp.minimum(logits, 60.0).astype(jnp.bfloat16))
            den = jnp.sum(e, axis=-1, keepdims=True)
            w = e * (1.0 / den)
        else:
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            den = jnp.sum(e, axis=-1, keepdims=True)
            w = (e / den).astype(dtype)
        outs.append(jax.lax.dot_general(
            w, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype))
    attn = jnp.concatenate(outs, axis=-1)
    return x2 + _dot(attn, wout_ref, bout_ref, dtype)


def _mlp_math(x3, ln_ref, ln_off: int, wfc1_ref, bfc1_ref, wfc2_ref,
              bfc2_ref, *, eps: float, act: str):
    """LN2 → MLP (quick-GELU or tanh-GELU) → residual.

    Both activations are written as explicit exps: Mosaic's
    lax.logistic/tanh lowerings broadcast an f32 constant into a bf16
    vector and fail kernel verification on hardware (caught by
    tpu_smoke; interpreter mode accepts them).
    - quick_gelu (CLIP):  x·σ(1.702x) = x / (1 + e^(-1.702x))
    - gelu_tanh (SigLIP): 0.5x(1+tanh(u)) = x·σ(2u) = x / (1 + e^(-2u))
      with u = √(2/π)·(x + 0.044715·x³) — algebraically identical to
      jax.nn.gelu(approximate=True).
    """
    dtype = x3.dtype
    z = _ln_f32(x3, ln_ref[ln_off:ln_off + 1],
                ln_ref[ln_off + 1:ln_off + 2], eps, dtype)
    h1 = _dot(z, wfc1_ref, bfc1_ref, dtype)
    if act == "quick_gelu":
        h1 = h1 * (1.0 / (1.0 + jnp.exp(-1.702 * h1)))
    elif act == "gelu_tanh":
        u = 0.7978845608028654 * (h1 + 0.044715 * (h1 * h1 * h1))
        h1 = h1 * (1.0 / (1.0 + jnp.exp(-2.0 * u)))
    else:  # pragma: no cover - guarded by the eligibility gates
        raise ValueError(f"unsupported fused-layer activation {act!r}")
    return x3 + _dot(h1, wfc2_ref, bfc2_ref, dtype)


def _layer_kernel(idr_ref, idc_ref, x_ref, ln_ref, wqkv_ref, bqkv_ref,
                  wout_ref, bout_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                  bfc2_ref, o_ref, *, heads: int, eps: float,
                  causal: bool, act: str):
    """One grid step: a full encoder block over a flat ``[t, D]`` tile."""
    x3 = _attn_math(x_ref[:], idr_ref, idc_ref, ln_ref, wqkv_ref,
                    bqkv_ref, wout_ref, bout_ref, heads=heads, eps=eps,
                    causal=causal)
    o_ref[...] = _mlp_math(x3, ln_ref, 2, wfc1_ref, bfc1_ref, wfc2_ref,
                           bfc2_ref, eps=eps, act=act)


def _attn_half_kernel(idr_ref, idc_ref, x_ref, ln_ref, wqkv_ref,
                      bqkv_ref, wout_ref, bout_ref, o_ref, *,
                      heads: int, eps: float, causal: bool):
    """Split mode, first half: LN1 → QKV → attention → out-proj →
    residual (wide towers whose full layer exceeds the VMEM weight
    budget — e.g. the 768-wide B/32 vision tower at 14.2 MB bf16)."""
    o_ref[...] = _attn_math(x_ref[:], idr_ref, idc_ref, ln_ref,
                            wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                            heads=heads, eps=eps, causal=causal)


def _mlp_half_kernel(x_ref, ln_ref, wfc1_ref, bfc1_ref, wfc2_ref,
                     bfc2_ref, o_ref, *, eps: float, act: str):
    """Split mode, second half: LN2 → MLP → residual."""
    o_ref[...] = _mlp_math(x_ref[:], ln_ref, 2, wfc1_ref, bfc1_ref,
                           wfc2_ref, bfc2_ref, eps=eps, act=act)


@functools.partial(jax.jit,
                   static_argnames=("heads", "eps", "causal", "act",
                                    "interpret"))
def _fused_layer_call(x2, idr, idc, ln, wqkv, bqkv, wout, bout, wfc1,
                      bfc1, wfc2, bfc2, *, heads: int, eps: float,
                      causal: bool, act: str, interpret: bool):
    big_t, d = x2.shape
    f = wfc1.shape[1]
    t = idr.shape[0]
    x_spec = pl.BlockSpec((t, d), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    n_layer_flops = 2 * t * (4 * d * d + 2 * f * d) + 4 * t * t * d
    return pl.pallas_call(
        functools.partial(_layer_kernel, heads=heads, eps=eps,
                          causal=causal, act=act),
        out_shape=jax.ShapeDtypeStruct((big_t, d), x2.dtype),
        grid=(big_t // t,),
        in_specs=[
            w_spec((t, 1)), w_spec((1, t)),
            x_spec,
            w_spec((4, d)),
            w_spec((d, 3 * d)), w_spec((1, 3 * d)),
            w_spec((d, d)), w_spec((1, d)),
            w_spec((d, f)), w_spec((1, f)),
            w_spec((f, d)), w_spec((1, d)),
        ],
        out_specs=x_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(big_t // t) * n_layer_flops,
            bytes_accessed=2 * big_t * d * x2.dtype.itemsize
            + (4 * d * d + 2 * f * d) * x2.dtype.itemsize,
            transcendentals=(big_t // t) * t * (f + heads * t),
        ),
    )(idr, idc, x2, ln, wqkv, bqkv, wout, bout, wfc1, bfc1, wfc2, bfc2)


def _attn_half_call(x2, idr, idc, ln, wqkv, bqkv, wout, bout, *,
                    heads: int, eps: float, causal: bool,
                    interpret: bool):
    """Attention half as one pallas_call (split mode; also timed alone
    by benchmarks/vision_decomp_bench.py)."""
    big_t, d = x2.shape
    t = idr.shape[0]
    x_spec = pl.BlockSpec((t, d), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_attn_half_kernel, heads=heads, eps=eps,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((big_t, d), x2.dtype),
        grid=(big_t // t,),
        in_specs=[
            w_spec((t, 1)), w_spec((1, t)),
            x_spec,
            w_spec((4, d)),
            w_spec((d, 3 * d)), w_spec((1, 3 * d)),
            w_spec((d, d)), w_spec((1, d)),
        ],
        out_specs=x_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(big_t // t) * (8 * t * d * d + 4 * t * t * d),
            bytes_accessed=2 * big_t * d * x2.dtype.itemsize
            + 4 * d * d * x2.dtype.itemsize,
            transcendentals=big_t * heads * t,
        ),
    )(idr, idc, x2, ln, wqkv, bqkv, wout, bout)


def _mlp_half_call(x3, ln, wfc1, bfc1, wfc2, bfc2, *, t: int,
                   eps: float, act: str, interpret: bool):
    """MLP half as one pallas_call (split mode's second kernel)."""
    big_t, d = x3.shape
    f = wfc1.shape[1]
    x_spec = pl.BlockSpec((t, d), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_mlp_half_kernel, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((big_t, d), x3.dtype),
        grid=(big_t // t,),
        in_specs=[
            x_spec,
            w_spec((4, d)),
            w_spec((d, f)), w_spec((1, f)),
            w_spec((f, d)), w_spec((1, d)),
        ],
        out_specs=x_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=(big_t // t) * 4 * t * f * d,
            bytes_accessed=2 * big_t * d * x3.dtype.itemsize
            + 2 * f * d * x3.dtype.itemsize,
            transcendentals=big_t * f,
        ),
    )(x3, ln, wfc1, bfc1, wfc2, bfc2)


@functools.partial(jax.jit,
                   static_argnames=("heads", "eps", "causal", "act",
                                    "interpret"))
def _split_layer_call(x2, idr, idc, ln, wqkv, bqkv, wout, bout, wfc1,
                      bfc1, wfc2, bfc2, *, heads: int, eps: float,
                      causal: bool, act: str, interpret: bool):
    """Split mode: the encoder block as TWO pallas_calls (attention
    half, MLP half) for towers whose full weight set exceeds the VMEM
    budget. The residual stream makes one HBM round-trip between the
    halves — still ~5x fewer kernel launches than the unfused tower."""
    t = idr.shape[0]
    x3 = _attn_half_call(x2, idr, idc, ln, wqkv, bqkv, wout, bout,
                         heads=heads, eps=eps, causal=causal,
                         interpret=interpret)
    return _mlp_half_call(x3, ln, wfc1, bfc1, wfc2, bfc2, t=t, eps=eps,
                          act=act, interpret=interpret)


def _layer_operands(p: dict, dtype):
    """Concatenated weight operands for one encoder block's param
    subtree (models/clip/model.py:EncoderBlock naming)."""
    attn = p["attn"]
    wqkv = jnp.concatenate(
        [attn[n]["kernel"] for n in ("q_proj", "k_proj", "v_proj")],
        axis=1).astype(dtype)
    bqkv = jnp.concatenate(
        [attn[n]["bias"] for n in ("q_proj", "k_proj", "v_proj")]
    ).reshape(1, -1).astype(dtype)
    ln = jnp.stack([
        p["layer_norm1"]["scale"], p["layer_norm1"]["bias"],
        p["layer_norm2"]["scale"], p["layer_norm2"]["bias"],
    ]).astype(jnp.float32)
    mlp = p["mlp"]
    return (ln, wqkv, bqkv,
            attn["out_proj"]["kernel"].astype(dtype),
            attn["out_proj"]["bias"].reshape(1, -1).astype(dtype),
            mlp["fc1"]["kernel"].astype(dtype),
            mlp["fc1"]["bias"].reshape(1, -1).astype(dtype),
            mlp["fc2"]["kernel"].astype(dtype),
            mlp["fc2"]["bias"].reshape(1, -1).astype(dtype))


def _normalize_out(feats: jax.Array, dtype) -> jax.Array:
    """Shared fused-encode epilogue: round the projection output to the
    tower dtype (the flax towers emit dtype activations), then L2
    normalize in f32 (models/clip/model.py:_normalize_f32 documents why
    a bf16 norm is not acceptable)."""
    feats = feats.astype(dtype).astype(jnp.float32)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


def _item_ids(t: int, s: int, s_live: int = None
              ) -> Tuple[jax.Array, jax.Array]:
    """Local item-id operands for one tile: token j belongs to item
    j // s — identical for every tile because t is a multiple of s.

    ``s_live < s`` = pad-token scheme (round-4 VERDICT item 2): each
    item's positions >= s_live are sequence PADDING carrying a UNIQUE
    NEGATIVE id, so a pad attends only itself (no empty softmax rows →
    no NaNs to contain) and never a real token — real-token outputs are
    exactly those of the unpadded sequence (masked columns contribute
    e = exp(-inf) = 0 to the f32 accumulate). Padding the sequence to a
    sublane multiple frees the batch-per-tile choice from the
    ``bt·s % 8`` constraint: at ViT-B/32's s=50 the smallest legal tile
    was bt=8 (t=400, an 8×-redundant attention surface); padded to 56
    bt=2 tiles (t=112) become legal, and B/16's s=197 (no legal tile at
    all) unlocks at 200."""
    ids = np.arange(t, dtype=np.int32) // s
    if s_live is not None and s_live < s:
        pos = np.arange(t, dtype=np.int32) % s
        ids = np.where(pos >= s_live,
                       -(1 + np.arange(t, dtype=np.int32)), ids)
    return jnp.asarray(ids[:, None]), jnp.asarray(ids[None, :])


def fused_vision_seq(s: int) -> int:
    """Vision sequence length the fused tower will run (pad-token
    scheme, ``VQT_FUSED_VISION_PAD=1`` opts in): the next sublane
    multiple. OPT-IN by measurement (same-session v5e A/B 2026-08-20
    ~14:36-14:54, B=256 bf16): padding B/32 to s'=56 reads 13,231 f/s
    at the default tile (pad flops, bt unchanged) and 14,354 at bt=4 —
    statistically the same as the unpadded t=400 config's 14,260 — so
    padding buys nothing where a natural tile exists. Where it would
    unlock a tile (B/16 s=197 → 200), the fused tower LOSES outright
    (3,833 vs 4,031 flax f/s, same session): long-seq 768-wide towers
    amortize XLA's per-op overhead on their own, and split-mode's HBM
    round-trips + cross-item redundancy then cost more than fusion
    saves — the same shape of result as SigLIP vision (round 3).
    Callers gate batch eligibility on THIS length."""
    if s % 8 == 0 or _os.environ.get("VQT_FUSED_VISION_PAD") != "1":
        return s
    return s + (8 - s % 8)


def _run_layers(x2, tower_params, *, num_layers: int, heads: int,
                eps: float, s: int, t: int, dtype, causal: bool,
                mlp_ratio: int, act: str = "quick_gelu",
                s_live: int = None, t_attn: int = None):
    """``t_attn``: split-mode attention-half tile override. The two
    split kernels need not share a tile — the attention half pays a
    t²-scaled cross-item redundancy the MLP half doesn't, so a SMALLER
    attn tile with the MLP at the full target wins where the
    per-kernel overhead is already amortized (same-session v5e A/B
    2026-08-20 ~22:35, B/32 vision B=256: attn-12 8.40 ms at t=400 →
    6.97 at t=200 while mlp-12 prefers 400: 9.23 vs 9.78 — mixed tiles
    recover ~1.4 ms of the 18 ms tower). Ignored in full mode."""
    interpret = _pallas_mode() == "interpret"
    mode = _layer_mode(x2.shape[1], mlp_ratio, dtype)
    if not mode:
        # callers gate on fused_*_tower_eligible, but budgets are
        # env-mutable between init and call — fail loudly rather than
        # launching over-budget kernels into an opaque Mosaic VMEM error
        raise ValueError(
            f"fused-layer weights for width {x2.shape[1]} exceed both "
            "VQT_FUSED_LAYER_BUDGET and VQT_FUSED_HALF_BUDGET; use the "
            "flax tower")
    if mode == "split":
        # cap tiles to what scoped VMEM actually fits on a fresh
        # compile (see _SCOPED_VMEM) — a tile the enumeration likes can
        # still blow the kernel's stack at wide d·ratio
        itemsize = jnp.dtype(dtype).itemsize
        d = x2.shape[1]
        b = x2.shape[0] // s
        mlp_max = _mlp_tile_max(d, mlp_ratio, itemsize)
        attn_max = _attn_tile_max(d, itemsize)
        if t_attn is None or t_attn == t:
            t_fit = _fit_tile(t, b, s, itemsize, min(mlp_max, attn_max))
        else:
            t_fit = _fit_tile(t, b, s, itemsize, mlp_max)
            t_attn = _fit_tile(t_attn, b, s, itemsize, attn_max)
        if not t_fit or (t_attn is not None and not t_attn):
            raise ValueError(
                f"no legal split-mode tile fits scoped VMEM for width "
                f"{d} at s={s}; use the flax tower")
        t = t_fit
    if mode == "full" or t_attn is None or t_attn == t:
        call = _fused_layer_call if mode == "full" else _split_layer_call
        idr, idc = _item_ids(t, s, s_live)
        for i in range(num_layers):
            ops = _layer_operands(tower_params["encoder"][f"layers_{i}"],
                                  dtype)
            x2 = call(x2, idr, idc, *ops, heads=heads, eps=eps,
                      causal=causal, act=act, interpret=interpret)
        return x2
    idr, idc = _item_ids(t_attn, s, s_live)
    for i in range(num_layers):
        (ln, wqkv, bqkv, wout, bout, wfc1, bfc1, wfc2,
         bfc2) = _layer_operands(tower_params["encoder"][f"layers_{i}"],
                                 dtype)
        x2 = _attn_half_call(x2, idr, idc, ln, wqkv, bqkv, wout, bout,
                             heads=heads, eps=eps, causal=causal,
                             interpret=interpret)
        x2 = _mlp_half_call(x2, ln, wfc1, bfc1, wfc2, bfc2, t=t,
                            eps=eps, act=act, interpret=interpret)
    return x2


def fused_text_encode(params, input_ids: jax.Array, *, cfg,
                      dtype) -> jax.Array:
    """Full CLIP text encode through fused-layer kernels.

    Drop-in for ``CLIP.encode_text`` (models/clip/model.py:275-278):
    token+position embed → 12 fused encoder blocks → final LN → EOT
    pooling → projection → f32 L2 normalize. ``params`` is the full
    CLIP param tree; ``cfg`` the CLIPConfig; output ``[B, proj]``
    f32 unit rows.
    """
    c = cfg.text
    tp = params["text"]
    b, s = input_ids.shape
    t = _tile_tokens(b, s, jnp.dtype(dtype).itemsize)
    emb = tp["token_embedding"]["embedding"].astype(dtype)
    x = emb[input_ids]
    pos = tp["position_embedding"].astype(dtype)
    x2 = (x + pos[None, :s]).reshape(b * s, -1)
    x2 = _run_layers(x2, tp, num_layers=c.num_layers,
                     heads=c.num_heads, eps=c.layer_norm_eps, s=s, t=t,
                     dtype=dtype, causal=True, mlp_ratio=c.mlp_ratio)
    # pool BEFORE the final LN: LayerNorm is per-token, so
    # LN(x)[eot] == LN(x[eot]) — S× less epilogue work than the flax
    # tower's order (model.py:233-236), bit-for-bit the same rows
    fl = tp["final_layer_norm"]
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x2[jnp.arange(b) * s + eot]
    pooled = _ln_f32(pooled, fl["scale"].astype(jnp.float32)[None],
                     fl["bias"].astype(jnp.float32)[None],
                     c.layer_norm_eps, dtype)
    proj = params["text_projection"]["kernel"].astype(dtype)
    feats = jax.lax.dot_general(
        pooled, proj, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return _normalize_out(feats, dtype)


def fused_vision_encode(params, pixel_values: jax.Array, *, cfg,
                        dtype) -> jax.Array:
    """Full CLIP image encode through fused-layer kernels.

    Drop-in for ``CLIP.encode_image`` (models/clip/model.py:270-273):
    conv patchify → class token + positions → pre-LN → 12 fused
    non-causal encoder blocks → CLS pooling → post-LN → projection →
    f32 L2 normalize. ``pixel_values`` NHWC normalized; output
    ``[B, proj]`` f32 unit rows. Patchify/embed/pool stay XLA ops —
    they are one-shot, not per-layer."""
    c = cfg.vision
    vp = params["vision"]
    b = pixel_values.shape[0]
    d = c.hidden_size
    s = c.seq_len
    s_pad = fused_vision_seq(s)
    t = _tile_tokens(b, s_pad, jnp.dtype(dtype).itemsize)
    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(dtype),
        vp["patch_embedding"]["kernel"].astype(dtype),
        window_strides=(c.patch_size, c.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches.reshape(b, c.num_patches, d)
    cls = vp["class_embedding"].astype(dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls, (b, 1, d)), patches], axis=1)
    x = x + vp["position_embedding"].astype(dtype)[None]
    if s_pad != s:
        # pad-token scheme (see _item_ids): dead rows whose unique
        # negative ids keep them out of every real token's attention.
        # Real-token outputs are identical in exact arithmetic (pinned
        # by the f32 CPU parity test); on hardware bf16 the changed
        # TILE SIZE alters Mosaic's matmul strategy, giving ~2e-3
        # rounding spread vs the unpadded run (tpu_smoke pins the bar)
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    x2 = x.reshape(b * s_pad, d)
    pre = vp["pre_layernorm"]
    x2 = _ln_f32(x2, pre["scale"].astype(jnp.float32)[None],
                 pre["bias"].astype(jnp.float32)[None],
                 c.layer_norm_eps, dtype)
    t_attn = (_tile_tokens(b, s_pad, jnp.dtype(dtype).itemsize,
                           token_target=ATTN_TOKEN_TARGET)
              if ATTN_TOKEN_TARGET else None)
    x2 = _run_layers(x2, vp, num_layers=c.num_layers,
                     heads=c.num_heads, eps=c.layer_norm_eps, s=s_pad,
                     t=t, dtype=dtype, causal=False,
                     mlp_ratio=c.mlp_ratio, s_live=s,
                     t_attn=t_attn or None)
    # CLS pool as a reshape+slice, not a strided GATHER: the gather
    # form measured 2.2 ms standalone per 256-batch on v5e (a ~0-FLOP
    # epilogue; vision_decomp_bench 2026-08-20) — slices lower to a
    # strided copy
    pooled = x2.reshape(b, s_pad, d)[:, 0]               # CLS tokens
    post = vp["post_layernorm"]
    pooled = _ln_f32(pooled, post["scale"].astype(jnp.float32)[None],
                     post["bias"].astype(jnp.float32)[None],
                     c.layer_norm_eps, dtype)
    proj = params["visual_projection"]["kernel"].astype(dtype)
    feats = jax.lax.dot_general(
        pooled, proj, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return _normalize_out(feats, dtype)


def fused_encode_shard_map(encode_fn, mesh, data_axis: str,
                           in_ndim: int):
    """Mesh serving path: run a fused encode per DATA shard under
    ``shard_map`` (params replicated, batch axis sharded). A
    ``pallas_call`` inside a jit over sharded operands requires
    shard_map — without it XLA would gather the full batch onto every
    device. ``encode_fn(params, x) -> [b_local, D]``; ``in_ndim`` is
    the rank of ``x`` (2 for token ids, 4 for NHWC pixels). Callers
    gate on ``b % mesh.shape[data_axis] == 0`` and per-SHARD batch
    eligibility."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    in_spec = P(data_axis, *([None] * (in_ndim - 1)))
    return shard_map(encode_fn, mesh=mesh,
                     in_specs=(P(), in_spec),
                     out_specs=P(data_axis, None),
                     check_vma=False)


def fused_batch_eligible(b: int, s: int, dtype=jnp.bfloat16) -> bool:
    """Per-call gate shared by both towers: a valid token tile exists
    FOR THIS DTYPE (f32 halves the token target — a shape can tile in
    bf16 but not f32) AND the batch is wide enough that per-pallas_call
    overhead wins over XLA's fused executable (MIN_TOKENS; single-query
    latency dispatches stay on the flax tower)."""
    return (b * s >= MIN_TOKENS
            and _tile_tokens(b, s, jnp.dtype(dtype).itemsize) > 0)
