"""Whole-transformer-layer Pallas kernel for the CLIP text tower.

TPU-native replacement for the per-op XLA lowering of the text tower's
encoder blocks (models/clip/model.py:EncoderBlock — the JAX analog of the
reference's HF ``CLIPEncoderLayer``, used via
/root/reference/video_search_overhaul.py:278-295). Motivation (measured,
v5e, B=256 stacked-jit 2026-08-19): the text encode has a ~1.7 ms
seq-INDEPENDENT floor per 256-batch — s8 2.80 / s16 3.94 / s32 5.98 ms —
while its pure matmul time at s16 is ~0.8 ms. At these shapes
([2048, 512] tokens against [512, 512..2048] weights) every matmul
retires in single-digit microseconds, so the floor is ~10 XLA kernel
launches per layer × 12 layers of fixed per-op overhead, not FLOPs or
bandwidth. The fix is structural: run the ENTIRE encoder block —
LN1 → fused-QKV matmul → per-head causal attention → out-projection →
residual → LN2 → MLP (quick-GELU) → residual — as ONE ``pallas_call``
per layer, with the layer's full weight set resident in VMEM (6.3 MB in
bf16 for the 512-wide CLIP text tower) and activations never touching
HBM between ops.

Design
------
- grid ``(B / bt,)`` over batch tiles; ``bt`` sized so ``bt·S ≈ 512``
  tokens — large enough that the five weight matmuls hit the MXU with
  full tiles, small enough that activations + weights fit VMEM. Weight
  BlockSpecs are grid-invariant, so Mosaic fetches them once per call.
- ALL matmuls — projections and attention — run on the merged
  ``[bt·S, D]`` token matrix (a free leading-dim reshape): attention is
  one ``[t, hd]·[hd, t]`` logits matmul per head under an item-block
  causal mask (S is a power of two, so item-of-token is a shift
  compare), with the same f32-accumulate / bf16-fast-softmax contract
  as ops/attention.py (unstabilized clamped-exp softmax in bf16;
  stabilized f32 otherwise). Cross-item logits are masked redundancy —
  cheap at serving seq buckets, and MXU-shaped matmuls beat the
  loop-shaped alternative (a per-item ``fori_loop`` measured slower
  than the unfused tower).
- LayerNorm statistics are f32 (matching flax's ``_compute_stats``
  upcast); scale/bias apply in f32 then cast to the residual dtype.
- causal masking only — like the unfused tower, key padding columns are
  NOT masked: under a causal mask no position after a row's EOT can
  reach that row, and only EOT rows are pooled (embedder.trim_text_ids
  relies on the same invariant).

Serving-only by design: the trainer differentiates the flax tower
(models/clip/model.py), which keeps its own fused-attention custom VJP.
This path has no VJP and is used by CLIPEmbedder for inference.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_quierer_tpu.utils.env import use_pallas

NEG_INF = float("-inf")

# Per-layer weight budget (bytes) for VMEM residency. The bf16 512-wide
# CLIP text layer needs 6.3 MB; f32 (12.6 MB) and the 768-wide SigLIP
# text layer (14 MB bf16) exceed it and take the unfused tower.
WEIGHT_BUDGET = int(_os.environ.get("VQT_FUSED_LAYER_BUDGET",
                                    str(9 * 2 ** 20)))
# Target tokens per grid step (bt = TOKEN_TARGET // S, clamped to a
# divisor of B): balances MXU tile size against VMEM activation scratch.
TOKEN_TARGET = int(_os.environ.get("VQT_FUSED_LAYER_TOKENS", "512"))


def _pallas_mode() -> str:
    if _os.environ.get("VQT_PALLAS_INTERPRET") == "1":
        return "interpret"
    return "compiled" if use_pallas() else "off"


def _layer_weight_bytes(d: int, mlp_ratio: int, itemsize: int) -> int:
    # qkv [D,3D] + out [D,D] + fc1 [D,rD] + fc2 [rD,D] (+ biases, LN)
    return (4 * d * d + 2 * mlp_ratio * d * d + (5 + 2 * mlp_ratio) * d
            + 4 * d * 4) * itemsize


def fused_text_tower_eligible(cfg_text: Any, dtype, mesh=None) -> bool:
    """Static (init-time) eligibility of the whole fused text tower."""
    if _pallas_mode() == "off":
        return False
    if _os.environ.get("VQT_FUSED_LAYER") == "0":  # A/B + escape hatch
        return False
    if mesh is not None:
        # a pallas_call inside a jit over sharded operands needs
        # shard_map; mesh serving keeps the XLA tower
        return False
    d, h = cfg_text.hidden_size, cfg_text.num_heads
    if d % 128 or d % h:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return _layer_weight_bytes(d, cfg_text.mlp_ratio, itemsize) \
        <= WEIGHT_BUDGET


def fused_seq_eligible(s: int) -> bool:
    """Per-call shape gate: S must tile sublanes AND be a power of two
    so the kernel's item-block mask is a shift compare (embedder seq
    buckets 8/16/32 qualify; the full-77 bucket falls back to the flax
    tower)."""
    return s % 8 == 0 and (s & (s - 1)) == 0


def _batch_tile(b: int, s: int) -> int:
    target = max(1, TOKEN_TARGET // s)
    bt = 1
    for cand in range(1, min(b, target) + 1):
        if b % cand == 0:
            bt = cand
    return bt


def _ln_f32(x2: jax.Array, scale: jax.Array, bias: jax.Array,
            eps: float, out_dtype) -> jax.Array:
    """LayerNorm over lanes with f32 statistics (flax parity)."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


def _layer_kernel(x_ref, ln_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                  wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref, o_ref,
                  *, heads: int, eps: float):
    """One grid step: a full encoder block over a ``[bt, S, D]`` tile."""
    bt, s, d = x_ref.shape
    t = bt * s
    hd = d // heads
    dtype = x_ref.dtype
    fast = dtype == jnp.bfloat16
    x2 = x_ref[:].reshape(t, d)

    # LN1 → fused QKV projection
    y = _ln_f32(x2, ln_ref[0:1], ln_ref[1:2], eps, dtype)
    qkv = jax.lax.dot_general(
        y, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) + bqkv_ref[:]

    # Attention runs per HEAD over the whole merged [t, hd] token
    # matrix — one [t, hd]·[hd, t] logits matmul per head with an
    # item-block causal mask, instead of a fori_loop over items issuing
    # bt·heads·3 tiny [S, hd]-shaped matmuls (a first version did that:
    # 768 serial MXU ops per grid step measured SLOWER than the unfused
    # tower, 4.50 vs 3.97 ms per 256-batch at s16). Cross-item score
    # entries are redundant work the mask discards, but at serving seq
    # buckets (8-32) the whole attention stage is ~17% of the layer's
    # FLOPs even with the s/bt-fold redundancy — MXU-shaped beats
    # loop-shaped. S is a power of two (fused_seq_eligible), so the
    # item-of-token test is a shift compare.
    shift = s.bit_length() - 1
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    live = ((row >> shift) == (col >> shift)) & (row >= col)
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

    # out-projection + residual
    proj = jax.lax.dot_general(
        attn, wout_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) + bout_ref[:]
    x3 = x2 + proj

    # LN2 → MLP (quick-GELU) → residual
    z = _ln_f32(x3, ln_ref[2:3], ln_ref[3:4], eps, dtype)
    h1 = jax.lax.dot_general(
        z, wfc1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) + bfc1_ref[:]
    # quick-GELU x·σ(1.702x) written as an explicit exp: Mosaic's
    # lax.logistic lowering broadcasts an f32 constant into a bf16
    # vector and fails kernel verification on hardware (caught by
    # tpu_smoke; interpreter mode accepts it)
    h1 = h1 * (1.0 / (1.0 + jnp.exp(-1.702 * h1)))
    h2 = jax.lax.dot_general(
        h1, wfc2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) + bfc2_ref[:]
    o_ref[...] = (x3 + h2).reshape(bt, s, d)


@functools.partial(jax.jit,
                   static_argnames=("heads", "eps", "interpret"))
def _fused_layer_call(x, ln, wqkv, bqkv, wout, bout, wfc1, bfc1, wfc2,
                      bfc2, *, heads: int, eps: float, interpret: bool):
    b, s, d = x.shape
    f = wfc1.shape[1]
    bt = _batch_tile(b, s)
    x_spec = pl.BlockSpec((bt, s, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    t = bt * s
    n_layers_flops = 2 * t * (4 * d * d + 2 * f * d) + 4 * t * t * d
    return pl.pallas_call(
        functools.partial(_layer_kernel, heads=heads, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        grid=(b // bt,),
        in_specs=[
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
            flops=(b // bt) * n_layers_flops,
            bytes_accessed=2 * b * s * d * x.dtype.itemsize
            + (4 * d * d + 2 * f * d) * x.dtype.itemsize,
            transcendentals=(b // bt) * t * (f + heads * t),
        ),
    )(x, ln, wqkv, bqkv, wout, bout, wfc1, bfc1, wfc2, bfc2)


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


def fused_text_encode(params, input_ids: jax.Array, *, cfg,
                      dtype) -> jax.Array:
    """Full CLIP text encode through fused-layer kernels.

    Drop-in for ``CLIP.encode_text`` (models/clip/model.py:275-278):
    token+position embed → 12 fused encoder blocks → final LN → EOT
    pooling → projection → f32 L2 normalize. ``params`` is the full
    CLIP param tree; ``cfg`` the CLIPTextConfig; output ``[B, proj]``
    f32 unit rows.
    """
    interpret = _pallas_mode() == "interpret"
    c = cfg.text
    t = params["text"]
    s = input_ids.shape[1]
    emb = t["token_embedding"]["embedding"].astype(dtype)
    x = emb[input_ids]
    pos = t["position_embedding"].astype(dtype)
    x = x + pos[None, :s]
    for i in range(c.num_layers):
        ops = _layer_operands(t["encoder"][f"layers_{i}"], dtype)
        x = _fused_layer_call(x, *ops, heads=c.num_heads,
                              eps=c.layer_norm_eps, interpret=interpret)
    # pool BEFORE the final LN: LayerNorm is per-token, so
    # LN(x)[eot] == LN(x[eot]) — S× less epilogue work than the flax
    # tower's order (model.py:233-236), bit-for-bit the same rows
    fl = t["final_layer_norm"]
    b = x.shape[0]
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    pooled = _ln_f32(pooled, fl["scale"].astype(jnp.float32)[None],
                     fl["bias"].astype(jnp.float32)[None],
                     c.layer_norm_eps, dtype)
    proj = params["text_projection"]["kernel"].astype(dtype)
    feats = jax.lax.dot_general(
        pooled, proj, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype)
    feats = feats.astype(jnp.float32)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
