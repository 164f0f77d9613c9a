"""Fused-layer serving encodes for the SigLIP towers.

SigLIP-side twins of ``ops/fused_layer.py``'s CLIP encodes (the kernels
are shared — non-causal item-block masking, gelu_tanh activation, SPLIT
attn/MLP mode for the 768-wide layers). Rebuilds the encoder stack of
``models/siglip/model.py:SigLIPTextTower / SigLIPVisionTower`` (the
framework's second family next to the reference's hard-wired CLIP,
/root/reference/video_search_overhaul.py:127-130); embed/pool/head
epilogues stay XLA ops — they are one-shot, not per-layer.

- text: token+position embed → 12 fused non-causal blocks → final LN at
  the pooled LAST token (LN is per-token, so pool-then-LN is exact) →
  linear head → f32 L2 normalize.
- vision: biased conv patchify → positions → 12 fused blocks → post-LN
  over ALL tokens → MAP head (probe attention pooling, XLA: one
  1-query attention + MLP) → f32 L2 normalize.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from video_quierer_tpu.ops.fused_layer import (
    _ln_f32,
    _normalize_out,
    _run_layers,
    _tile_tokens,
)

__all__ = ["fused_siglip_text_encode", "fused_siglip_vision_encode",
           "siglip_fused_vision_enabled"]


def siglip_fused_vision_enabled() -> bool:
    """Serving default OFF for the SigLIP vision tower: fused measured
    SLOWER than the flax tower here (3,791 vs 3,985 f/s, embed_bench
    --model siglip batch 128 bf16, v5e 2026-08-19) — at 768 width the
    per-op overhead fusion removes is small next to the bt=2 tile's
    cross-item attention redundancy at s=196. (CLIP's s=50 vision tower
    and SigLIP's s=64 text tower both measure ahead fused.) Opt back in
    with VQT_SIGLIP_FUSED_VISION=1; tpu_smoke keeps checking parity."""
    return _os.environ.get("VQT_SIGLIP_FUSED_VISION") == "1"


def _ln_params(p, dtype=jnp.float32):
    return (p["scale"].astype(dtype)[None], p["bias"].astype(dtype)[None])


def fused_siglip_text_encode(params, input_ids: jax.Array, *, cfg,
                             dtype) -> jax.Array:
    """Drop-in for ``SigLIP.encode_text`` (models/siglip/model.py:188).
    Output ``[B, hidden]`` f32 unit rows."""
    c = cfg.text
    tp = params["text"]
    b, s = input_ids.shape
    t = _tile_tokens(b, s, jnp.dtype(dtype).itemsize)
    emb = tp["token_embedding"]["embedding"].astype(dtype)
    pos = tp["position_embedding"].astype(dtype)
    x2 = (emb[input_ids] + pos[None, :s]).reshape(b * s, -1)
    x2 = _run_layers(x2, tp, num_layers=c.num_layers,
                     heads=c.num_heads, eps=c.layer_norm_eps, s=s, t=t,
                     dtype=dtype, causal=False, mlp_ratio=c.mlp_ratio,
                     act="gelu_tanh")
    sc, bi = _ln_params(tp["final_layer_norm"])
    pooled = x2[jnp.arange(b) * s + (s - 1)]   # last-token pooling
    pooled = _ln_f32(pooled, sc, bi, c.layer_norm_eps, dtype)
    head = tp["head"]
    feats = jax.lax.dot_general(
        pooled, head["kernel"].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dtype) \
        + head["bias"].astype(dtype)[None]
    return _normalize_out(feats, dtype)


def _map_head(tokens: jax.Array, hp, *, heads: int, eps: float,
              dtype) -> jax.Array:
    """MAP head (models/siglip/model.py:MAPHead) in plain jnp over the
    head's param subtree: learned probe attends over all tokens, MLP
    residual, emit the probe position."""
    b, s, d = tokens.shape
    hd = d // heads

    def dense(x, p):
        return jnp.einsum("...d,df->...f", x, p["kernel"].astype(dtype),
                          preferred_element_type=jnp.float32
                          ).astype(dtype) + p["bias"].astype(dtype)

    probe = jnp.broadcast_to(hp["probe"].astype(dtype), (b, 1, d))
    q = dense(probe, hp["q_proj"])
    k = dense(tokens, hp["k_proj"])
    v = dense(tokens, hp["v_proj"])
    split = lambda a, n: a.reshape(b, n, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", split(q, 1) * hd ** -0.5,
                        split(k, s), preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, split(v, s)).reshape(b, 1, d)
    x = dense(out, hp["out_proj"])
    ln = hp["layernorm"]
    y = _ln_f32(x.reshape(b, d), ln["scale"].astype(jnp.float32)[None],
                ln["bias"].astype(jnp.float32)[None], eps, dtype)
    h1 = dense(y, hp["mlp"]["fc1"])
    h1 = jax.nn.gelu(h1, approximate=True)
    return (x.reshape(b, d) + dense(h1, hp["mlp"]["fc2"]))


def fused_siglip_vision_encode(params, pixel_values: jax.Array, *, cfg,
                               dtype) -> jax.Array:
    """Drop-in for ``SigLIP.encode_image`` (models/siglip/model.py:181).
    Output ``[B, hidden]`` f32 unit rows."""
    c = cfg.vision
    vp = params["vision"]
    b = pixel_values.shape[0]
    d = c.hidden_size
    s = c.num_patches
    t = _tile_tokens(b, s, jnp.dtype(dtype).itemsize)
    pe = vp["patch_embedding"]
    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(dtype), pe["kernel"].astype(dtype),
        window_strides=(c.patch_size, c.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) \
        + pe["bias"].astype(dtype)
    x = patches.reshape(b, s, d) + vp["position_embedding"
                                      ].astype(dtype)[None]
    x2 = _run_layers(x.reshape(b * s, d), vp, num_layers=c.num_layers,
                     heads=c.num_heads, eps=c.layer_norm_eps, s=s, t=t,
                     dtype=dtype, causal=False, mlp_ratio=c.mlp_ratio,
                     act="gelu_tanh")
    sc, bi = _ln_params(vp["post_layernorm"])
    x2 = _ln_f32(x2, sc, bi, c.layer_norm_eps, dtype)  # ALL tokens
    feats = _map_head(x2.reshape(b, s, d), vp["head"],
                      heads=c.num_heads, eps=c.layer_norm_eps,
                      dtype=dtype)
    return _normalize_out(feats, dtype)
