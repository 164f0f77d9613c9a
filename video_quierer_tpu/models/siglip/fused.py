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

The VISION twin was DELETED in round 4 (VERDICT item 7): it measured
slower than the flax tower in every configuration tried (3,791 vs
3,985 f/s round 3; the round-4 B/16 probe confirmed the pattern —
long-seq 768-wide vision towers amortize XLA's per-op overhead on
their own, and split-mode's costs then exceed fusion's savings), so
the gated dark path was removed rather than maintained. SigLIP vision
serves on the flax tower; SigLIP text keeps the fused path (measured
ahead: 20.77 vs 21.13 ms/256-batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from video_quierer_tpu.ops.fused_layer import (
    _ln_f32,
    _normalize_out,
    _run_layers,
    _tile_tokens,
)

__all__ = ["fused_siglip_text_encode"]


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
