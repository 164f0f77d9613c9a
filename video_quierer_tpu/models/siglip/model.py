"""Flax SigLIP: sigmoid-loss dual encoder (second model family).

The reference is hard-wired to CLIP; SigLIP (Zhai et al., 2023) is the
stronger modern dual encoder for retrieval, so the framework supports it
as a first-class family. Architecture follows ``google/siglip-base-
patch16-224`` (verified against a locally-built ``transformers.SiglipModel``
in tests, same strategy as the CLIP parity tests):

- tanh-GELU activation, layernorm eps 1e-6;
- vision: biased conv patchify, NO class token, learned positions,
  encoder, post-LN over all tokens, **MAP head** (learned probe ×
  multi-head attention pooling + LN + MLP residual);
- text: token+position embeddings, NON-causal encoder, final LN, pooled
  at the LAST token position, linear head;
- no projection to a smaller shared dim — towers compare at full width
  with a learnable logit scale *and bias* under the pairwise **sigmoid
  loss** (no all-pairs softmax ⇒ no cross-device gather needed when
  data-parallel, a nice TPU property).

Reuses the transformer blocks from ``models/clip/model.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from video_quierer_tpu.models.clip.model import MLP, Encoder

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class SigLIPTextConfig:
    vocab_size: int = 32_000
    context_length: int = 64
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    name: str = "siglip-base-patch16-224"
    vision: SigLIPVisionConfig = dataclasses.field(
        default_factory=SigLIPVisionConfig)
    text: SigLIPTextConfig = dataclasses.field(
        default_factory=SigLIPTextConfig)
    logit_scale_init: float = 2.303   # ln(10), the paper's t' init
    logit_bias_init: float = -10.0


def siglip_base_patch16() -> SigLIPConfig:
    return SigLIPConfig()


class MAPHead(nn.Module):
    """Multi-head attention pooling: a learned probe attends over tokens.

    Matches ``SiglipMultiheadAttentionPoolingHead``: probe→MHA(tokens),
    then ``x + MLP(LN(x))`` residual, output the probe position.
    """

    num_heads: int
    mlp_ratio: int
    eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        b, s, d = tokens.shape
        head_dim = d // self.num_heads
        probe = self.param("probe", nn.initializers.normal(1.0), (1, 1, d))
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(
            jnp.broadcast_to(probe, (b, 1, d)).astype(self.dtype))
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(tokens)
        split = lambda t, n: t.reshape(b, n, self.num_heads, head_dim)
        qh, kh, vh = split(q, 1), split(k, s), split(v, s)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * head_dim ** -0.5, kh,
                            preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(b, 1, d)
        x = nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layernorm")(x)
        x = x + MLP(self.mlp_ratio, dtype=self.dtype, act="gelu_tanh",
                    name="mlp")(y)
        return x[:, 0]


class SigLIPVisionTower(nn.Module):
    cfg: SigLIPVisionConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        c = self.cfg
        b = pixel_values.shape[0]
        patches = nn.Conv(
            c.hidden_size, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=True,
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        x = patches.reshape(b, c.num_patches, c.hidden_size)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.num_patches, c.hidden_size)).astype(self.dtype)
        x = x + pos[None]
        x = Encoder(c.num_layers, c.num_heads, c.mlp_ratio,
                    c.layer_norm_eps, dtype=self.dtype, remat=self.remat,
                    act="gelu_tanh", name="encoder")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="post_layernorm")(x)
        return MAPHead(c.num_heads, c.mlp_ratio, c.layer_norm_eps,
                       dtype=self.dtype, name="head")(x)


class SigLIPTextTower(nn.Module):
    cfg: SigLIPTextConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.context_length, c.hidden_size)
                         ).astype(self.dtype)
        x = tok + pos[None, : input_ids.shape[1]]
        x = Encoder(c.num_layers, c.num_heads, c.mlp_ratio,
                    c.layer_norm_eps, causal=False, dtype=self.dtype,
                    remat=self.remat, act="gelu_tanh", name="encoder")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        pooled = x[:, -1]  # last token position (SigLIP convention)
        return nn.Dense(c.hidden_size, dtype=self.dtype,
                        name="head")(pooled)


class SigLIP(nn.Module):
    cfg: SigLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.vision = SigLIPVisionTower(self.cfg.vision, dtype=self.dtype,
                                        remat=self.remat)
        self.text = SigLIPTextTower(self.cfg.text, dtype=self.dtype,
                                    remat=self.remat)
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.cfg.logit_scale_init), ())
        self.logit_bias = self.param(
            "logit_bias",
            nn.initializers.constant(self.cfg.logit_bias_init), ())

    def encode_image(self, pixel_values: jax.Array,
                     normalize: bool = True) -> jax.Array:
        # f32 normalize (see clip/model.py:_normalize_f32 — bf16 norms
        # leave rows ~0.4% off unit length)
        from video_quierer_tpu.models.clip.model import _normalize_f32
        return _normalize_f32(self.vision(pixel_values), normalize)

    def encode_text(self, input_ids: jax.Array,
                    normalize: bool = True) -> jax.Array:
        from video_quierer_tpu.models.clip.model import _normalize_f32
        return _normalize_f32(self.text(input_ids), normalize)

    def __call__(self, pixel_values: jax.Array, input_ids: jax.Array):
        img = self.encode_image(pixel_values)
        txt = self.encode_text(input_ids)
        return img, txt, jnp.exp(self.logit_scale), self.logit_bias


def siglip_sigmoid_loss(image_feats: jax.Array, text_feats: jax.Array,
                        logit_scale: jax.Array, logit_bias: jax.Array
                        ) -> jax.Array:
    """Pairwise sigmoid loss: every (i, j) pair is an independent binary
    problem (positive on the diagonal). No batch-wide softmax — under
    data parallelism each device can evaluate its pair block without the
    all-gather the CLIP loss needs."""
    logits = logit_scale * jnp.dot(image_feats, text_feats.T,
                                   preferred_element_type=jnp.float32) \
        + logit_bias
    n = logits.shape[0]
    signs = 2.0 * jnp.eye(n) - 1.0          # +1 diagonal, −1 elsewhere
    return -jnp.mean(jax.nn.log_sigmoid(signs * logits))


def siglip_init_params(model: SigLIP, seed: int = 0):
    c = model.cfg
    rng = jax.random.PRNGKey(seed)
    return model.init(
        rng,
        jnp.zeros((1, c.vision.image_size, c.vision.image_size, 3),
                  jnp.float32),
        jnp.zeros((1, c.text.context_length), jnp.int32),
    )["params"]
