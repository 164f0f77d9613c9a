"""Flax CLIP: ViT image tower + causal text tower with projection heads.

TPU-native replacement for the reference's HuggingFace PyTorch CLIP usage
(``VideoProcessor._init_clip`` / ``_get_clip_embedding`` /
``_encode_clip_text``, video_search_overhaul.py:120-141, 210-232, 278-295).
The reference runs one frame at a time through ``CLIPModel.get_image_features``
with two host↔device transfers per frame (SURVEY.md §3.2 calls this the
"#1 perf sin"); here both towers are pure jittable functions over batched,
fixed-shape inputs, designed for ``pjit`` over a data axis.

Architecture matches ``openai/clip-vit-base-patch32``:
- pre-LN transformer blocks, quick-GELU activation,
- vision: 32×32 conv patchify (no bias), class token, learned positions,
  pre-LN, post-LN on the CLS token, linear projection to 512,
- text: 49408-token embedding, 77 learned positions, causal mask, final LN,
  features pooled at the EOT token position, linear projection to 512.

Weight layout is flax-native (``kernel [in, out]``, NHWC conv); the HF
checkpoint converter lives in ``convert.py``. Inputs are NHWC images —
TPU's preferred layout — already resized/normalized (ops/preprocess.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from video_quierer_tpu.models.clip.config import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)
from video_quierer_tpu.ops.attention import (
    fused_attention,
    fused_attention_eligible,
)

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: ``x * sigmoid(1.702 x)`` (not tanh-GELU)."""
    return x * jax.nn.sigmoid(1.702 * x)


class Attention(nn.Module):
    """Multi-head self-attention with optional causal masking.

    Written out explicitly (rather than ``nn.SelfAttention``) so the qkv /
    out projections keep names the tensor-parallel partitioning rules and
    the HF converter can address, and so compute dtype is controlled.
    """

    num_heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        head_dim = d // self.num_heads
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q, k, v = (dense(n)(x) for n in ("q_proj", "k_proj", "v_proj"))
        b, s, _ = x.shape
        if fused_attention_eligible(s, self.num_heads, d):
            # fused Pallas path: one head-stacked VMEM-resident score
            # block per item — measured 9.4k → 14k+ f/s on the B/32
            # tower (ops/attention.py). Same f32-softmax contract.
            out = fused_attention(q, k, v, num_heads=self.num_heads,
                                  causal=self.causal)
            return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
        split = lambda t: t.reshape(b, s, self.num_heads, head_dim)
        q, k, v = split(q), split(k), split(v)
        scale = head_dim ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                            preferred_element_type=jnp.float32)
        if self.causal:
            mask = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(mask[None, None], logits, -jnp.inf)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """Tanh-approximated GELU (SigLIP's activation)."""
    return jax.nn.gelu(x, approximate=True)


ACTIVATIONS = {"quick_gelu": quick_gelu, "gelu_tanh": gelu_tanh}


class MLP(nn.Module):
    ratio: int
    dtype: Dtype = jnp.float32
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        h = nn.Dense(d * self.ratio, dtype=self.dtype, name="fc1")(x)
        h = ACTIVATIONS[self.act](h)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: int
    eps: float
    causal: bool = False
    dtype: Dtype = jnp.float32
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + Attention(self.num_heads, causal=self.causal,
                          dtype=self.dtype, name="attn")(y)
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        return x + MLP(self.mlp_ratio, dtype=self.dtype, act=self.act,
                       name="mlp")(y)


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    mlp_ratio: int
    eps: float
    causal: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False
    act: str = "quick_gelu"
    # Switch-MoE feed-forwards every ``moe_every``-th block when
    # ``moe_experts`` > 0 (parallel/moe.py; CLIPVisionConfig docs). Aux
    # load-balancing losses are sown into the ``losses`` collection —
    # a no-op at inference, read by the trainer via
    # ``mutable=('losses',)``.
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity: float = 1.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block = EncoderBlock
        moe_block = None
        if self.moe_experts > 0:
            from video_quierer_tpu.parallel.moe import MoEEncoderBlock
            moe_block = MoEEncoderBlock
        if self.remat:  # rematerialize activations in training
            block = nn.remat(EncoderBlock)
            if moe_block is not None:
                moe_block = nn.remat(MoEEncoderBlock)
        for i in range(self.num_layers):
            if moe_block is not None and i % self.moe_every == \
                    self.moe_every - 1:
                x, aux = moe_block(
                    self.num_heads, self.moe_experts, self.mlp_ratio,
                    self.eps, capacity_factor=self.moe_capacity,
                    causal=self.causal, dtype=self.dtype,
                    name=f"layers_{i}")(x)
                self.sow("losses", "moe_aux", aux,
                         reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
            else:
                x = block(self.num_heads, self.mlp_ratio, self.eps,
                          causal=self.causal, dtype=self.dtype,
                          act=self.act, name=f"layers_{i}")(x)
        return x


class VisionTower(nn.Module):
    cfg: CLIPVisionConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        """``pixel_values`` NHWC ``[B, H, W, 3]`` normalized f32/bf16 →
        pooled pre-projection features ``[B, hidden]``."""
        c = self.cfg
        b = pixel_values.shape[0]
        patches = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, c.num_patches, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,)).astype(self.dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.seq_len, c.hidden_size)).astype(self.dtype)
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="pre_layernorm")(x)
        x = Encoder(c.num_layers, c.num_heads, c.mlp_ratio, c.layer_norm_eps,
                    dtype=self.dtype, remat=self.remat,
                    moe_experts=c.moe_experts, moe_every=c.moe_every,
                    moe_capacity=c.moe_capacity, name="encoder")(x)
        pooled = x[:, 0]  # CLS token
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                            name="post_layernorm")(pooled)


class TextTower(nn.Module):
    cfg: CLIPTextConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """``input_ids`` ``[B, 77]`` int32 → pooled features ``[B, hidden]``
        taken at each sequence's EOT token (highest token id), matching the
        HF pooling the reference relies on."""
        c = self.cfg
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (c.context_length, c.hidden_size)).astype(self.dtype)
        x = tok + pos[None, : input_ids.shape[1]]
        x = Encoder(c.num_layers, c.num_heads, c.mlp_ratio, c.layer_norm_eps,
                    causal=True, dtype=self.dtype, remat=self.remat,
                    name="encoder")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name="final_layer_norm")(x)
        eot = jnp.argmax(input_ids, axis=-1)  # EOT has the highest id
        return x[jnp.arange(x.shape[0]), eot]


def _normalize_f32(feats: jax.Array, normalize: bool) -> jax.Array:
    """Cast to f32 BEFORE the L2 normalize: under bf16 serving towers a
    bf16 norm leaves rows up to ~0.4% off unit length, which surfaces as
    cosine scores > 1 against re-normalized f32 index rows. The f32
    divide on a ``[B, proj]`` row is free next to the tower."""
    feats = feats.astype(jnp.float32)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


class CLIP(nn.Module):
    """Dual-tower CLIP with projection heads and a trainable logit scale."""

    cfg: CLIPConfig
    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.vision = VisionTower(self.cfg.vision, dtype=self.dtype,
                                  remat=self.remat)
        self.text = TextTower(self.cfg.text, dtype=self.dtype,
                              remat=self.remat)
        self.visual_projection = nn.Dense(
            self.cfg.projection_dim, use_bias=False, dtype=self.dtype)
        self.text_projection = nn.Dense(
            self.cfg.projection_dim, use_bias=False, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale",
            nn.initializers.constant(self.cfg.logit_scale_init), ())

    def encode_image(self, pixel_values: jax.Array,
                     normalize: bool = True) -> jax.Array:
        feats = self.visual_projection(self.vision(pixel_values))
        return _normalize_f32(feats, normalize)

    def encode_text(self, input_ids: jax.Array,
                    normalize: bool = True) -> jax.Array:
        feats = self.text_projection(self.text(input_ids))
        return _normalize_f32(feats, normalize)

    def __call__(self, pixel_values: jax.Array, input_ids: jax.Array):
        """Training forward: returns (image_feats, text_feats, logit_scale)."""
        img = self.encode_image(pixel_values)
        txt = self.encode_text(input_ids)
        return img, txt, jnp.exp(self.logit_scale)


def init_params(model: CLIP, seed: int = 0,
                image_size: Optional[int] = None):
    """Deterministic parameter init (used when no checkpoint is available —
    this environment has no network access to HuggingFace; convert.py loads
    real weights from a local checkpoint directory when one exists)."""
    c = model.cfg
    h = w = image_size or c.vision.image_size
    rng = jax.random.PRNGKey(seed)
    return model.init(
        rng,
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.zeros((1, c.text.context_length), jnp.int32),
    )["params"]
