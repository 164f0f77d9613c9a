"""Fused single-block attention (ops/attention.py) vs the einsum oracle.

The fused kernel replaces the per-head einsum attention inside the CLIP
towers (models/clip/model.py:Attention — the JAX analog of the HF
attention the reference runs, video_search_overhaul.py:127-130).
Interpreter mode exercises the exact kernel logic on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_quierer_tpu.ops.attention import (
    fused_attention,
    fused_attention_eligible,
)


def einsum_attention(q, k, v, *, num_heads, valid_len=None, causal=False):
    """The towers' original per-head path, as the parity oracle."""
    b, s, d = q.shape
    hd = d // num_heads
    split = lambda t: t.reshape(b, s, num_heads, hd)
    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    mask = jnp.ones((s, s), dtype=bool)
    if causal:
        mask &= jnp.tril(jnp.ones((s, s), dtype=bool))
    if valid_len is not None:
        mask &= (jnp.arange(s) < valid_len)[None, :]
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(b, s, d)


def _rand_qkv(rng, b, s, d, dtype):
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, s, d)).astype(np.float32)).astype(dtype)
    return mk(), mk(), mk()


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s,h", [(50, 8), (16, 8), (77, 8), (64, 12)])
def test_fused_matches_einsum(rng, causal, s, h):
    d = h * 64
    q, k, v = _rand_qkv(rng, 3, s, d, jnp.float32)
    got = fused_attention(q, k, v, num_heads=h, causal=causal)
    want = einsum_attention(q, k, v, num_heads=h, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_valid_len_masks_trailing_keys(rng):
    s, h, d = 56, 8, 512
    q, k, v = _rand_qkv(rng, 2, s, d, jnp.float32)
    got = fused_attention(q, k, v, num_heads=h, valid_len=50)
    want = einsum_attention(q, k, v, num_heads=h, valid_len=50)
    # rows past valid_len are garbage by contract; compare valid rows
    np.testing.assert_allclose(np.asarray(got)[:, :50],
                               np.asarray(want)[:, :50],
                               rtol=1e-5, atol=1e-5)


def test_batch_padding_roundtrip(rng):
    # B=1 < BATCH_BLOCK exercises the batch-dim pad + slice
    s, h, d = 16, 8, 512
    q, k, v = _rand_qkv(rng, 1, s, d, jnp.float32)
    got = fused_attention(q, k, v, num_heads=h, causal=True)
    want = einsum_attention(q, k, v, num_heads=h, causal=True)
    assert got.shape == (1, s, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_close_to_f32_oracle(rng):
    s, h, d = 50, 8, 512
    qf, kf, vf = _rand_qkv(rng, 2, s, d, jnp.float32)
    got = fused_attention(qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16),
                          vf.astype(jnp.bfloat16), num_heads=h)
    want = einsum_attention(qf, kf, vf, num_heads=h)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.05)


def test_eligibility_rules(monkeypatch):
    # interpret mode on: eligibility is shape-driven (whole heads must
    # tile the 128-lane block; seq length is unconstrained)
    assert fused_attention_eligible(50, 8, 512)        # B/32 vision
    assert fused_attention_eligible(77, 8, 512)        # CLIP text
    assert fused_attention_eligible(64, 12, 768)       # SigLIP text
    assert fused_attention_eligible(196, 12, 768)      # SigLIP vision
    assert fused_attention_eligible(197, 12, 768)      # B/16
    assert fused_attention_eligible(257, 16, 1024)     # L/14
    assert not fused_attention_eligible(50, 7, 512)    # d % heads
    assert not fused_attention_eligible(50, 4, 320)    # 128 % hd
    assert not fused_attention_eligible(50, 3, 192)    # d % 128
    monkeypatch.delenv("VQT_PALLAS_INTERPRET")
    assert not fused_attention_eligible(50, 8, 512)    # CPU → off


def test_gradients_flow_through_fused_path(rng):
    """The custom VJP (fused forward, einsum-transpose backward) matches
    the einsum path's gradients — training differentiates straight
    through Attention (train/trainer.py)."""
    s, h, d = 16, 8, 512
    q, k, v = _rand_qkv(rng, 2, s, d, jnp.float32)

    def loss_fused(args):
        return jnp.sum(fused_attention(*args, num_heads=h, causal=True)
                       ** 2)

    def loss_ein(args):
        return jnp.sum(einsum_attention(*args, num_heads=h, causal=True)
                       ** 2)

    g_fused = jax.grad(loss_fused)((q, k, v))
    g_ein = jax.grad(loss_ein)((q, k, v))
    for gf, ge in zip(g_fused, g_ein):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge),
                                   rtol=1e-4, atol=1e-4)


def test_tower_uses_fused_path(rng):
    """CLIP towers produce identical features with the fused path on
    (interpret) and off — the integration-level parity check."""
    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params

    cfg = vit_b_32()
    model = CLIP(cfg)
    params = init_params(model, seed=0)
    ids = jnp.asarray(rng.integers(1, 40000, (2, 77)).astype(np.int32))
    pixels = jnp.asarray(
        rng.standard_normal((2, 224, 224, 3)).astype(np.float32))

    txt_fused = model.apply({"params": params}, ids,
                            method=CLIP.encode_text)
    img_fused = model.apply({"params": params}, pixels,
                            method=CLIP.encode_image)

    import os
    os.environ.pop("VQT_PALLAS_INTERPRET", None)
    txt_ein = model.apply({"params": params}, ids, method=CLIP.encode_text)
    img_ein = model.apply({"params": params}, pixels,
                          method=CLIP.encode_image)
    np.testing.assert_allclose(np.asarray(txt_fused), np.asarray(txt_ein),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(img_fused), np.asarray(img_ein),
                               rtol=2e-4, atol=2e-4)
