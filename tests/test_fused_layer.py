"""Fused transformer-layer text tower (ops/fused_layer.py) vs the flax
tower (models/clip/model.py:TextTower) — the unfused path is the oracle.

The fused path rebuilds the text half of the reference's CLIP encode
(`_encode_clip_text`, /root/reference/video_search_overhaul.py:278-295)
as one pallas_call per encoder block. Interpreter mode exercises the
exact kernel logic on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_quierer_tpu.models.clip.config import CLIPConfig, CLIPTextConfig
from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
from video_quierer_tpu.models.clip.model import CLIP, init_params
from video_quierer_tpu.ops.fused_layer import (
    fused_seq_eligible,
    fused_text_encode,
    fused_text_tower_eligible,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")


def _small_cfg():
    # a 128-wide 2-layer tower keeps the interpreter fast while hitting
    # every kernel feature (multi-head lane slices, causal mask, MLP)
    return CLIPConfig(
        name="test-small",
        projection_dim=64,
        text=CLIPTextConfig(vocab_size=512, context_length=32,
                            hidden_size=128, num_layers=2, num_heads=2),
    )


def _ids(rng, b, s, vocab):
    # ascending-ish ids with the max (EOT analog) at a random position
    ids = rng.integers(1, vocab - 2, size=(b, s))
    eot = rng.integers(s // 2, s, size=b)
    for i in range(b):
        ids[i, eot[i]] = vocab - 1
        ids[i, eot[i] + 1:] = 0
    return ids.astype(np.int32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("s", [8, 16])
def test_fused_matches_flax_tower(rng, dtype, s, monkeypatch):
    if dtype == jnp.float32:
        # f32 exceeds the default weight budget by design; raise it so
        # the exact-math parity case runs
        monkeypatch.setenv("VQT_FUSED_LAYER_BUDGET", str(64 * 2 ** 20))
    cfg = _small_cfg()
    assert fused_text_tower_eligible(cfg.text, dtype)
    model = CLIP(cfg, dtype=dtype)
    params = init_params(model, seed=0)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    ids = jnp.asarray(_ids(rng, 4, s, cfg.text.vocab_size))
    ref = np.asarray(model.apply({"params": params}, ids,
                                 method=CLIP.encode_text))
    got = np.asarray(fused_text_encode(params, ids, cfg=cfg, dtype=dtype))
    assert got.shape == ref.shape
    assert not np.isnan(got).any()
    cos = np.sum(got * ref, axis=-1)
    if dtype == jnp.float32:
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    else:
        # bf16 towers: fused LN keeps f32 stats like flax, but rounding
        # points differ — unit rows must still agree tightly
        assert cos.min() > 0.999
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               rtol=1e-5)


def test_uneven_batch_tile(rng, monkeypatch):
    # B=3 forces bt=1 (and B=6 bt with s=16 → token target clamps)
    monkeypatch.setenv("VQT_FUSED_LAYER_BUDGET", str(64 * 2 ** 20))
    cfg = _small_cfg()
    model = CLIP(cfg, dtype=jnp.float32)
    params = init_params(model, seed=1)
    ids = jnp.asarray(_ids(rng, 3, 16, cfg.text.vocab_size))
    ref = np.asarray(model.apply({"params": params}, ids,
                                 method=CLIP.encode_text))
    got = np.asarray(fused_text_encode(params, ids, cfg=cfg,
                                       dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_eligibility_gates(monkeypatch):
    cfg = _small_cfg()
    # seq buckets: 77 (non-multiple of 8) falls back
    assert fused_seq_eligible(8) and fused_seq_eligible(32)
    assert not fused_seq_eligible(77)
    # env escape hatch
    monkeypatch.setenv("VQT_FUSED_LAYER", "0")
    assert not fused_text_tower_eligible(cfg.text, jnp.bfloat16)
    monkeypatch.delenv("VQT_FUSED_LAYER")
    # mesh serving keeps the XLA tower
    devs = np.array(jax.devices()[:2])
    from jax.sharding import Mesh
    assert not fused_text_tower_eligible(
        cfg.text, jnp.bfloat16, Mesh(devs, ("data",)))
    # the real b32 text tower in f32 exceeds the weight budget; bf16 fits
    real = CLIPTextConfig()
    assert fused_text_tower_eligible(real, jnp.bfloat16)
    assert not fused_text_tower_eligible(real, jnp.float32)


def test_embedder_uses_fused_path(rng, monkeypatch):
    """End to end through CLIPEmbedder.embed_texts: fused on, fused off
    and the flax tower agree (the embedder is what serving calls)."""
    emb = CLIPEmbedder(model_name="openai/clip-vit-base-patch32",
                       dtype=jnp.bfloat16)
    assert emb._fused_text
    texts = ["a cat on a skateboard", "sunset over the ocean"]
    fused = emb.embed_texts(texts)
    monkeypatch.setenv("VQT_FUSED_LAYER", "0")
    emb2 = CLIPEmbedder(model_name="openai/clip-vit-base-patch32",
                        dtype=jnp.bfloat16)
    assert not emb2._fused_text
    ref = emb2.embed_texts(texts)
    cos = np.sum(fused * ref, axis=-1)
    assert cos.min() > 0.999
