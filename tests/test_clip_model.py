"""CLIP tower tests: shapes, determinism, and numerical parity vs the
HuggingFace PyTorch implementation the reference uses.

Parity strategy (offline-safe): build a small randomly-initialized HF
``CLIPModel`` from a config (no download), save its state dict, run it
through our converter (convert.py), and compare image/text features between
torch and our Flax towers on identical inputs — this validates quick-GELU,
pre/post layernorms, causal masking, EOT pooling and every weight transpose
(SURVEY.md §7 "hard parts": CLIP weight conversion + numerical parity).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from video_quierer_tpu.models.clip import config as cfg_mod
from video_quierer_tpu.models.clip.model import CLIP, init_params

SMALL = cfg_mod.CLIPConfig(
    name="test-small",
    projection_dim=32,
    vision=cfg_mod.CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=48, num_layers=2,
        num_heads=4),
    text=cfg_mod.CLIPTextConfig(
        vocab_size=100, context_length=16, hidden_size=32, num_layers=2,
        num_heads=4, eot_token_id=99),
)


@pytest.fixture(scope="module")
def small_model():
    model = CLIP(SMALL)
    params = init_params(model, seed=0)
    return model, params


def test_encode_image_shape_and_norm(small_model, rng):
    model, params = small_model
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    feats = model.apply({"params": params}, jnp.asarray(imgs),
                        method=CLIP.encode_image)
    assert feats.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1),
                               1.0, atol=1e-5)


def test_encode_text_shape_and_eot_pooling(small_model):
    model, params = small_model
    ids = np.full((2, 16), 99, dtype=np.int32)  # pad with EOT
    ids[0, :4] = [98, 5, 7, 99]
    ids[1, :3] = [98, 11, 99]
    feats = model.apply({"params": params}, jnp.asarray(ids),
                        method=CLIP.encode_text)
    assert feats.shape == (2, 32)
    # trailing padding beyond the first EOT must not change the pooled output
    ids2 = ids.copy()
    ids2[0, 10:] = 99  # same thing — already EOT
    feats2 = model.apply({"params": params}, jnp.asarray(ids2),
                         method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2),
                               atol=1e-6)


def test_causal_mask(small_model):
    """Changing a token AFTER position p must not affect pooling at p."""
    model, params = small_model
    ids_a = np.full((1, 16), 1, dtype=np.int32)
    ids_a[0, 0] = 98
    ids_a[0, 5] = 99          # EOT at position 5 (max id → pooled here)
    ids_b = ids_a.copy()
    ids_b[0, 10] = 42          # change a later token
    fa = model.apply({"params": params}, jnp.asarray(ids_a),
                     method=CLIP.encode_text)
    fb = model.apply({"params": params}, jnp.asarray(ids_b),
                     method=CLIP.encode_text)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


def test_full_size_config_param_count():
    """ViT-B/32 parameter count must match the published model (~151M)."""
    import jax
    model = CLIP(cfg_mod.vit_b_32())
    params = jax.eval_shape(lambda: init_params(model, seed=0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert 151_000_000 < n < 152_000_000, n


@pytest.mark.parametrize("tower", ["image", "text"])
def test_hf_parity(tmp_path, rng, tower):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.torch import save_file

    hf_cfg = transformers.CLIPConfig(
        projection_dim=SMALL.projection_dim,
        vision_config=dict(
            image_size=32, patch_size=8, hidden_size=48,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=48 * 4, hidden_act="quick_gelu"),
        text_config=dict(
            vocab_size=100, max_position_embeddings=16, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=32 * 4, hidden_act="quick_gelu",
            eos_token_id=99, bos_token_id=98, pad_token_id=99),
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(hf_cfg).eval()
    save_file(dict(hf.state_dict()), str(tmp_path / "model.safetensors"))

    from video_quierer_tpu.models.clip.convert import convert_hf_checkpoint
    params = convert_hf_checkpoint(tmp_path, SMALL)
    model = CLIP(SMALL)

    if tower == "image":
        imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf.get_image_features(
                pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2))
            ref = ref / ref.norm(dim=-1, keepdim=True)
        got = model.apply({"params": params}, jnp.asarray(imgs),
                          method=CLIP.encode_image)
    else:
        ids = np.full((2, 16), 99, dtype=np.int32)
        ids[0, :5] = [98, 5, 7, 11, 99]
        ids[1, :3] = [98, 42, 99]
        with torch.no_grad():
            ref = hf.get_text_features(input_ids=torch.tensor(ids.astype(
                np.int64)))
            ref = ref / ref.norm(dim=-1, keepdim=True)
        got = model.apply({"params": params}, jnp.asarray(ids),
                          method=CLIP.encode_text)

    ref = ref.numpy()
    got = np.asarray(got)
    cos = (ref * got).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("name,lo,hi", [
    ("vit-b-16", 148_000_000, 150_000_000),
    ("vit-l-14", 425_000_000, 430_000_000),
])
def test_variant_configs_construct(name, lo, hi):
    """Larger tower configs build with the published parameter counts."""
    import jax
    model = CLIP(cfg_mod.get_config(name))
    params = jax.eval_shape(lambda: init_params(model, seed=0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert lo < n < hi, (name, n)


def test_hf_alias_names():
    assert cfg_mod.get_config(
        "openai/clip-vit-base-patch32").name == "vit-b-32"
    assert cfg_mod.get_config(
        "openai/clip-vit-large-patch14").projection_dim == 768
    with pytest.raises(ValueError):
        cfg_mod.get_config("unknown-model")
