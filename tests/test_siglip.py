"""SigLIP family tests: shapes, sigmoid loss, and numerical parity vs a
locally-built ``transformers.SiglipModel`` (same offline parity strategy
as the CLIP tests)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from video_quierer_tpu.models.siglip.model import (
    SigLIP,
    SigLIPConfig,
    SigLIPTextConfig,
    SigLIPVisionConfig,
    siglip_init_params,
    siglip_sigmoid_loss,
)

SMALL = SigLIPConfig(
    name="test-small",
    vision=SigLIPVisionConfig(image_size=32, patch_size=8, hidden_size=48,
                              num_layers=2, num_heads=4, mlp_ratio=2),
    text=SigLIPTextConfig(vocab_size=100, context_length=16,
                          hidden_size=48, num_layers=2, num_heads=4,
                          mlp_ratio=2),
)


@pytest.fixture(scope="module")
def small():
    model = SigLIP(SMALL)
    return model, siglip_init_params(model, seed=0)


def test_tower_shapes(small, rng):
    model, params = small
    imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 100, (2, 16)).astype(np.int32)
    img_f, txt_f, scale, bias = model.apply({"params": params},
                                            jnp.asarray(imgs),
                                            jnp.asarray(ids))
    assert img_f.shape == (2, 48) and txt_f.shape == (2, 48)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img_f), axis=-1),
                               1.0, atol=1e-5)
    assert float(scale) == pytest.approx(np.exp(2.303), rel=1e-3)
    assert float(bias) == pytest.approx(-10.0)


def test_sigmoid_loss_behavior():
    # the negative bias keeps off-diagonal (zero-cosine) pairs correct —
    # that is exactly why SigLIP carries a learnable bias
    feats = jnp.eye(4, 48)
    aligned = siglip_sigmoid_loss(feats, feats, jnp.float32(100.0),
                                  jnp.float32(-10.0))
    shuffled = siglip_sigmoid_loss(feats, feats[::-1], jnp.float32(100.0),
                                   jnp.float32(-10.0))
    assert float(aligned) < 0.01
    assert float(shuffled) > 1.0
    # gradient sanity: loss decreases as scale aligns with structure
    import jax
    g = jax.grad(lambda b: siglip_sigmoid_loss(
        feats, feats, jnp.float32(10.0), b))(jnp.float32(0.0))
    assert np.isfinite(float(g))


def test_full_size_param_count():
    import jax
    model = SigLIP(SigLIPConfig())
    params = jax.eval_shape(lambda: siglip_init_params(model))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # google/siglip-base-patch16-224 ≈ 203M params
    assert 198_000_000 < n < 208_000_000, n


@pytest.mark.parametrize("tower", ["image", "text"])
def test_hf_parity(tmp_path, rng, tower):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.torch import save_file

    hf_cfg = transformers.SiglipConfig(
        vision_config=dict(image_size=32, patch_size=8, hidden_size=48,
                           num_hidden_layers=2, num_attention_heads=4,
                           intermediate_size=96,
                           hidden_act="gelu_pytorch_tanh"),
        text_config=dict(vocab_size=100, hidden_size=48,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=96,
                         max_position_embeddings=16,
                         hidden_act="gelu_pytorch_tanh"),
    )
    torch.manual_seed(0)
    hf = transformers.SiglipModel(hf_cfg).eval()
    save_file(dict(hf.state_dict()), str(tmp_path / "model.safetensors"))

    from video_quierer_tpu.models.siglip.convert import \
        convert_siglip_checkpoint
    params = convert_siglip_checkpoint(tmp_path, SMALL)
    model = SigLIP(SMALL)

    if tower == "image":
        imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref = hf.get_image_features(
                pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2))
            ref = ref / ref.norm(dim=-1, keepdim=True)
        got = model.apply({"params": params}, jnp.asarray(imgs),
                          method=SigLIP.encode_image)
    else:
        ids = rng.integers(1, 99, (2, 16)).astype(np.int32)
        with torch.no_grad():
            ref = hf.get_text_features(
                input_ids=torch.tensor(ids.astype(np.int64)))
            ref = ref / ref.norm(dim=-1, keepdim=True)
        got = model.apply({"params": params}, jnp.asarray(ids),
                          method=SigLIP.encode_text)

    ref, got = ref.numpy(), np.asarray(got)
    cos = (ref * got).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_siglip_training(rng):
    """The generic trainer fine-tunes SigLIP (sigmoid loss) too."""
    from video_quierer_tpu.train.trainer import CLIPTrainer
    tiny = SigLIPConfig(
        name="tiny",
        vision=SigLIPVisionConfig(image_size=16, patch_size=8,
                                  hidden_size=32, num_layers=2,
                                  num_heads=2, mlp_ratio=2),
        text=SigLIPTextConfig(vocab_size=64, context_length=8,
                              hidden_size=32, num_layers=2, num_heads=2,
                              mlp_ratio=2),
    )
    trainer = CLIPTrainer(model=SigLIP(tiny), learning_rate=1e-3, seed=0)
    images = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(1, 63, (8, 8)).astype(np.int32)
    losses = [trainer.step(images, ids) for _ in range(8)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_siglip_training_sharded(rng):
    import jax
    from video_quierer_tpu.parallel.mesh import data_mesh
    from video_quierer_tpu.train.trainer import CLIPTrainer
    assert jax.device_count() >= 8
    tiny = SigLIPConfig(
        name="tiny",
        vision=SigLIPVisionConfig(image_size=16, patch_size=8,
                                  hidden_size=32, num_layers=2,
                                  num_heads=2, mlp_ratio=2),
        text=SigLIPTextConfig(vocab_size=64, context_length=8,
                              hidden_size=32, num_layers=2, num_heads=2,
                              mlp_ratio=2),
    )
    mesh = data_mesh(8, model_parallel=2)
    trainer = CLIPTrainer(model=SigLIP(tiny), mesh=mesh,
                          learning_rate=1e-3, seed=0)
    images = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(1, 63, (8, 8)).astype(np.int32)
    l1 = trainer.step(images, ids)
    l2 = trainer.step(images, ids)
    assert np.isfinite([l1, l2]).all() and l2 < l1


def test_siglip_engine_serving(tmp_path):
    """Engine with model.family='siglip': ingest + text and image search
    work end to end (768-d index sized automatically)."""
    from tests.helpers import make_synthetic_video
    from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
        VideoSearchEngine
    from video_quierer_tpu.ingest.frames import extract_frames

    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "sg.mp4", n_frames=30)
    cfg = EngineConfig(api=ApiConfig(max_frames=4))
    cfg.model.family = "siglip"
    eng = VideoSearchEngine(str(vids), config=cfg)
    assert eng.index.dim == 768
    eng.startup()
    assert len(eng.index) == 4
    res = eng.search("a scene", k=2)
    assert len(res) == 2
    frames, stamps = extract_frames(vids / "sg.mp4", max_frames=4,
                                    sampling_mode="high")
    hit = eng.search_by_image(frames[1], k=1)[0]
    assert hit["timestamp"] == stamps[1]
    assert hit["score"] == pytest.approx(1.0, abs=1e-4)


@pytest.mark.slow
def test_hf_parity_full_size(tmp_path, rng):
    """Full base-patch16-224 geometry (196 patches, 64-token text) parity
    with a locally-built torch SiglipModel — catches any pooling/position
    mismatch the small config can't."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.torch import save_file
    from video_quierer_tpu.models.siglip.convert import \
        convert_siglip_checkpoint

    torch.manual_seed(0)
    hf = transformers.SiglipModel(transformers.SiglipConfig()).eval()
    save_file(dict(hf.state_dict()), str(tmp_path / "model.safetensors"))
    cfg = SigLIPConfig()
    params = convert_siglip_checkpoint(tmp_path, cfg)
    model = SigLIP(cfg)

    imgs = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref_img = hf.get_image_features(
            pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2))
        ref_img = ref_img / ref_img.norm(dim=-1, keepdim=True)
    got_img = model.apply({"params": params}, jnp.asarray(imgs),
                          method=SigLIP.encode_image)
    cos = (ref_img.numpy() * np.asarray(got_img)).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)

    ids = rng.integers(1, 31999, (1, 64)).astype(np.int32)
    with torch.no_grad():
        ref_txt = hf.get_text_features(
            input_ids=torch.tensor(ids.astype(np.int64)))
        ref_txt = ref_txt / ref_txt.norm(dim=-1, keepdim=True)
    got_txt = model.apply({"params": params}, jnp.asarray(ids),
                          method=SigLIP.encode_text)
    cos = (ref_txt.numpy() * np.asarray(got_txt)).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
