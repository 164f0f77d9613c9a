"""MoE towers product-reachable (round-2 VERDICT item 6, EP half):
CLIPVisionConfig.moe_experts builds Switch-MoE blocks into the vision
tower, the trainer adds the sown aux losses, the finetune CLI trains one
from flags on a (data, expert) mesh, and the embedder serves the
checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import make_synthetic_video
from video_quierer_tpu.models.clip.config import (
    CLIPConfig, CLIPTextConfig, CLIPVisionConfig, register_config)
from video_quierer_tpu.models.clip.model import CLIP, init_params
from video_quierer_tpu.train.trainer import CLIPTrainer, loss_fn

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs the 8-device CPU mesh")

MOE_TINY = "moe-tiny"


def _moe_cfg():
    return CLIPConfig(
        name=MOE_TINY,
        projection_dim=16,
        vision=CLIPVisionConfig(image_size=32, patch_size=16,
                                hidden_size=32, num_layers=4, num_heads=2,
                                moe_experts=4, moe_every=2),
        text=CLIPTextConfig(vocab_size=49408, context_length=77,
                            hidden_size=16, num_layers=2, num_heads=2,
                            eot_token_id=49407),
    )


register_config(MOE_TINY, _moe_cfg)


def _batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((n, 32, 32, 3)).astype(np.float32)
    ids = np.zeros((n, 77), np.int32)
    ids[:, 0] = 49406
    ids[:, 1] = rng.integers(0, 4000, n)
    ids[:, 2] = 49407
    return images, ids


def test_moe_tower_forward_sows_aux():
    cfg = _moe_cfg()
    model = CLIP(cfg)
    params = init_params(model, seed=0, image_size=32)
    # expert stacks exist on the MoE layers only (1 and 3)
    enc = params["vision"]["encoder"]
    assert "moe" in enc["layers_1"] and "moe" in enc["layers_3"]
    assert "mlp" in enc["layers_0"] and "moe" not in enc["layers_0"]
    assert enc["layers_1"]["moe"]["w1"].shape[0] == 4  # [E, ...]

    images, ids = _batch()
    # serving path: no mutable collections, aux is a silent no-op
    img, txt, scale = model.apply({"params": params}, jnp.asarray(images),
                                  jnp.asarray(ids))
    assert img.shape == (8, 16) and np.isfinite(np.asarray(img)).all()
    # training path: aux losses come out of the ``losses`` collection
    out, sown = model.apply({"params": params}, jnp.asarray(images),
                            jnp.asarray(ids), mutable=("losses",))
    aux = jax.tree.leaves(sown["losses"])
    assert aux and all(np.isfinite(float(jnp.sum(a))) for a in aux)
    loss = loss_fn(params, model, jnp.asarray(images), jnp.asarray(ids))
    assert np.isfinite(float(loss))


def test_moe_trainer_on_expert_mesh():
    from video_quierer_tpu.train.finetune import build_mesh
    mesh = build_mesh(dp=2, tp=1, ep=4)
    assert dict(mesh.shape) == {"data": 2, "expert": 4}
    trainer = CLIPTrainer(_moe_cfg(), mesh=mesh, learning_rate=1e-3,
                          seed=0)
    w1 = trainer.state.params["vision"]["encoder"]["layers_1"]["moe"]["w1"]
    assert "expert" in str(w1.sharding.spec)
    images, ids = _batch()
    losses = [trainer.step(images, ids) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)
    # same batch each step → the optimizer must make progress on it
    assert losses[-1] < losses[0]


def test_finetune_cli_moe_to_serving(tmp_path):
    from video_quierer_tpu.train import finetune
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "a.mp4", n_frames=40, scene_every=10)
    out = tmp_path / "ckpt"
    rc = finetune.main([
        "--videos-dir", str(vids), "--out", str(out),
        "--model", MOE_TINY, "--batch", "8",
        "--max-frames-per-video", "16", "--dp", "2", "--ep", "4",
        "--lr", "1e-3",
    ])
    assert rc == 0
    steps = [p for p in out.iterdir() if p.name.startswith("step_")]
    assert steps
    # the checkpoint serves through the product embedder
    from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
    emb = CLIPEmbedder(model_name=MOE_TINY,
                       orbax_checkpoint=sorted(steps)[-1])
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (4, 32, 32, 3), np.uint8)
    feats = emb.embed_frames(frames)
    assert feats.shape == (4, 16)
    assert np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)
