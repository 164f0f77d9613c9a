"""Training tests: loss sanity, single-device step, and the 2-D
(data, model) mesh-sharded step on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_quierer_tpu.models.clip import config as cfg_mod
from video_quierer_tpu.parallel.mesh import data_mesh
from video_quierer_tpu.train.trainer import (
    CLIPTrainer,
    clip_contrastive_loss,
    param_partition_spec,
)

TINY = cfg_mod.CLIPConfig(
    name="tiny",
    projection_dim=16,
    vision=cfg_mod.CLIPVisionConfig(image_size=16, patch_size=8,
                                    hidden_size=32, num_layers=2,
                                    num_heads=2),
    text=cfg_mod.CLIPTextConfig(vocab_size=64, context_length=8,
                                hidden_size=16, num_layers=2, num_heads=2,
                                eot_token_id=63),
)


def _batch(rng, b=8):
    images = rng.standard_normal((b, 16, 16, 3)).astype(np.float32)
    ids = rng.integers(1, 62, (b, 8)).astype(np.int32)
    ids[:, 0] = 62
    ids[:, -1] = 63
    return images, ids


def test_contrastive_loss_perfect_alignment():
    feats = jnp.eye(4, 16)
    loss_aligned = clip_contrastive_loss(feats, feats, jnp.float32(100.0))
    loss_shuffled = clip_contrastive_loss(feats, feats[::-1],
                                          jnp.float32(100.0))
    assert float(loss_aligned) < 0.01
    assert float(loss_shuffled) > 1.0


def test_partition_rules():
    from jax.tree_util import DictKey
    spec = param_partition_spec((DictKey("vision"), DictKey("encoder"),
                                 DictKey("layers_0"), DictKey("attn"),
                                 DictKey("q_proj"), DictKey("kernel")), None)
    assert spec == jax.sharding.PartitionSpec(None, "model")
    spec = param_partition_spec((DictKey("vision"), DictKey("encoder"),
                                 DictKey("layers_0"), DictKey("mlp"),
                                 DictKey("fc2"), DictKey("kernel")), None)
    assert spec == jax.sharding.PartitionSpec("model", None)
    spec = param_partition_spec((DictKey("logit_scale"),), None)
    assert spec == jax.sharding.PartitionSpec()


def test_single_device_training_reduces_loss(rng):
    trainer = CLIPTrainer(TINY, learning_rate=1e-3)
    images, ids = _batch(rng)
    losses = [trainer.step(images, ids) for _ in range(10)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_mesh_sharded_training_step(rng):
    assert jax.device_count() >= 8
    mesh = data_mesh(8, model_parallel=2)  # 4-way data × 2-way tensor
    trainer = CLIPTrainer(TINY, mesh=mesh, learning_rate=1e-3)
    images, ids = _batch(rng, b=8)
    l1 = trainer.step(images, ids)
    l2 = trainer.step(images, ids)
    assert np.isfinite([l1, l2]).all()
    assert l2 < l1
    # verify TP params actually live sharded on the mesh
    k = trainer.state.params["vision"]["encoder"]["layers_0"]["mlp"][
        "fc1"]["kernel"]
    assert "model" in str(k.sharding.spec)


def test_sharded_matches_single_device(rng):
    """One step on the mesh must match one step on a single device."""
    images, ids = _batch(rng, b=8)
    t1 = CLIPTrainer(TINY, learning_rate=1e-3, seed=3)
    l_single = t1.step(images, ids)
    mesh = data_mesh(8, model_parallel=2)
    t2 = CLIPTrainer(TINY, mesh=mesh, learning_rate=1e-3, seed=3)
    l_sharded = t2.step(images, ids)
    assert abs(l_single - l_sharded) < 1e-4
