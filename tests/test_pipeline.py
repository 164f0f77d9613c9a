"""Pipeline parallelism (parallel/pipeline.py): GPipe over a `pipe` mesh.

Closes SURVEY.md §2.3's PP row. Oracle = the same blocks run sequentially
on one device; the pipelined forward must match it numerically, and
``jax.grad`` through the pipeline must match sequential gradients (the
ppermute/scan transpose path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_quierer_tpu.models.clip.config import (
    CLIPConfig, CLIPTextConfig, CLIPVisionConfig)
from video_quierer_tpu.models.clip.model import CLIP, EncoderBlock, \
    init_params
from video_quierer_tpu.parallel.mesh import pipe_mesh
from video_quierer_tpu.parallel.pipeline import (
    pipeline_blocks,
    pipelined_encode_image,
    shard_stacked,
    stack_layer_params,
    unstack_layer_params,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs the 8-device CPU mesh")

HIDDEN, HEADS, LAYERS = 32, 2, 8
EPS = 1e-5


def _tiny_cfg():
    return CLIPConfig(
        name="pp-tiny",
        projection_dim=16,
        vision=CLIPVisionConfig(image_size=16, patch_size=8,
                                hidden_size=HIDDEN, num_layers=LAYERS,
                                num_heads=HEADS),
        text=CLIPTextConfig(vocab_size=64, context_length=8,
                            hidden_size=16, num_layers=2, num_heads=2,
                            eot_token_id=63),
    )


@pytest.fixture(scope="module")
def blocks():
    """8 random encoder blocks + activations, with a sequential oracle."""
    block = EncoderBlock(HEADS, 4, EPS)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 5, HIDDEN)), jnp.float32)
    layer_params = {}
    for i in range(LAYERS):
        p = block.init(jax.random.PRNGKey(i), x0)["params"]
        layer_params[f"layers_{i}"] = p
    x = jnp.asarray(rng.standard_normal((8, 5, HIDDEN)), jnp.float32)
    return block, layer_params, x


def _sequential(block, layer_params, x):
    for i in range(LAYERS):
        x = block.apply({"params": layer_params[f"layers_{i}"]}, x)
    return x


def test_stack_roundtrip(blocks):
    _, layer_params, _ = blocks
    stacked = stack_layer_params(layer_params, LAYERS)
    back = unstack_layer_params(stacked, LAYERS)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 layer_params, back)


@pytest.mark.parametrize("n_stages,n_micro", [(8, 4), (4, 8), (2, 2)])
def test_pipeline_matches_sequential(blocks, n_stages, n_micro):
    block, layer_params, x = blocks
    want = _sequential(block, layer_params, x)
    mesh = pipe_mesh(n_stages)
    stacked = shard_stacked(stack_layer_params(layer_params, LAYERS), mesh)
    got = pipeline_blocks(
        lambda p, a: block.apply({"params": p}, a),
        stacked, x, mesh=mesh, n_microbatches=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_gradients_match_sequential(blocks):
    block, layer_params, x = blocks
    mesh = pipe_mesh(4)
    stacked = stack_layer_params(layer_params, LAYERS)

    def loss_pp(stacked_p):
        y = pipeline_blocks(
            lambda p, a: block.apply({"params": p}, a),
            stacked_p, x, mesh=mesh, n_microbatches=4)
        return jnp.sum(y ** 2)

    def loss_seq(stacked_p):
        unstacked = unstack_layer_params(stacked_p, LAYERS)
        return jnp.sum(_sequential(block, unstacked, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    # atol covers f32 reassociation noise on near-zero grad elements (the
    # two schedules sum in different orders); structurally-wrong grads
    # (missing layers, bubble contamination) differ at O(1), not 1e-4.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4),
        g_pp, g_seq)


def test_pipelined_encode_image_parity():
    cfg = _tiny_cfg()
    model = CLIP(cfg)
    params = init_params(model, seed=0)
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.standard_normal((8, 16, 16, 3)), jnp.float32)
    want = model.apply({"params": params}, pixels,
                       method=CLIP.encode_image)
    mesh = pipe_mesh(4)  # 8 layers over 4 stages
    got = pipelined_encode_image(model, params, pixels, mesh=mesh,
                                 n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_pipeline_under_jit(blocks):
    """The whole schedule must live inside one jit (serving shape)."""
    block, layer_params, x = blocks
    mesh = pipe_mesh(8)
    stacked = shard_stacked(stack_layer_params(layer_params, LAYERS), mesh)

    @jax.jit
    def fwd(sp, x_):
        return pipeline_blocks(
            lambda p, a: block.apply({"params": p}, a),
            sp, x_, mesh=mesh, n_microbatches=8)

    got = fwd(stacked, x)
    want = _sequential(block, layer_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_bad_microbatch_raises(blocks):
    block, layer_params, x = blocks
    mesh = pipe_mesh(2)
    stacked = stack_layer_params(layer_params, LAYERS)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_blocks(lambda p, a: block.apply({"params": p}, a),
                        stacked, x, mesh=mesh, n_microbatches=3)
