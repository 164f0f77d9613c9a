"""Expert parallelism (parallel/moe.py): Switch MoE + EP sharding.

Closes SURVEY.md §2.3's EP row. Oracle = routing each token through its
argmax expert's MLP directly; the dense-dispatch einsum formulation must
match it exactly when nothing overflows capacity, drop overflow tokens to
zero when it does, and produce identical results (and finite grads) when
the expert stacks are sharded over an 8-device ``expert`` mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_quierer_tpu.parallel.moe import (
    MoEEncoderBlock,
    SwitchMoEMLP,
    expert_mesh,
    expert_partition_spec,
    shard_moe_params,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs the 8-device CPU mesh")

D, E, RATIO = 16, 8, 2


def _oracle(params, x):
    """Per-token loop: softmax router -> argmax expert -> that expert's
    gelu MLP, scaled by the gate prob. No capacity limit."""
    n, d = x.shape
    r_k = np.asarray(params["router"]["kernel"])
    r_b = np.asarray(params["router"]["bias"])
    w1 = np.asarray(params["w1"]); b1 = np.asarray(params["b1"])
    w2 = np.asarray(params["w2"]); b2 = np.asarray(params["b2"])
    logits = x @ r_k + r_b
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = np.zeros_like(x)
    for i in range(n):
        e_i = int(np.argmax(probs[i]))
        h = np.asarray(jax.nn.gelu(
            jnp.asarray(x[i] @ w1[e_i] + b1[e_i]), approximate=True))
        out[i] = (h @ w2[e_i] + b2[e_i]) * probs[i, e_i]
    return out


@pytest.fixture(scope="module")
def moe():
    m = SwitchMoEMLP(E, ratio=RATIO, capacity_factor=4.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, D)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    return m, params, x


def test_matches_per_token_oracle(moe):
    m, params, x = moe
    got, aux = m.apply({"params": params}, x)
    n, d = x.shape[0] * x.shape[1], x.shape[2]
    want = _oracle(params, np.asarray(x).reshape(n, d)).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    assert float(aux) > 0


def test_capacity_drops_overflow_tokens():
    """capacity_factor so small each expert takes 1 token; the rest of
    the tokens routed to it must come out exactly zero."""
    m = SwitchMoEMLP(2, ratio=2, capacity_factor=1e-6)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6, D)), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    out, _ = m.apply({"params": params}, x)
    out = np.asarray(out)[0]
    # capacity=1 per expert, 2 experts -> at most 2 nonzero rows
    nonzero = np.abs(out).sum(-1) > 1e-9
    assert nonzero.sum() <= 2


def test_expert_sharded_matches_replicated(moe):
    m, params, x = moe
    want, aux_want = m.apply({"params": params}, x)
    mesh = expert_mesh(8)
    sharded = shard_moe_params(params, mesh)
    # expert stacks actually got split over the mesh
    w1_sharding = sharded["w1"].sharding
    assert w1_sharding.spec[0] == "expert"
    got, aux_got = jax.jit(
        lambda p, x_: m.apply({"params": p}, x_))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux_got), float(aux_want), rtol=1e-5)


def test_partition_spec_rules(moe):
    _, params, _ = moe
    specs = jax.tree_util.tree_map_with_path(expert_partition_spec, params)
    assert specs["w1"][0] == "expert"
    assert specs["b2"][0] == "expert"
    assert specs["router"]["kernel"] == jax.sharding.PartitionSpec()


def test_moe_block_grads_finite_on_mesh():
    block = MoEEncoderBlock(num_heads=2, num_experts=8, mlp_ratio=2,
                            eps=1e-5, capacity_factor=2.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 8, D)), jnp.float32)
    params = block.init(jax.random.PRNGKey(2), x)["params"]
    mesh = expert_mesh(8)
    sharded = shard_moe_params(params, mesh)

    @jax.jit
    def loss(p, x_):
        y, aux = block.apply({"params": p}, x_)
        return jnp.sum(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(sharded, x)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # router must receive gradient (gate prob is in the combine path)
    assert float(jnp.abs(g["moe"]["router"]["kernel"]).sum()) > 0
