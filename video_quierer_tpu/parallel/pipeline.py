"""Pipeline parallelism (GPipe schedule) over a ``pipe`` mesh axis.

The reference has no parallelism of any kind (SURVEY.md §2.3 row "PP":
none); round 1 declared PP a non-goal because ViT-B/32 fits on a fraction
of one chip. This module closes that gap the TPU-native way for the larger
tower configs (models/clip/config.py): the encoder's identical blocks are
**stacked on a leading layer axis and sharded over the mesh** — stage
``s`` of ``S`` holds layers ``[s·L/S, (s+1)·L/S)`` — and microbatches
flow through stages under ``shard_map``, with ``lax.ppermute`` rotating
activations stage→stage over ICI and a ``lax.scan`` driving the tick loop
(static trip count — XLA-friendly, no data-dependent control flow).

Schedule: plain GPipe. ``M`` microbatches over ``S`` stages take
``M + S - 1`` ticks; each stage runs its local layer stack (an inner
``lax.scan``) every tick, idle ticks compute on garbage that is never
read (the standard bubble — fraction ``(S-1)/(M+S-1)``). Everything is
differentiable: ``ppermute``/``scan``/``where`` all have transpose rules,
so ``jax.grad`` through a pipelined forward yields exactly the GPipe
backward (tested against the sequential oracle).

Memory note: gradients of the tick ``scan`` retain each tick's carried
activations — for long pipelines wrap ``block_apply`` in
``jax.checkpoint`` (the towers' ``remat`` flag does the same for the
sequential path).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def stack_layer_params(params: dict, num_layers: int,
                       prefix: str = "layers_") -> dict:
    """Stack an Encoder's per-layer subtrees ``layers_0..L-1`` into one
    tree with a leading ``[L, ...]`` axis (the axis PP shards).

    Inverse of :func:`unstack_layer_params`.
    """
    layers = [params[f"{prefix}{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: dict, num_layers: int,
                         prefix: str = "layers_") -> dict:
    return {f"{prefix}{i}": jax.tree.map(lambda x: x[i], stacked)
            for i in range(num_layers)}


def shard_stacked(stacked, mesh: Mesh):
    """Place a stacked ``[L, ...]`` layer tree with the layer axis split
    over the ``pipe`` mesh axis (stage s holds its contiguous slice)."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(PIPE_AXIS, *([None] * (x.ndim - 1))))),
        stacked)


def pipeline_blocks(block_apply: Callable, stacked_params, x: jax.Array,
                    *, mesh: Mesh, n_microbatches: int,
                    axis: str = PIPE_AXIS) -> jax.Array:
    """Run ``x`` through the stacked layers with a GPipe schedule.

    Args:
        block_apply: ``(layer_params, act [mb, ...]) -> act`` — one
            encoder block, e.g.
            ``lambda p, a: EncoderBlock(...).apply({"params": p}, a)``.
        stacked_params: layer tree with leading ``[L, ...]`` axis; L must
            be divisible by the mesh's ``axis`` size. Place it with
            :func:`shard_stacked` (unsharded inputs work too — GSPMD
            reshards, at a one-time cost).
        x: ``[B, ...]`` activations; B divisible by ``n_microbatches``.
        n_microbatches: GPipe M. More microbatches → smaller bubble,
            smaller per-tick work.

    Returns ``[B, ...]`` activations, identical (up to float
    reassociation) to applying the layers sequentially.
    """
    n_stages = mesh.shape[axis]
    b = x.shape[0]
    if b % n_microbatches:
        raise ValueError(f"batch {b} not divisible by M={n_microbatches}")
    mb = b // n_microbatches
    x_mb = x.reshape(n_microbatches, mb, *x.shape[1:])

    def staged(local_layers, x_all):
        # Inside shard_map: local_layers [L/S, ...], x_all replicated.
        s = jax.lax.axis_index(axis)
        m = n_microbatches
        t_total = m + n_stages - 1

        def run_stage(act):
            def body(a, lp):
                return block_apply(lp, a), None
            out, _ = jax.lax.scan(body, act, local_layers)
            return out

        buf0 = jnp.zeros_like(x_all[0])
        outs0 = jnp.zeros_like(x_all)

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t (clamped index; masked out when
            # t >= m so the tail bubbles recompute garbage harmlessly)
            inj = jax.lax.dynamic_index_in_dim(
                x_all, jnp.minimum(t, m - 1), axis=0, keepdims=False)
            take = jnp.logical_and(s == 0, t < m)
            buf = jnp.where(take, inj, buf)
            y = run_stage(buf)
            # last stage emits microbatch t-(S-1)
            m_out = t - (n_stages - 1)
            emit = jnp.logical_and(s == n_stages - 1, m_out >= 0)
            slot = jnp.clip(m_out, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, axis=0,
                                               keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(emit, y, cur), slot, axis=0)
            # rotate activations one stage forward over ICI
            y = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stages) for i in range(n_stages)])
            return (y, outs), None

        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                    jnp.arange(t_total))
        # outs is populated only on the last stage (zeros elsewhere);
        # psum broadcasts it to every stage. k·B·d floats over ICI — the
        # same order as the activations already moved per tick.
        return jax.lax.psum(outs, axis)

    spec_params = jax.tree.map(
        lambda x_: P(axis, *([None] * (x_.ndim - 1))), stacked_params)
    out = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(spec_params, P()), out_specs=P(),
        check_vma=False,
    )(stacked_params, x_mb)
    return out.reshape(b, *x.shape[1:])


def pipelined_encode_image(model, params, pixel_values: jax.Array, *,
                           mesh: Mesh, n_microbatches: int,
                           normalize: bool = True) -> jax.Array:
    """CLIP image embedding with the vision encoder's blocks pipelined.

    The patchify/positional front-end and the post-LN/projection head are
    tiny (<2% of tower FLOPs) and run replicated; the L encoder blocks —
    where the compute lives — run GPipe-parallel over the ``pipe`` axis.
    Output matches ``CLIP.encode_image`` (parity-tested on an 8-stage CPU
    mesh).
    """
    from video_quierer_tpu.models.clip.model import EncoderBlock

    c = model.cfg.vision
    vt_params = params["vision"]
    block = EncoderBlock(c.num_heads, c.mlp_ratio, c.layer_norm_eps,
                         dtype=model.dtype)

    # front-end recomputed inline (same ops/param names as
    # VisionTower.__call__ pre-encoder — model.py:146-169).
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values.astype(model.dtype),
        vt_params["patch_embedding"]["kernel"].astype(model.dtype),
        (c.patch_size, c.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches.reshape(b, c.num_patches, c.hidden_size)
    cls = vt_params["class_embedding"].astype(model.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls, (b, 1, c.hidden_size)), patches], axis=1)
    x = x + vt_params["position_embedding"].astype(model.dtype)[None]
    ln = vt_params["pre_layernorm"]
    x = _layer_norm(x, ln, c.layer_norm_eps, model.dtype)

    stacked = stack_layer_params(vt_params["encoder"], c.num_layers)
    x = pipeline_blocks(
        lambda p, a: block.apply({"params": p}, a),
        stacked, x, mesh=mesh, n_microbatches=n_microbatches)

    pooled = x[:, 0]
    pooled = _layer_norm(pooled, vt_params["post_layernorm"],
                         c.layer_norm_eps, model.dtype)
    feats = pooled @ params["visual_projection"]["kernel"].astype(
        model.dtype)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats.astype(jnp.float32)


def _layer_norm(x, p, eps, dtype):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)
