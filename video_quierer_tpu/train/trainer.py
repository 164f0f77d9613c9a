"""CLIP contrastive training on a device mesh.

A capability the reference lacks entirely (it can only consume frozen
PyTorch CLIP): fine-tune the dual towers on domain video-frame/caption
pairs with the standard symmetric InfoNCE objective, sharded over a
``(data, model)`` mesh:

- **data axis**: batch-sharded images/tokens. The loss needs all-pairs
  logits; written globally, XLA's GSPMD inserts the ``all_gather`` of
  features over ICI automatically (the jax-native version of the
  gather-features trick in open CLIP trainers).
- **model axis**: optional tensor parallelism — attention/MLP kernels are
  sharded on their output (column) dimension and the second matmul on its
  input (row) dimension, so each block is one ``psum`` at the output
  projection, the standard Megatron split. ViT-B/32 fits on one chip; the
  axis exists for the larger tower configs (config.py).
- Gradient rematerialization (``remat=True`` in the towers) trades FLOPs
  for HBM on long-batch training.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_quierer_tpu.models.clip.config import CLIPConfig
from video_quierer_tpu.models.clip.model import CLIP, init_params
from video_quierer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


class TrainState(train_state.TrainState):
    # Exponential moving average of params (None when EMA is disabled).
    # Serving from the EMA weights is the standard variance-reduction
    # trick for contrastive fine-tunes; tracked inside the jitted step so
    # it costs one fused multiply-add per weight, no host round-trip.
    ema_params: Any = None


def build_lr_schedule(learning_rate: float, schedule: str = "constant",
                      warmup_steps: int = 0,
                      total_steps: Optional[int] = None):
    """LR schedule factory: ``constant`` (optional linear warmup) or
    ``cosine`` (linear warmup → cosine decay to 0 over ``total_steps``)."""
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule requires total_steps")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total_steps)
    if schedule != "constant":
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps),
             optax.constant_schedule(learning_rate)], [warmup_steps])
    return optax.constant_schedule(learning_rate)


# ---------------------------------------------------------------------------
# Partitioning rules (tensor parallelism)
# ---------------------------------------------------------------------------

def param_partition_spec(path: Tuple[str, ...], leaf) -> P:
    """Megatron-style specs by parameter name.

    qkv / fc1 kernels: column-split ``P(None, 'model')``; out_proj / fc2
    kernels: row-split ``P('model', None)``; their biases follow the output
    dim; everything else replicated.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    leafname = names[-1]
    # Switch-MoE expert stacks [E, ...] split on the expert axis
    # (parallel/moe.py:expert_partition_spec — same rule, composed here
    # so one pass places a dense+MoE tree)
    if leafname in ("w1", "b1", "w2", "b2"):
        from video_quierer_tpu.parallel.moe import EXPERT_AXIS
        return P(EXPERT_AXIS, *([None] * (leaf.ndim - 1)))
    col = any(s in joined for s in ("q_proj", "k_proj", "v_proj", "fc1"))
    row = any(s in joined for s in ("out_proj", "fc2"))
    if leafname == "kernel":
        if col:
            return P(None, MODEL_AXIS)
        if row:
            return P(MODEL_AXIS, None)
    if leafname == "bias" and col:
        return P(MODEL_AXIS)
    return P()


def _spec_for_mesh(spec: P, mesh: Mesh) -> P:
    """Drop axes the mesh doesn't have (a TP rule on a (data, expert)
    mesh degrades to replicated, and vice versa)."""
    return P(*(ax if ax in mesh.shape else None for ax in spec))


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh per the partition rules."""
    def place(path, leaf):
        spec = _spec_for_mesh(param_partition_spec(path, leaf), mesh)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for_mesh(param_partition_spec(path, leaf), mesh)),
        params)


# ---------------------------------------------------------------------------
# Objective
# ---------------------------------------------------------------------------

def clip_contrastive_loss(image_feats: jax.Array, text_feats: jax.Array,
                          logit_scale: jax.Array) -> jax.Array:
    """Symmetric InfoNCE over the global batch."""
    logits = logit_scale * jnp.dot(image_feats, text_feats.T,
                                   preferred_element_type=jnp.float32)
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T,
                                                             labels)
    return (loss_i.mean() + loss_t.mean()) / 2.0


MOE_AUX_WEIGHT = 0.01  # standard Switch load-balance coefficient


def _is_moe(model) -> bool:
    cfg = getattr(model, "cfg", None)
    vision = getattr(cfg, "vision", None)
    return bool(getattr(vision, "moe_experts", 0))


def loss_fn(params, model, images, input_ids):
    """Family-agnostic objective: CLIP towers return
    ``(img, txt, scale)`` → symmetric InfoNCE; SigLIP towers return
    ``(img, txt, scale, bias)`` → pairwise sigmoid loss. MoE towers
    (CLIPVisionConfig.moe_experts) additionally sow Switch aux
    load-balancing losses into the ``losses`` collection — added here
    with the standard 0.01 weight."""
    aux = 0.0
    if _is_moe(model):
        out, sown = model.apply({"params": params}, images, input_ids,
                                mutable=("losses",))
        for leaf in jax.tree.leaves(sown.get("losses", {})):
            aux = aux + MOE_AUX_WEIGHT * jnp.sum(leaf)
    else:
        out = model.apply({"params": params}, images, input_ids)
    if len(out) == 4:
        from video_quierer_tpu.models.siglip.model import \
            siglip_sigmoid_loss
        img, txt, scale, bias = out
        return siglip_sigmoid_loss(img, txt, scale, bias) + aux
    img, txt, scale = out
    return clip_contrastive_loss(img, txt, scale) + aux


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class CLIPTrainer:
    """Owns params/optimizer state and a mesh-sharded jitted train step.

    Works for any dual-encoder family whose module follows the
    ``__call__(images, ids) -> (img, txt, scale[, bias])`` convention —
    pass a pre-built ``model`` (e.g. a SigLIP) to override the default
    CLIP construction; the TP partition rules apply by parameter name
    (q/k/v/out_proj, fc1/fc2) and therefore cover both families.
    """

    def __init__(self, cfg: CLIPConfig = None, mesh: Optional[Mesh] = None,
                 learning_rate: float = 1e-5, weight_decay: float = 0.01,
                 dtype=jnp.float32, remat: bool = False, seed: int = 0,
                 params=None, model=None, schedule: str = "constant",
                 warmup_steps: int = 0, total_steps: Optional[int] = None,
                 max_grad_norm: Optional[float] = None,
                 ema_decay: Optional[float] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.ema_decay = ema_decay
        if model is not None:
            self.model = model
        else:
            self.model = CLIP(cfg, dtype=dtype, remat=remat)
        if params is None:
            if isinstance(self.model, CLIP):
                params = init_params(self.model, seed=seed)
            else:
                from video_quierer_tpu.models.siglip.model import \
                    siglip_init_params
                params = siglip_init_params(self.model, seed=seed)
        self._schedule = build_lr_schedule(learning_rate, schedule,
                                           warmup_steps, total_steps)
        tx = optax.adamw(self._schedule, weight_decay=weight_decay)
        if max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
        if mesh is not None:
            params = shard_params(params, mesh)
        # EMA starts as a COPY of params: the trees must not alias, or
        # the jitted step's donation would see the same buffer twice.
        ema0 = (jax.tree.map(jnp.copy, params)
                if ema_decay is not None else None)
        self.state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx,
            ema_params=ema0)
        self._step = self._build_step()

    def current_lr(self) -> float:
        """Learning rate the next step will use."""
        return float(self._schedule(self.state.step))

    @property
    def serving_params(self):
        """Params to serve/export: the EMA tree when tracked, else live."""
        return (self.state.ema_params if self.state.ema_params is not None
                else self.state.params)

    def _build_step(self):
        model = self.model
        ema_decay = self.ema_decay

        def train_step(state: TrainState, images, input_ids):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, model, images, input_ids)
            new_state = state.apply_gradients(grads=grads)
            if ema_decay is not None:
                new_ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    state.ema_params, new_state.params)
                new_state = new_state.replace(ema_params=new_ema)
            return new_state, loss

        if self.mesh is None:
            return jax.jit(train_step, donate_argnums=(0,))
        data_sharding_img = NamedSharding(
            self.mesh, P(DATA_AXIS, None, None, None))
        data_sharding_ids = NamedSharding(self.mesh, P(DATA_AXIS, None))
        # state sharding (params/moments/EMA per the TP rules) is inferred
        # from the committed input placement done by shard_params at
        # construction — in_shardings=None keeps it
        return jax.jit(
            train_step,
            in_shardings=(None, data_sharding_img, data_sharding_ids),
            donate_argnums=(0,))

    def step(self, images: np.ndarray, input_ids: np.ndarray) -> float:
        """One optimizer step on a [B,H,W,3] float batch + [B,77] ids."""
        images = jnp.asarray(images)
        input_ids = jnp.asarray(input_ids)
        if self.mesh is not None:
            images = jax.device_put(images, NamedSharding(
                self.mesh, P(DATA_AXIS, None, None, None)))
            input_ids = jax.device_put(input_ids, NamedSharding(
                self.mesh, P(DATA_AXIS, None)))
        self.state, loss = self._step(self.state, images, input_ids)
        return float(loss)
