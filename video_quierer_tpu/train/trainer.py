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

from typing import Optional, Tuple

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
    pass


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


def shard_params(params, mesh: Mesh):
    """Place a param tree on the mesh per the partition rules."""
    def place(path, leaf):
        spec = param_partition_spec(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh,
                                         param_partition_spec(path, leaf)),
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


def loss_fn(params, model, images, input_ids):
    """Family-agnostic objective: CLIP towers return
    ``(img, txt, scale)`` → symmetric InfoNCE; SigLIP towers return
    ``(img, txt, scale, bias)`` → pairwise sigmoid loss."""
    out = model.apply({"params": params}, images, input_ids)
    if len(out) == 4:
        from video_quierer_tpu.models.siglip.model import \
            siglip_sigmoid_loss
        img, txt, scale, bias = out
        return siglip_sigmoid_loss(img, txt, scale, bias)
    img, txt, scale = out
    return clip_contrastive_loss(img, txt, scale)


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
                 params=None, model=None):
        self.cfg = cfg
        self.mesh = mesh
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
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        if mesh is not None:
            params = shard_params(params, mesh)
        self.state = TrainState.create(apply_fn=self.model.apply,
                                       params=params, tx=tx)
        self._step = self._build_step()

    def _build_step(self):
        model = self.model

        def train_step(state: TrainState, images, input_ids):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, model, images, input_ids)
            new_state = state.apply_gradients(grads=grads)
            return new_state, loss

        if self.mesh is None:
            return jax.jit(train_step, donate_argnums=(0,))
        data_sharding_img = NamedSharding(
            self.mesh, P(DATA_AXIS, None, None, None))
        data_sharding_ids = NamedSharding(self.mesh, P(DATA_AXIS, None))
        p_shardings = param_shardings(self.state.params, self.mesh)
        state_shardings = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P()), self.state)
        # params (and adam moments, same tree shape) follow the TP rules
        state_shardings = state_shardings.replace(
            params=p_shardings,
            opt_state=jax.tree.map(
                lambda s: s, state_shardings.opt_state))
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
