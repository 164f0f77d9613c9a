"""Mesh construction for the three parallel axes of the framework.

The reference has no distributed anything (SURVEY.md §2.3); the TPU rebuild
scales along:

- ``corpus``: the ``[N, D]`` embedding matrix is row-sharded across devices;
  each device scans its shard and candidates are merged over ICI
  (index/sharded.py).
- ``data``: frame batches for CLIP inference / training are batch-sharded.
- ``model``: optional tensor parallelism for larger CLIP variants (attention
  heads / MLP columns).

All axes live in one ``jax.sharding.Mesh``; single-slice collectives ride ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

CORPUS_AXIS = "corpus"
DATA_AXIS = "data"
MODEL_AXIS = "model"


def corpus_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the corpus axis (serving-time index sharding)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (CORPUS_AXIS,))


def data_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    """2-D (data, model) mesh for inference / training.

    ``model_parallel=1`` gives pure data parallelism (the right choice for
    ViT-B/32; SURVEY.md §2.3 notes TP is only worthwhile for larger towers).
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
    arr = np.array(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
