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
# Outer axis for multi-slice deployments: collectives over this axis cross
# DCN (data-center network) between slices; CORPUS_AXIS stays within a
# slice and rides ICI. SURVEY.md §2.3: "DCN via jax.distributed only if
# multi-slice is ever needed" — this is that growth path.
DCN_AXIS = "dcn"


def corpus_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the corpus axis (serving-time index sharding)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (CORPUS_AXIS,))


def initialize_distributed() -> bool:
    """Multi-process (multi-slice / multi-host) runtime init, gated on env:
    ``VQT_COORDINATOR`` (host:port), ``VQT_NUM_PROCESSES``,
    ``VQT_PROCESS_ID``. No-op (returns False) when unset, so single-slice
    serving never pays the rendezvous."""
    import os
    coord = os.environ.get("VQT_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["VQT_NUM_PROCESSES"]),
        process_id=int(os.environ["VQT_PROCESS_ID"]))
    return True


def multislice_corpus_mesh(n_slices: int,
                           n_devices: int | None = None) -> Mesh:
    """2-D ``(dcn, corpus)`` mesh for a corpus sharded across slices.

    Row-major device order: devices of one slice stay contiguous on the
    inner (corpus/ICI) axis; the outer axis crosses slices over DCN. On a
    real multi-slice job ``jax.devices()`` already enumerates
    slice-by-slice, so the reshape maps axes onto the physical topology.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % n_slices:
        raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    arr = np.array(devs).reshape(n_slices, n // n_slices)
    return Mesh(arr, (DCN_AXIS, CORPUS_AXIS))


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


def pipe_mesh(n_stages: int | None = None) -> Mesh:
    """1-D (pipe,) mesh for pipeline-parallel encoder stages
    (parallel/pipeline.py). Stage s holds encoder layers
    ``[s·L/S, (s+1)·L/S)``."""
    from video_quierer_tpu.parallel.pipeline import PIPE_AXIS
    devs = jax.devices()
    if n_stages is not None:
        devs = devs[:n_stages]
    return Mesh(np.array(devs), (PIPE_AXIS,))
