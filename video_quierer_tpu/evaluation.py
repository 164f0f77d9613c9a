"""Retrieval quality evaluation: recall@k across index modes.

The reference has no evaluation machinery at all; for a production search
framework, regressions in the approximate tiers (bf16 / int8 / IVF) must
be measurable. ``recall_at_k`` compares any search callable against the
exact f32 scan as ground truth.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np
import jax.numpy as jnp

from video_quierer_tpu.ops.topk import cosine_topk


def exact_topk_ids(emb: np.ndarray, queries: np.ndarray, k: int
                   ) -> np.ndarray:
    """Ground-truth neighbor ids via the exact f32 scan."""
    _, idxs = cosine_topk(jnp.asarray(emb, jnp.float32),
                          jnp.asarray(queries, jnp.float32),
                          emb.shape[0], k=k)
    return np.asarray(idxs)


def recall_at_k(truth_ids: np.ndarray, got_ids: np.ndarray) -> float:
    """Mean |truth ∩ got| / |truth| over queries.

    Pads are ignored on both sides: ``got`` may contain -1, ``truth`` may
    contain the scan's 2**31-1 sentinel when k exceeds the corpus.
    """
    b, k = truth_ids.shape
    hits = 0
    denom = 0
    for i in range(b):
        truth = {int(x) for x in truth_ids[i]
                 if 0 <= x < 2**31 - 1}
        got = {int(x) for x in got_ids[i] if x >= 0}
        hits += len(truth & got)
        denom += len(truth)
    return hits / denom if denom else 1.0


def evaluate_modes(emb: np.ndarray, queries: np.ndarray, k: int,
                   searchers: Dict[str, Callable[[np.ndarray, int],
                                                 np.ndarray]]
                   ) -> Dict[str, float]:
    """Run each named searcher (``fn(queries, k) -> ids [B, k]``) and
    report recall@k against the exact scan."""
    truth = exact_topk_ids(emb, queries, k)
    return {name: recall_at_k(truth, fn(queries, k))
            for name, fn in searchers.items()}
