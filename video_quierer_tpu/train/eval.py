"""Validation retrieval metrics for dual-encoder fine-tuning.

The reference has no training and therefore no training evaluation; the
dead-path health checks (src/video_search_system.py:522-596) are the
closest analog. For a fine-tune to be trustworthy we need held-out
retrieval quality: encode (frame, caption) pairs, score all-pairs cosine
similarity, and report recall@k + median rank in both directions
(image→text and text→image) — the standard CLIP-style eval protocol.

All pairwise math runs on device in one jitted call (the similarity
matrix for a validation split is tiny next to the towers).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _encode(model, params, images: np.ndarray, ids: np.ndarray,
            batch_size: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Unit-norm image/text features, chunked to a fixed batch shape so
    the towers compile once."""
    n = images.shape[0]

    @jax.jit
    def enc(p, im, tk):
        img = model.apply({"params": p}, im, method=type(model).encode_image)
        txt = model.apply({"params": p}, tk, method=type(model).encode_text)
        return img, txt

    imgs, txts = [], []
    for lo in range(0, n, batch_size):
        im = images[lo: lo + batch_size]
        tk = ids[lo: lo + batch_size]
        pad = batch_size - im.shape[0]
        if pad:
            im = np.concatenate([im, np.repeat(im[-1:], pad, axis=0)])
            tk = np.concatenate([tk, np.repeat(tk[-1:], pad, axis=0)])
        fi, ft = enc(params, jnp.asarray(im), jnp.asarray(tk))
        m = batch_size - pad
        imgs.append(np.asarray(fi)[:m])
        txts.append(np.asarray(ft)[:m])
    return np.concatenate(imgs), np.concatenate(txts)


def _ranks(sim: np.ndarray) -> np.ndarray:
    """For each row i, the 0-based rank of column i by descending score
    (ties resolved pessimistically: equal scores ahead of the match count
    against it, so metrics never flatter a collapsed model)."""
    diag = sim[np.arange(sim.shape[0]), np.arange(sim.shape[0])]
    return (sim >= diag[:, None]).sum(axis=1) - 1


def retrieval_metrics(model, params, images: np.ndarray, ids: np.ndarray,
                      ks: Sequence[int] = (1, 5, 10),
                      batch_size: int = 64) -> Dict[str, float]:
    """Recall@k + median rank on aligned (image, caption) pairs.

    ``images``: float [N,S,S,3] already normalized for the family;
    ``ids``: int32 [N,ctx] tokenized captions; pair i is the positive.
    """
    if images.shape[0] != ids.shape[0]:
        raise ValueError("images and ids must pair 1:1")
    if images.shape[0] == 0:
        return {}
    img, txt = _encode(model, params, np.asarray(images), np.asarray(ids),
                       batch_size=batch_size)
    sim = img @ txt.T
    out: Dict[str, float] = {}
    for name, ranks in (("i2t", _ranks(sim)), ("t2i", _ranks(sim.T))):
        for k in ks:
            out[f"{name}_recall@{k}"] = float((ranks < k).mean())
        out[f"{name}_median_rank"] = float(np.median(ranks) + 1)
    return out


def evaluate_trainer(trainer, images: np.ndarray, ids: np.ndarray,
                     ks: Sequence[int] = (1, 5, 10),
                     batch_size: int = 64) -> Dict[str, float]:
    """Retrieval metrics using the trainer's serving params (EMA when
    tracked)."""
    return retrieval_metrics(trainer.model, trainer.serving_params,
                             images, ids, ks=ks, batch_size=batch_size)
