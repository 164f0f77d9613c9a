"""Evaluation module tests."""

import numpy as np

from video_quierer_tpu.evaluation import (
    evaluate_modes,
    exact_topk_ids,
    recall_at_k,
)


def test_recall_at_k():
    truth = np.array([[1, 2, 3], [4, 5, 6]])
    perfect = truth.copy()
    assert recall_at_k(truth, perfect) == 1.0
    half = np.array([[1, 2, 99], [4, -1, -1]])
    assert abs(recall_at_k(truth, half) - 0.5) < 1e-9


def test_exact_topk_ids(rng):
    emb = rng.standard_normal((500, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    ids = exact_topk_ids(emb, emb[:3], k=1)
    np.testing.assert_array_equal(ids[:, 0], [0, 1, 2])


def test_evaluate_modes(rng):
    emb = rng.standard_normal((300, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    queries = emb[:4]

    def perfect(q, k):
        return exact_topk_ids(emb, q, k)

    def terrible(q, k):
        return np.full((q.shape[0], k), -1)

    out = evaluate_modes(emb, queries, 5,
                         {"good": perfect, "bad": terrible})
    assert out["good"] == 1.0
    assert out["bad"] == 0.0


def test_recall_ignores_sentinels(rng):
    emb = rng.standard_normal((3, 512)).astype(np.float32)
    truth = exact_topk_ids(emb, emb[:1], k=5)  # k > corpus → sentinels
    assert (truth[0] >= 2**31 - 1).sum() == 2
    got = truth.copy()
    assert recall_at_k(truth, got) == 1.0
