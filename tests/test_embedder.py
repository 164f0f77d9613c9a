"""CLIPEmbedder integration tests (CPU, seeded-random weights).

Weight-agnostic properties: output shape, L2 normalization, bucketing
invariance (padding a batch must not change individual embeddings),
determinism across calls.
"""

import numpy as np
import pytest

from video_quierer_tpu.models.clip.embedder import CLIPEmbedder


@pytest.fixture(scope="module")
def embedder():
    return CLIPEmbedder(seed=0)


def test_embed_frames_shape_and_norm(embedder, rng):
    frames = rng.integers(0, 255, (5, 224, 224, 3), dtype=np.uint8)
    feats = embedder.embed_frames(frames)
    assert feats.shape == (5, 512)
    assert feats.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-5)


def test_bucketing_invariance(embedder, rng):
    """Same frame must embed identically alone and inside a larger batch."""
    frames = rng.integers(0, 255, (3, 224, 224, 3), dtype=np.uint8)
    solo = embedder.embed_frames(frames[:1])
    batch = embedder.embed_frames(frames)
    np.testing.assert_allclose(solo[0], batch[0], atol=1e-5)


def test_embed_empty(embedder):
    feats = embedder.embed_frames(np.zeros((0, 224, 224, 3), np.uint8))
    assert feats.shape == (0, 512)


def test_embed_text(embedder):
    feats = embedder.embed_texts(["a dog", "a cat"])
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-5)
    again = embedder.embed_text("a dog")
    np.testing.assert_allclose(feats[0], again, atol=1e-6)
    # different text → different embedding (hash tokenizer, random weights)
    assert not np.allclose(feats[0], feats[1])


def test_unpretrained_flag(embedder):
    assert embedder.pretrained is False
