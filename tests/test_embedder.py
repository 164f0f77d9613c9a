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


def test_seq_trim_exact(embedder):
    """Trimming pad columns must not change the pooled text features.

    The text tower is CAUSAL and pools at the EOT position, so no
    position after the last EOT can influence the output — the trimmed
    and full-77 encodes must agree to float tolerance
    (models/clip/embedder.py trim_text_ids)."""
    import jax.numpy as jnp
    from video_quierer_tpu.models.clip.embedder import trim_text_ids

    ids = embedder.tokenizer(["a dog on a beach", "two people talking"])
    trimmed = trim_text_ids(ids)
    assert trimmed.shape[1] < ids.shape[1]  # short queries really trim
    full = np.asarray(embedder._encode_text_jit(embedder.params,
                                                jnp.asarray(ids)))
    cut = np.asarray(embedder._encode_text_jit(embedder.params,
                                               jnp.asarray(trimmed)))
    np.testing.assert_allclose(full, cut, atol=1e-4, rtol=1e-4)
    # cosine agreement is the retrieval-relevant invariant
    sim = (full * cut).sum(-1) / (
        np.linalg.norm(full, axis=-1) * np.linalg.norm(cut, axis=-1))
    assert (sim > 0.9999).all()


def test_trim_bucket_rules():
    from video_quierer_tpu.models.clip.embedder import trim_text_ids

    ids = np.zeros((2, 77), np.int64)
    ids[:, 0] = 5
    ids[0, 7] = 999  # EOT at col 7 → bucket 8 (short-query bucket)
    ids[1, 3] = 999
    assert trim_text_ids(ids).shape == (2, 8)
    # argmax takes the FIRST max, so the later EOT needs a higher id
    ids[0, 12] = 1000  # EOT at col 12 → bucket 16
    assert trim_text_ids(ids).shape == (2, 16)
    ids[1, 30] = 1000  # EOT at col 30 → bucket 32
    assert trim_text_ids(ids).shape == (2, 32)
    ids[0, 40] = 2000  # beyond 32 → full context
    assert trim_text_ids(ids).shape == (2, 77)
    # 1-D / empty inputs pass through untouched
    assert trim_text_ids(np.zeros((0, 77), np.int64)).shape[1] == 77
