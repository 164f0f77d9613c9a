"""Unit tests for the device-side preprocessing op."""

import numpy as np
import jax.numpy as jnp

from video_quierer_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    normalize_images,
    resize_shorter_side_and_crop,
)


def test_normalize_matches_formula(rng):
    x = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    got = np.asarray(normalize_images(jnp.asarray(x)))
    expected = (x.astype(np.float32) / 255.0
                - np.array(CLIP_MEAN, np.float32)) / \
        np.array(CLIP_STD, np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_normalize_extremes():
    x = np.zeros((1, 4, 4, 3), np.uint8)
    lo = np.asarray(normalize_images(jnp.asarray(x)))[0, 0, 0]
    np.testing.assert_allclose(
        lo, [-m / s for m, s in zip(CLIP_MEAN, CLIP_STD)], rtol=1e-5)
    x[:] = 255
    hi = np.asarray(normalize_images(jnp.asarray(x)))[0, 0, 0]
    np.testing.assert_allclose(
        hi, [(1 - m) / s for m, s in zip(CLIP_MEAN, CLIP_STD)], rtol=1e-5)


def test_resize_geometry_landscape(rng):
    frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    out = resize_shorter_side_and_crop(frame, 224)
    assert out.shape == (224, 224, 3)


def test_resize_geometry_portrait(rng):
    frame = rng.integers(0, 255, (640, 360, 3), dtype=np.uint8)
    out = resize_shorter_side_and_crop(frame, 224)
    assert out.shape == (224, 224, 3)


def test_resize_upscale_small(rng):
    frame = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    out = resize_shorter_side_and_crop(frame, 224)
    assert out.shape == (224, 224, 3)


def test_resize_square_identity_size(rng):
    frame = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    out = resize_shorter_side_and_crop(frame, 224)
    np.testing.assert_array_equal(out, frame)
