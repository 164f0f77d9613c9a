"""Device-side image preprocessing for CLIP inference.

The reference routes every frame through BGR→RGB → PIL → ``CLIPProcessor``
on the host, one frame at a time (video_search_overhaul.py:216-222). Here
the host pipeline only decodes and resizes (OpenCV is already native C++);
the uint8 ``[B, 224, 224, 3]`` RGB batch is shipped to the device once and
the cast + scale + CLIP mean/std normalization run fused on the VPU —
XLA fuses this chain into the ViT's patchify convolution's input.

Constants match CLIP's published normalization (also hard-coded by the
dead-path extractor, src/core/feature_extractor.py:54-61).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# SigLIP's image processor normalizes to [-1, 1]
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


@functools.partial(jax.jit, static_argnames=("dtype", "mean", "std"))
def normalize_images(frames_u8: jax.Array, dtype=jnp.float32,
                     mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """``[B, H, W, 3] uint8 RGB`` → normalized ``[B, H, W, 3]`` floats.

    Fused ``(x/255 - mean) / std`` as a single multiply-add:
    ``x * (1/(255*std)) - mean/std``. ``mean``/``std`` are static tuples
    (CLIP by default; pass SIGLIP_MEAN/STD for SigLIP towers).
    """
    scale = jnp.asarray([1.0 / (255.0 * s) for s in std], dtype)
    shift = jnp.asarray([m / s for m, s in zip(mean, std)], dtype)
    return frames_u8.astype(dtype) * scale - shift


def resize_shorter_side_and_crop(frame: np.ndarray, size: int = 224
                                 ) -> np.ndarray:
    """Host-side: resize shortest edge to ``size`` (bicubic) + center crop.

    Matches the geometry of HF's CLIP image processor that the reference
    uses implicitly (video_search_overhaul.py:221). Input HxWx3 uint8 RGB.
    """
    import cv2
    h, w = frame.shape[:2]
    if h < w:
        nh, nw = size, max(size, round(w * size / h))
    else:
        nh, nw = max(size, round(h * size / w)), size
    resized = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_CUBIC)
    top = (nh - size) // 2
    left = (nw - size) // 2
    return resized[top: top + size, left: left + size]
