"""Per-row symmetric int8 quantization for the embedding matrix.

``device_dtype='int8'`` mode stores the corpus as int8 codes + per-row f32
scales: the scan then reads 1 byte/element instead of 4 — a 4× HBM-traffic
reduction on the operation whose entire cost is that read. Exactness is
recovered by re-ranking the approximate top candidates against the f32
host matrix (index/device_index.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


@jax.jit
def quantize_rows(emb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``[N, D] f32`` → ``([N, D] int8, [N, 1] f32 scales)``.

    Symmetric per-row: ``scale = max|row| / 127``; zero rows get scale 0
    and all-zero codes (capacity padding stays harmless).
    """
    absmax = jnp.max(jnp.abs(emb), axis=-1, keepdims=True)
    # explicit reciprocal multiply: bit-parity with the host
    # quantize paths (index/device_index.py) — XLA rewrites a
    # divide-by-constant into an inexact reciprocal multiply
    scale = absmax * jnp.float32(1.0 / 127.0)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(emb / safe), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.jit
def quantize_rows_int4(emb: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``[N, D] f32`` → ``([N, D/2] int8 packed, [N, 1] f32 scales)``.

    Symmetric per-row 4-bit (``scale = max|row| / 7``, codes in
    [-7, 7]) in the SPLIT-HALVES pack: byte j carries feature j (low
    nibble) and feature ``j + D/2`` (high nibble), so the scan kernel
    unpacks into two contiguous half-depth code blocks with no lane
    interleave (ops/topk.py int4 tier). D must be even.
    """
    d = emb.shape[-1]
    absmax = jnp.max(jnp.abs(emb), axis=-1, keepdims=True)
    scale = absmax * jnp.float32(1.0 / 7.0)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(emb / safe), -7, 7).astype(jnp.int8)
    lo, hi = q[..., : d // 2], q[..., d // 2:]
    packed = (hi << jnp.int8(4)) | (lo & jnp.int8(0xF))
    return packed, scale.astype(jnp.float32)


def quantize_rows_int4_np(emb) -> Tuple:
    """Host twin of :func:`quantize_rows_int4` — bit-identical (same f32
    reciprocal multiply, same round-half-even, same pack)."""
    import numpy as np
    emb = np.asarray(emb, np.float32)
    d = emb.shape[-1]
    absmax = np.abs(emb).max(axis=-1, keepdims=True)
    scale = absmax * np.float32(1.0 / 7.0)
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.round(emb / safe), -7, 7).astype(np.int8)
    lo, hi = q[..., : d // 2], q[..., d // 2:]
    packed = (hi << np.int8(4)) | (lo & np.int8(0xF))
    return packed, scale.astype(np.float32)


def unpack_int4_np(packed):
    """``[..., D/2] int8`` packed → ``[..., D] int8`` codes (host;
    tests/debug)."""
    import numpy as np
    packed = np.asarray(packed, np.int8)
    lo = (packed << np.int8(4)) >> np.int8(4)
    hi = packed >> np.int8(4)
    return np.concatenate([lo, hi], axis=-1)
