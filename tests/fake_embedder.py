"""Deterministic fake embedder for engine/API tests (SURVEY.md §4: a seeded
projection stands in for real CLIP, mirroring the role the reference's
handcrafted features played as a CLIP stand-in)."""

import hashlib

import numpy as np

DIM = 512


class FakeEmbedder:
    pretrained = False

    def __init__(self, seed: int = 0):
        rng = np.random.default_rng(seed)
        # fixed projection from a 12×12 gray thumbnail to DIM
        self._proj = rng.standard_normal((144, DIM)).astype(np.float32)

    def embed_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        import cv2
        n = frames_u8.shape[0]
        out = np.empty((n, DIM), np.float32)
        for i in range(n):
            gray = cv2.cvtColor(frames_u8[i], cv2.COLOR_RGB2GRAY)
            thumb = cv2.resize(gray, (12, 12)).astype(np.float32).ravel()
            v = (thumb / 255.0) @ self._proj
            out[i] = v / (np.linalg.norm(v) + 1e-10)
        return out

    def embed_frames_device(self, frames_u8: np.ndarray):
        """Device-handle twin (models/clip/embedder.py contract) so the
        engine's device-resident mirror append path is exercised in the
        CPU suite, not just the host fallback."""
        import jax.numpy as jnp
        feats = self.embed_frames(frames_u8)
        return jnp.asarray(feats), feats

    def embed_text(self, text: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.md5(text.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(DIM).astype(np.float32)
        return v / np.linalg.norm(v)

    def embed_texts(self, texts) -> np.ndarray:
        return np.stack([self.embed_text(t) for t in texts])
