"""Shared test fixtures: synthetic MP4 generation (SURVEY.md §4 — no large
binaries are committed; videos of known content are generated on the fly)."""

from pathlib import Path

import numpy as np


def make_synthetic_video(path: Path, n_frames: int = 90, fps: float = 30.0,
                         size=(64, 48), scene_every: int = 30,
                         seed: int = None) -> Path:
    """Write an MP4 whose frames encode their own index.

    Every frame has a distinct solid background that jumps hue at scene
    boundaries (``scene_every``) and drifts slightly within a scene, so
    scene-change samplers have something to detect and frame identity is
    recoverable from pixel values.
    """
    import cv2
    w, h = size
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
    assert writer.isOpened(), f"VideoWriter failed for {path}"
    if seed is None:  # distinct content per filename by default
        seed = sum(path.name.encode())
    rng = np.random.default_rng(seed)
    scene_colors = rng.integers(0, 255, (1 + n_frames // scene_every, 3))
    offset = int(rng.integers(0, 200))
    for i in range(n_frames):
        scene = i // scene_every
        base = scene_colors[scene].astype(np.int32)
        drift = (i % scene_every) * 4
        color = np.clip(base + drift, 0, 255).astype(np.uint8)
        frame = np.empty((h, w, 3), np.uint8)
        frame[:] = color
        # stamp the frame index into large pixel blocks so per-frame
        # identity survives mp4 quantization and thumbnail downsampling
        frame[: h // 2, : w // 4] = (i * 37 + offset) % 256
        frame[h // 2:, : w // 4] = (i * 91 + 13 + offset * 3) % 256
        writer.write(frame)
    writer.release()
    return path
