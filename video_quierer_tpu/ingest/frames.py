"""Frame extraction with reference-exact sampling semantics.

The sampling-interval math reproduces the live path byte-for-byte
(``VideoProcessor.extract_frames``, video_search_overhaul.py:149-201):

====================  =========================================
mode                  interval
====================  =========================================
``ultra_high``        ``max(1, total_frames // (max_frames * 2))``
``high``              ``max(1, total_frames // max_frames)``
``medium``            ``max(1, total_frames // (max_frames // 2))``
``low`` (default)     ``max(1, total_frames // (max_frames // 4))``
====================  =========================================

A frame is kept when ``frame_number % interval == 0``; extraction stops
once ``max_frames`` are collected; ``timestamp = frame_number / fps`` with
the reference's ``fps <= 0 → 30`` fallback (video_search_overhaul.py:190).

Unlike the reference we resize each kept frame to the CLIP input geometry
immediately (shortest-edge bicubic + center crop, ops/preprocess.py) so the
decode stage emits fixed-shape uint8 RGB batches ready for the device, and
BGR→RGB happens once here instead of per-frame on the inference path.
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from video_quierer_tpu.ops.preprocess import resize_shorter_side_and_crop

logger = logging.getLogger(__name__)

SAMPLING_MODES = ("ultra_high", "high", "medium", "low")


def sampling_interval(total_frames: int, max_frames: int,
                      sampling_mode: str) -> int:
    """The reference's mode → frame-interval mapping (see module docstring).
    ``sampling_mode`` values outside the known set behave like ``low``,
    as in the reference's trailing ``else``."""
    if sampling_mode == "ultra_high":
        return max(1, total_frames // (max_frames * 2))
    if sampling_mode == "high":
        return max(1, total_frames // max_frames)
    if sampling_mode == "medium":
        return max(1, total_frames // max(1, max_frames // 2))
    return max(1, total_frames // max(1, max_frames // 4))


def video_identity_hash(video_path: Path) -> str:
    """md5 of name+size+mtime — the staleness key the cache diffing uses
    (ref: VideoProcessor.get_video_hash, video_search_overhaul.py:143-147)."""
    stat = Path(video_path).stat()
    key = f"{Path(video_path).name}_{stat.st_size}_{stat.st_mtime}"
    return hashlib.md5(key.encode()).hexdigest()


@dataclasses.dataclass
class VideoMeta:
    path: Path
    fps: float
    total_frames: int

    @property
    def duration(self) -> float:
        fps = self.fps if self.fps > 0 else 30.0
        return self.total_frames / fps


def probe_video(video_path: Path) -> Optional[VideoMeta]:
    import cv2
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        return None
    meta = VideoMeta(
        path=Path(video_path),
        fps=cap.get(cv2.CAP_PROP_FPS),
        total_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
    )
    cap.release()
    return meta


def iter_sampled_frames(video_path: Path, max_frames: int = 300,
                        sampling_mode: str = "high", target_size: int = 224,
                        ) -> Iterator[Tuple[np.ndarray, float]]:
    """Yield ``(rgb_224 uint8, timestamp)`` pairs, reference sampling rules.

    Streams (never holds the whole video); the caller batches.
    """
    import cv2
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        logger.error("Cannot open %s", video_path)
        return
    try:
        fps = cap.get(cv2.CAP_PROP_FPS)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        interval = sampling_interval(total, max_frames, sampling_mode)
        kept = 0
        frame_number = 0
        while kept < max_frames:
            ok, frame_bgr = cap.read()
            if not ok:
                break
            if frame_number % interval == 0:
                ts = frame_number / fps if fps > 0 else frame_number / 30
                rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
                yield resize_shorter_side_and_crop(rgb, target_size), ts
                kept += 1
            frame_number += 1
    finally:
        cap.release()


def _native_default() -> bool:
    import os
    return os.environ.get("VQT_NATIVE_DECODE") == "1"


def extract_frames(video_path: Path, max_frames: int = 300,
                   sampling_mode: str = "high", target_size: int = 224,
                   use_native: Optional[bool] = None
                   ) -> Tuple[np.ndarray, List[float]]:
    """Materialized variant: ``([N,224,224,3] uint8 RGB, timestamps)``.

    Two behavior-identical decode tiers:

    - the default OpenCV streaming path (pip cv2 ships aggressively
      SIMD-tuned decode/resize binaries);
    - the in-repo native FFmpeg/C++ tier (ingest/native.py + native/
      decoder.cpp), opt-in via ``VQT_NATIVE_DECODE=1`` or
      ``use_native=True``. Measured on this host the pip cv2 build wins
      (654 vs 382 frames/s through the 8-worker pipeline at 640×480 —
      its bundled SIMD resize beats the system swscale/OpenCV); the
      native tier exists for environments without the tuned wheel and as
      the GIL-free decode substrate.
    """
    if use_native is None:
        use_native = _native_default()
    if use_native:
        from video_quierer_tpu.ingest import native
        if native.available():
            probed = native.probe(Path(video_path))
            if probed is not None:
                fps, total, _, _ = probed
                interval = sampling_interval(total, max_frames,
                                             sampling_mode)
                out = native.decode_sampled(Path(video_path), interval,
                                            max_frames, target_size)
                if out is not None:
                    return out
    frames, stamps = [], []
    for rgb, ts in iter_sampled_frames(video_path, max_frames, sampling_mode,
                                       target_size):
        frames.append(rgb)
        stamps.append(ts)
    if not frames:
        return (np.zeros((0, target_size, target_size, 3), np.uint8), [])
    return np.stack(frames), stamps


def frame_at_timestamp(video_path: Path, timestamp: float
                       ) -> Optional[np.ndarray]:
    """Seek-and-read one full-resolution BGR frame (preview endpoint,
    ref: server.py:229-249)."""
    import cv2
    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        return None
    try:
        fps = cap.get(cv2.CAP_PROP_FPS)
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(timestamp * fps))
        ok, frame = cap.read()
        return frame if ok else None
    finally:
        cap.release()
