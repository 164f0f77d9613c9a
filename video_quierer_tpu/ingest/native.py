"""ctypes bindings for the native FFmpeg decode tier (native/decoder.cpp).

The decode hot loop runs entirely in C++ (demux → decode → sample →
swscale → write into one contiguous buffer); Python supplies the sampling
plan (interval math stays in ingest/frames.py, tested against the
reference formulas) and receives a ready ``[N, S, S, 3]`` uint8 RGB batch.

Falls back silently when the shared library hasn't been built — the
OpenCV path in frames.py is behavior-identical. Build with
``make -C native`` (auto-attempted once per process).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libvqt_decoder.so"

_lib = None
_load_attempted = False


class _VideoInfo(ctypes.Structure):
    _fields_ = [
        ("fps", ctypes.c_double),
        ("total_frames", ctypes.c_long),
        ("width", ctypes.c_int),
        ("height", ctypes.c_int),
    ]


def _try_build() -> bool:
    makefile = _NATIVE_DIR / "Makefile"
    if not makefile.exists():
        return False
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:
        logger.debug("native decoder build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native decoder; None if missing."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and not _try_build():
        logger.info("native decoder unavailable — using OpenCV path")
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vqt_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(_VideoInfo)]
        lib.vqt_probe.restype = ctypes.c_int
        lib.vqt_decode_sampled.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_double),
        ]
        lib.vqt_decode_sampled.restype = ctypes.c_int
        _lib = lib
        logger.info("native decoder loaded: %s", _LIB_PATH)
    except OSError as e:
        logger.warning("failed to load native decoder: %s", e)
    return _lib


def available() -> bool:
    return load() is not None


def probe(video_path: Path) -> Optional[Tuple[float, int, int, int]]:
    """``(fps, total_frames, width, height)`` or None."""
    lib = load()
    if lib is None:
        return None
    info = _VideoInfo()
    if lib.vqt_probe(str(video_path).encode(), ctypes.byref(info)) != 0:
        return None
    return info.fps, int(info.total_frames), info.width, info.height


def decode_sampled(video_path: Path, interval: int, max_frames: int,
                   target_size: int = 224
                   ) -> Optional[Tuple[np.ndarray, List[float]]]:
    """Native sampled decode → ``([N,S,S,3] uint8 RGB, timestamps)``.

    Returns None when the native library is unavailable or decoding fails
    (caller falls back to the OpenCV path).
    """
    lib = load()
    if lib is None:
        return None
    frames = np.empty((max_frames, target_size, target_size, 3), np.uint8)
    stamps = np.empty(max_frames, np.float64)
    n = lib.vqt_decode_sampled(
        str(video_path).encode(), int(interval), int(max_frames),
        int(target_size),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if n < 0:
        return None
    return frames[:n].copy(), stamps[:n].tolist()
