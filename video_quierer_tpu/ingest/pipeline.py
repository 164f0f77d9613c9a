"""Host-side ingest pipeline: parallel decode → cross-video batches.

The reference's throughput path is strictly serial and single-frame
(HOT LOOP 1 + 2 in SURVEY.md §3.2: decode every frame, then one CLIP call
per frame). Here:

- videos decode concurrently in a thread pool (OpenCV releases the GIL in
  C++ decode — this is the framework's native decode tier);
- sampled frames flow in deterministic video order into fixed-size
  cross-video batches, so device batches stay full even when a video yields
  few frames (SURVEY.md §7 design delta 4);
- at most ``prefetch`` videos are in flight, bounding host memory;
- the consumer (engine) overlaps device embedding of batch *t* with host
  decode of batch *t+1* for free — the pool keeps decoding while the engine
  blocks on the TPU.

Frame order — and therefore ``frame_id`` assignment — matches the
reference's sequential semantics exactly: frames of video *i* all precede
frames of video *i+1*, in timestamp order.
"""

from __future__ import annotations

import dataclasses
import logging
import multiprocessing
import pickle
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from video_quierer_tpu.ingest.frames import extract_frames

logger = logging.getLogger(__name__)


def _interval_extract(path: Path, max_frames: int, sampling_mode: str):
    """Module-level default extractor (picklable, so the process pool
    can ship it to decode workers)."""
    return extract_frames(path, max_frames=max_frames,
                          sampling_mode=sampling_mode)


def strategy_extract(path: Path, **kw):
    """Module-level strategy extractor (picklable twin of the engine's
    sampler wiring — ingest/samplers.py)."""
    from video_quierer_tpu.ingest.samplers import extract_frames_strategy
    return extract_frames_strategy(path, **kw)


def _make_pool(num_workers: int, num_procs: int, extract_fn):
    """Decode pool: threads by default (OpenCV/FFmpeg release the GIL in
    C++ decode), or an opt-in PROCESS pool (``num_procs > 0``) for hosts
    where sampling runs Python-heavy strategies (adaptive/hybrid scene
    detection holds the GIL in numpy between decodes) or the native tier
    is unavailable. Decode cost scales with SOURCE frames (~420
    f/s/core at 720p — BASELINE.md), so few-core hosts are decode-bound
    and real parallelism needs processes.

    Spawn context: fork would clone the parent's JAX/TPU runtime threads
    mid-flight; spawned workers never initialize a JAX backend (decode
    is numpy/OpenCV/FFmpeg only). Falls back to threads when the
    extractor can't be pickled (closures), with a warning.
    """
    if num_procs > 0:
        try:
            pickle.dumps(extract_fn)
        except Exception:
            logger.warning(
                "decode_processes=%d requested but the extractor is not "
                "picklable (%r) — falling back to the thread pool",
                num_procs, extract_fn)
        else:
            return ProcessPoolExecutor(
                max_workers=num_procs,
                mp_context=multiprocessing.get_context("spawn"))
    return ThreadPoolExecutor(max_workers=num_workers)


@dataclasses.dataclass
class FrameBatch:
    frames: np.ndarray          # [B, S, S, 3] uint8 RGB
    video_indices: List[int]    # index into the input ``video_paths`` list
    timestamps: List[float]

    def __len__(self) -> int:
        return self.frames.shape[0]


ExtractFn = Callable[[Path], Tuple[np.ndarray, List[float]]]


def batched_frames(video_paths: Sequence[Path],
                   max_frames: int = 300,
                   sampling_mode: str = "high",
                   batch_size: int = 256,
                   num_workers: int = 4,
                   prefetch: int = 8,
                   extract_fn: Optional[ExtractFn] = None,
                   num_procs: int = 0,
                   ) -> Iterator[FrameBatch]:
    """Yield cross-video ``FrameBatch``es in deterministic video order.

    ``num_procs > 0`` decodes in a spawn-context PROCESS pool instead of
    threads (see :func:`_make_pool`); frame order, ``frame_id``
    assignment, and batching are identical under any pool — consumption
    follows submission order, never completion order.
    """
    if not video_paths:
        return
    if extract_fn is None:
        import functools
        extract_fn = functools.partial(_interval_extract,
                                       max_frames=max_frames,
                                       sampling_mode=sampling_mode)

    buf_frames: List[np.ndarray] = []
    buf_vidx: List[int] = []
    buf_ts: List[float] = []

    def drain(force: bool) -> Iterator[FrameBatch]:
        nonlocal buf_frames, buf_vidx, buf_ts
        while len(buf_frames) >= batch_size or (force and buf_frames):
            take = min(batch_size, len(buf_frames))
            yield FrameBatch(
                frames=np.stack(buf_frames[:take]),
                video_indices=buf_vidx[:take],
                timestamps=buf_ts[:take],
            )
            buf_frames = buf_frames[take:]
            buf_vidx = buf_vidx[take:]
            buf_ts = buf_ts[take:]

    with _make_pool(num_workers, num_procs, extract_fn) as pool:
        futures = {}
        next_submit = 0
        next_consume = 0

        def submit_upto(limit: int):
            nonlocal next_submit
            while (next_submit < len(video_paths)
                   and next_submit - next_consume < limit):
                futures[next_submit] = pool.submit(
                    extract_fn, Path(video_paths[next_submit]))
                next_submit += 1

        submit_upto(prefetch)
        while next_consume < len(video_paths):
            fut = futures.pop(next_consume)
            try:
                frames, stamps = fut.result()
            except Exception:
                logger.exception("Failed to extract %s — skipping",
                                 video_paths[next_consume])
                frames = np.zeros((0, 224, 224, 3), np.uint8)
                stamps = []
            for j in range(frames.shape[0]):
                buf_frames.append(frames[j])
                buf_vidx.append(next_consume)
                buf_ts.append(stamps[j])
            next_consume += 1
            submit_upto(prefetch)
            yield from drain(force=False)
        yield from drain(force=True)


def group_by_video(batch: FrameBatch
                   ) -> Iterator[Tuple[int, np.ndarray, List[float]]]:
    """Split a batch into contiguous same-video runs (order-preserving)."""
    if len(batch) == 0:
        return
    start = 0
    for i in range(1, len(batch) + 1):
        if i == len(batch) or batch.video_indices[i] != \
                batch.video_indices[start]:
            yield (batch.video_indices[start],
                   batch.frames[start:i],
                   batch.timestamps[start:i])
            start = i
