#!/usr/bin/env python3
"""Engine-level ingest throughput: frames/sec through the FULL pipeline
(batching + CLIP embed + index append), the north-star #2 measurement at
the system level rather than the raw model level (embed_bench.py).

``--synthetic`` replaces video decode with generated frames so the number
isolates the device path (decode throughput is measured separately in
tests/test_native_decoder.py); without it, synthetic MP4s are written and
decoded for the true end-to-end number.

    python benchmarks/ingest_bench.py [--videos 8] [--frames 256]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--videos", type=int, default=8)
    parser.add_argument("--frames", type=int, default=256,
                        help="frames per video")
    parser.add_argument("--synthetic", action="store_true",
                        help="skip video decode (device path only)")
    args = parser.parse_args()

    import numpy as np

    from video_quierer_tpu.engine import ApiConfig, EngineConfig, \
        VideoSearchEngine

    import jax
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        vids = Path(tmp) / "videos"
        vids.mkdir()
        cfg = EngineConfig(api=ApiConfig(max_frames=args.frames,
                                         sampling_mode="high"))
        engine = VideoSearchEngine(str(vids), config=cfg)

        paths = [vids / f"bench{i}.mp4" for i in range(args.videos)]
        if args.synthetic:
            def extract_fn(path: Path):
                frames = rng.integers(0, 255,
                                      (args.frames, 224, 224, 3),
                                      dtype=np.uint8)
                return frames, (np.arange(args.frames) / 30.0).tolist()
            for p in paths:
                p.touch()
        else:
            import cv2
            for p in paths:
                writer = cv2.VideoWriter(
                    str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                    (320, 240))
                for i in range(args.frames):
                    frame = rng.integers(0, 255, (240, 320, 3),
                                         dtype=np.uint8)
                    writer.write(frame)
                writer.release()
            extract_fn = None

        # warm: compile the embedder buckets on one video
        from video_quierer_tpu.ingest.pipeline import batched_frames, \
            group_by_video
        t0 = time.time()

        def run(paths):
            total = 0
            for batch in batched_frames(
                    paths, max_frames=args.frames, sampling_mode="high",
                    batch_size=engine.config.ingest.batch_size,
                    num_workers=engine.config.ingest.num_decode_workers,
                    extract_fn=extract_fn):
                feats = engine.embed_frames(batch.frames)
                pos = 0
                for vidx, frames, stamps in group_by_video(batch):
                    n = frames.shape[0]
                    engine.index.add_batch(feats[pos: pos + n],
                                           Path(paths[vidx]).name, stamps)
                    pos += n
                total += len(batch)
            return total

        warm = run(paths[:1])
        print(f"warm ({warm} frames incl. compile): "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

        t0 = time.time()
        total = run(paths[1:])
        dt = time.time() - t0
        mode = "synthetic (device path)" if args.synthetic \
            else "end-to-end (decode + embed + index)"
        print(f"{mode}: {total} frames in {dt:.2f}s = "
              f"{total / dt:.0f} frames/s")


if __name__ == "__main__":
    main()
