#!/usr/bin/env python3
"""Quickstart: the Python API end to end.

Creates a synthetic video (no assets needed), indexes it through CLIP,
runs text / image / batch queries, and round-trips the cache file.

    python examples/quickstart.py
"""

import tempfile
from pathlib import Path

import numpy as np


def make_demo_video(path: Path) -> Path:
    """A tiny MP4 with three distinct scenes."""
    import cv2
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30.0, (160, 120))
    colors = [(40, 40, 200), (40, 200, 40), (200, 40, 40)]
    for i in range(90):
        frame = np.empty((120, 160, 3), np.uint8)
        frame[:] = colors[i // 30]
        frame[: 40, : 40] = (i * 7) % 256
        writer.write(frame)
    writer.release()
    return path


def main() -> None:
    from video_quierer_tpu.engine import (
        ApiConfig,
        EngineConfig,
        VideoSearchEngine,
    )
    from video_quierer_tpu.ingest.frames import extract_frames

    with tempfile.TemporaryDirectory() as tmp:
        videos = Path(tmp) / "videos"
        videos.mkdir()
        make_demo_video(videos / "demo.mp4")

        config = EngineConfig(api=ApiConfig(max_frames=30,
                                            sampling_mode="high"))
        engine = VideoSearchEngine(str(videos), config=config)
        engine.startup()
        print(f"indexed {len(engine.index)} frames from "
              f"{engine.index.video_names()}")

        # text query
        for result in engine.search("a red scene", k=3):
            print(f"  text  → {result['video_name']} at "
                  f"{result['formatted_time']} (score "
                  f"{result['score']:.3f})")

        # image query: find a known frame by its own pixels
        frames, stamps = extract_frames(videos / "demo.mp4", max_frames=30,
                                        sampling_mode="high")
        hit = engine.search_by_image(frames[10], k=1)[0]
        print(f"  image → frame at t={stamps[10]:.2f}s found at "
              f"t={hit['timestamp']:.2f}s (score {hit['score']:.4f})")

        # batched queries — one device pass
        for query, results in zip(["red", "green"],
                                  engine.search_batch(["red", "green"],
                                                      k=1)):
            print(f"  batch '{query}' → {results[0]['formatted_time']}")

        # the cache file is reference-pickle-compatible
        print(f"cache at {engine.cache_path} "
              f"({engine.cache_path.stat().st_size} bytes) — loadable by "
              f"the reference implementation as-is")


if __name__ == "__main__":
    main()
