"""Interactive CLI search REPL (capability parity with the reference's
``python video_search_overhaul.py`` demo loop, video_search_overhaul.py:
459-504).

Usage:
    python -m video_quierer_tpu.cli [--videos-dir videos] [-k 5]
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(description="Interactive video search")
    parser.add_argument("--videos-dir", default="videos")
    parser.add_argument("-k", type=int, default=5)
    parser.add_argument("--log-level", default="INFO")
    args = parser.parse_args()

    logging.basicConfig(level=getattr(logging, args.log_level.upper(),
                                      logging.INFO),
                        format="%(levelname)s:%(name)s:%(message)s")

    from video_quierer_tpu.engine import VideoSearchEngine

    print("Video Search (TPU-native) — interactive demo")
    print("=" * 50)
    engine = VideoSearchEngine(args.videos_dir)
    engine.startup()
    print(f"\nIndex ready: {len(engine.index)} frames from "
          f"{len(engine.index.video_names())} videos.")
    print("Type a query, or 'quit' to exit.\n")

    while True:
        try:
            query = input("search> ").strip()
        except (KeyboardInterrupt, EOFError):
            print()
            break
        if query.lower() in ("quit", "exit", "q"):
            break
        if not query:
            continue
        results = engine.search(query, k=args.k)
        if not results:
            print("  no results")
            continue
        for i, r in enumerate(results, 1):
            print(f"  {i}. {r['video_name']} at {r['formatted_time']} "
                  f"(score {r['score']:.3f})")


if __name__ == "__main__":
    main()
