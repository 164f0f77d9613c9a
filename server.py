#!/usr/bin/env python3
"""Server entry point: serve the TPU-native video search API + web UI.

Usage:
    python server.py [--host 0.0.0.0] [--port 5001] [--videos-dir videos]

The reference's equivalent entry (server.py: uvicorn on 0.0.0.0:5001) is
preserved: same default host/port, same endpoint surface (SURVEY.md §3.6).
"""

import argparse
import logging


def main() -> None:
    import os
    # VIDEO_SEARCH_* env vars: documented by the reference's README
    # (README.md:194-198) but never read by its code — honored here.
    parser = argparse.ArgumentParser(description="TPU video search server")
    parser.add_argument("--host",
                        default=os.environ.get("VIDEO_SEARCH_HOST",
                                               "0.0.0.0"))
    parser.add_argument("--port", type=int,
                        default=int(os.environ.get("VIDEO_SEARCH_PORT",
                                                   "5001")))
    parser.add_argument("--videos-dir", default="videos")
    parser.add_argument("--config", default="config.json")
    parser.add_argument("--log-level",
                        default=os.environ.get("VIDEO_SEARCH_LOG_LEVEL",
                                               "INFO"))
    parser.add_argument("--platform", choices=["auto", "cpu"],
                        default=os.environ.get("VQT_PLATFORM", "auto"),
                        help="'cpu' forces the CPU backend (dev/CI boxes "
                             "where the TPU is absent or busy); 'auto' "
                             "uses whatever jax resolves")
    args = parser.parse_args()

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(levelname)s:%(name)s:%(message)s")

    if args.platform == "cpu":
        # must run before any backend use; the environment's TPU plugin
        # overrides the JAX_PLATFORMS env var, so the in-process config
        # update is the only reliable switch (tests/conftest.py does the
        # same)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pathlib import Path

    # Persistent XLA compilation cache: TPU compiles are expensive (tens
    # of seconds to minutes); caching them on disk makes restarts and the
    # first search after boot near-instant. Disable with
    # VQT_COMPILE_CACHE=off.
    cache_dir = os.environ.get("VQT_COMPILE_CACHE",
                               str(Path.home() / ".cache" / "vqt_xla"))
    if cache_dir.lower() != "off":
        import jax
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_quierer_tpu.api import run

    run(host=args.host, port=args.port, videos_dir=args.videos_dir,
        config_path=Path(args.config))


if __name__ == "__main__":
    main()
