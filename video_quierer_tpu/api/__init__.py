"""HTTP API layer (aiohttp) — reference-parity endpoint surface."""

from video_quierer_tpu.api.app import create_app, run  # noqa: F401
