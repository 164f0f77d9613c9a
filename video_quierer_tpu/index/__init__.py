"""Vector index: device-resident exact search + pickle v1.0 cache parity."""

from video_quierer_tpu.index.device_index import DeviceVideoIndex  # noqa: F401
