"""Engine layer: orchestration, config, metrics, caching, fallbacks."""

from video_quierer_tpu.engine.config import (  # noqa: F401
    ApiConfig,
    EngineConfig,
    load_api_config,
    load_engine_config,
    save_api_config,
)
from video_quierer_tpu.engine.metrics import SystemMetrics  # noqa: F401
from video_quierer_tpu.engine.system import (  # noqa: F401
    VideoSearchEngine,
    format_timestamp,
)
