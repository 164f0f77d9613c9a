"""Device-mesh helpers: axis layout for corpus / data / model parallelism."""

from video_quierer_tpu.parallel.mesh import (  # noqa: F401
    CORPUS_AXIS,
    DATA_AXIS,
    MODEL_AXIS,
    corpus_mesh,
    data_mesh,
)
