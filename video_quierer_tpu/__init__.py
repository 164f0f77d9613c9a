"""video_quierer_tpu — TPU-native semantic video search framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the reference
``adhney/video-quierer`` engine (see /root/repo/SURVEY.md for the blueprint):

- ``ops``      : Pallas/XLA kernels — fused cosine matmul + top-k, image
                 preprocessing, normalization.
- ``index``    : HBM-resident padded embedding matrix with exact descending-
                 stable top-k search, mesh-sharded corpus scan, and bit-
                 compatible pickle v1.0 cache import/export
                 (ref: video_search_overhaul.py:23-106).
- ``models``   : Flax CLIP (ViT image tower + causal text tower) with
                 HuggingFace checkpoint conversion and a BPE tokenizer
                 (ref: video_search_overhaul.py:109-322).
- ``ingest``   : frame extraction with the reference's exact sampling-mode
                 interval math, adaptive/hybrid samplers, quality filter,
                 and a host->device batching pipeline
                 (ref: video_search_overhaul.py:149-201, src/core/frame_extractor.py).
- ``engine``   : orchestration (startup / hash-diff / process / search /
                 rebuild), config system, metrics, query cache
                 (ref: video_search_overhaul.py:325-456, src/utils/metrics.py,
                 src/storage/cache.py).
- ``api``      : HTTP surface with the same endpoint set and response shapes
                 as the reference (ref: src/api/routes.py, server.py).
- ``parallel`` : device-mesh helpers (corpus / data / model axes).
- ``train``    : contrastive CLIP fine-tuning step, sharded over the mesh.
"""

__version__ = "0.1.0"

from video_quierer_tpu.utils.env import tpu_available  # noqa: F401


def __getattr__(name):
    # Lazy top-level conveniences (importing the package stays cheap).
    if name == "VideoSearchEngine":
        from video_quierer_tpu.engine import VideoSearchEngine
        return VideoSearchEngine
    if name == "DeviceVideoIndex":
        from video_quierer_tpu.index import DeviceVideoIndex
        return DeviceVideoIndex
    if name == "CLIPEmbedder":
        from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
        return CLIPEmbedder
    raise AttributeError(name)
