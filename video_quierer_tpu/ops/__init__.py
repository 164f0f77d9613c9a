"""Compute kernels: Pallas TPU implementations with portable XLA fallbacks."""

from video_quierer_tpu.ops.topk import cosine_topk, merge_topk  # noqa: F401
