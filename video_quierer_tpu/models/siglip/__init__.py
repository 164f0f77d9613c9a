"""SigLIP model family (second dual-encoder family beyond CLIP)."""

from video_quierer_tpu.models.siglip.model import (  # noqa: F401
    SigLIP,
    SigLIPConfig,
    siglip_base_patch16,
    siglip_init_params,
    siglip_sigmoid_loss,
)
