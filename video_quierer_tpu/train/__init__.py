"""Training: mesh-sharded CLIP contrastive fine-tuning."""

from video_quierer_tpu.train.trainer import (  # noqa: F401
    CLIPTrainer,
    clip_contrastive_loss,
    param_partition_spec,
    shard_params,
)
