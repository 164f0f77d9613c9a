"""Training: mesh-sharded CLIP contrastive fine-tuning."""

from video_quierer_tpu.train.trainer import (  # noqa: F401
    CLIPTrainer,
    build_lr_schedule,
    clip_contrastive_loss,
    param_partition_spec,
    shard_params,
)
from video_quierer_tpu.train.eval import (  # noqa: F401
    evaluate_trainer,
    retrieval_metrics,
)
