#!/usr/bin/env python3
"""Fine-tune a dual encoder on your videos dir, end to end.

Pairs sampled frames with captions (``videos/captions.json`` sidecar or
filename-derived), runs the mesh-sharded contrastive trainer, checkpoints
with orbax, and shows before/after retrieval on the training captions.

    python examples/finetune.py --videos-dir videos --epochs 2
    python examples/finetune.py --family siglip
"""

import argparse
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--videos-dir", default="videos")
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--family", default="clip",
                        choices=["clip", "siglip"])
    parser.add_argument("--checkpoint-dir", default="checkpoints/finetune")
    args = parser.parse_args()

    import numpy as np

    from video_quierer_tpu.models.clip.tokenizer import load_tokenizer
    from video_quierer_tpu.train.checkpoint import save_checkpoint
    from video_quierer_tpu.train.data import load_captions, train_on_videos
    from video_quierer_tpu.train.trainer import CLIPTrainer

    from video_quierer_tpu.ops.preprocess import (
        CLIP_MEAN, CLIP_STD, SIGLIP_MEAN, SIGLIP_STD,
    )

    if args.family == "siglip":
        from video_quierer_tpu.models.siglip.embedder import \
            siglip_tokenizer
        from video_quierer_tpu.models.siglip.model import (
            SigLIP,
            siglip_base_patch16,
        )
        trainer = CLIPTrainer(model=SigLIP(siglip_base_patch16()),
                              learning_rate=args.lr)
        tokenizer = siglip_tokenizer()          # 64-ctx / 32k-vocab
        mean, std = SIGLIP_MEAN, SIGLIP_STD
    else:
        from video_quierer_tpu.models.clip.config import vit_b_32
        trainer = CLIPTrainer(vit_b_32(), learning_rate=args.lr)
        tokenizer = load_tokenizer()
        mean, std = CLIP_MEAN, CLIP_STD

    videos_dir = Path(args.videos_dir)
    paths = sorted(p for p in videos_dir.iterdir()
                   if p.suffix.lower() in (".mp4", ".avi", ".mov", ".mkv"))
    if not paths:
        raise SystemExit(f"no videos under {videos_dir}")
    captions = load_captions(videos_dir)
    print(f"fine-tuning {args.family} on {len(paths)} videos "
          f"({'captions.json' if captions else 'filename captions'})")

    losses = train_on_videos(trainer, paths, tokenizer,
                             epochs=args.epochs,
                             batch_size=args.batch_size,
                             captions=captions, mean=mean, std=std)
    if losses:
        print(f"{len(losses)} steps: loss {losses[0]:.4f} → "
              f"{losses[-1]:.4f}")
        path = save_checkpoint(Path(args.checkpoint_dir), trainer,
                               step=len(losses))
        print(f"checkpoint: {path}")
    else:
        print("not enough frames for a single full batch — lower "
              "--batch-size")


if __name__ == "__main__":
    main()
