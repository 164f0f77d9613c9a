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
    parser.add_argument("--schedule", default="constant",
                        choices=["constant", "cosine"])
    parser.add_argument("--warmup-steps", type=int, default=0)
    parser.add_argument("--total-steps", type=int, default=None,
                        help="decay horizon for --schedule cosine")
    parser.add_argument("--max-grad-norm", type=float, default=None)
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="e.g. 0.999 — serve/export the EMA weights")
    parser.add_argument("--val-fraction", type=float, default=0.0,
                        help="hold out this fraction of videos for "
                             "retrieval metrics (recall@k)")
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

    trainer_kw = dict(learning_rate=args.lr, schedule=args.schedule,
                      warmup_steps=args.warmup_steps,
                      total_steps=args.total_steps,
                      max_grad_norm=args.max_grad_norm,
                      ema_decay=args.ema_decay)
    if args.family == "siglip":
        from video_quierer_tpu.models.siglip.embedder import \
            siglip_tokenizer
        from video_quierer_tpu.models.siglip.model import (
            SigLIP,
            siglip_base_patch16,
        )
        trainer = CLIPTrainer(model=SigLIP(siglip_base_patch16()),
                              **trainer_kw)
        tokenizer = siglip_tokenizer()          # 64-ctx / 32k-vocab
        mean, std = SIGLIP_MEAN, SIGLIP_STD
    else:
        from video_quierer_tpu.models.clip.config import vit_b_32
        trainer = CLIPTrainer(vit_b_32(), **trainer_kw)
        tokenizer = load_tokenizer()
        mean, std = CLIP_MEAN, CLIP_STD

    videos_dir = Path(args.videos_dir)
    paths = sorted(p for p in videos_dir.iterdir()
                   if p.suffix.lower() in (".mp4", ".avi", ".mov", ".mkv"))
    if not paths:
        raise SystemExit(f"no videos under {videos_dir}")
    captions = load_captions(videos_dir)
    val_paths = []
    if args.val_fraction > 0 and len(paths) > 1:
        n_val = max(1, int(len(paths) * args.val_fraction))
        val_paths, paths = paths[:n_val], paths[n_val:]
    print(f"fine-tuning {args.family} on {len(paths)} videos "
          f"({'captions.json' if captions else 'filename captions'}"
          f"{f', {len(val_paths)} held out' if val_paths else ''})")

    def val_metrics():
        from video_quierer_tpu.train.data import frame_caption_batches
        from video_quierer_tpu.train.eval import evaluate_trainer
        ims, ids = [], []
        for bi, bt in frame_caption_batches(
                val_paths, tokenizer, batch_size=args.batch_size,
                captions=captions, mean=mean, std=std):
            ims.append(bi)
            ids.append(bt)
        if not ims:
            return {}
        return evaluate_trainer(trainer, np.concatenate(ims),
                                np.concatenate(ids))

    if val_paths:
        print("held-out retrieval before:", val_metrics())
    losses = train_on_videos(trainer, paths, tokenizer,
                             epochs=args.epochs,
                             batch_size=args.batch_size,
                             captions=captions, mean=mean, std=std)
    if losses:
        print(f"{len(losses)} steps: loss {losses[0]:.4f} → "
              f"{losses[-1]:.4f} (final lr {trainer.current_lr():.2e})")
        if val_paths:
            print("held-out retrieval after:", val_metrics())
        path = save_checkpoint(Path(args.checkpoint_dir), trainer,
                               step=len(losses))
        print(f"checkpoint: {path}")
    else:
        print("not enough frames for a single full batch — lower "
              "--batch-size")


if __name__ == "__main__":
    main()
