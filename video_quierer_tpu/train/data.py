"""Training data pipeline: (frame, caption) batches from a videos dir.

Makes the trainer (trainer.py) usable end-to-end on the same corpus the
engine serves: frames stream through the ingest decode pipeline and pair
with captions. Captions come from a sidecar ``captions.json``
(``{video_filename: caption}``) when present; otherwise from the video's
filename (``"my_dog_at_the_beach.mp4"`` → ``"my dog at the beach"``) — the
standard weak-supervision fallback for domain adaptation when no labels
exist.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from video_quierer_tpu.ingest.pipeline import batched_frames
from video_quierer_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD


def caption_for(video_path: Path,
                captions: Optional[Dict[str, str]] = None) -> str:
    name = Path(video_path).name
    if captions and name in captions:
        return captions[name]
    stem = Path(name).stem
    # strip upload uuid prefixes ("<uuid>_original_name")
    stem = re.sub(r"^[0-9a-f]{8}-[0-9a-f-]{27}_", "", stem)
    words = re.sub(r"[_\-.]+", " ", stem).strip()
    return f"a video of {words}" if words else "a video"


def load_captions(videos_dir: Path) -> Optional[Dict[str, str]]:
    path = Path(videos_dir) / "captions.json"
    if path.exists():
        try:
            with open(path) as f:
                return {str(k): str(v) for k, v in json.load(f).items()}
        except Exception:
            return None
    return None


def frame_caption_batches(video_paths: Sequence[Path], tokenizer,
                          batch_size: int = 64,
                          max_frames_per_video: int = 32,
                          sampling_mode: str = "medium",
                          captions: Optional[Dict[str, str]] = None,
                          image_size: int = 224,
                          mean=CLIP_MEAN, std=CLIP_STD,
                          ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield ``(images f32 [B,S,S,3] normalized, input_ids [B,ctx])``.

    Images are normalized on the host here (training batches feed a
    float pipeline directly; serving keeps uint8 transfer + on-device
    normalization). ``mean``/``std`` MUST match the family being trained
    (CLIP defaults; pass SIGLIP_MEAN/STD for SigLIP so train and serve
    see the same input distribution).
    """
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    caption_ids = {}
    for i, p in enumerate(video_paths):
        text = caption_for(p, captions)
        caption_ids[i] = tokenizer(text)[0]

    from video_quierer_tpu.ingest.frames import extract_frames

    def extract(path):
        # thread image_size through to the decode tier — towers other
        # than 224px (e.g. test/tiny or future configs) must train on
        # the resolution they serve at
        return extract_frames(path, max_frames=max_frames_per_video,
                              sampling_mode=sampling_mode,
                              target_size=image_size)

    for batch in batched_frames(list(video_paths),
                                max_frames=max_frames_per_video,
                                sampling_mode=sampling_mode,
                                batch_size=batch_size,
                                extract_fn=extract):
        if len(batch) < batch_size:
            continue  # drop ragged tail — training wants fixed shapes
        images = (batch.frames.astype(np.float32) / 255.0 - mean) / std
        ids = np.stack([caption_ids[v] for v in batch.video_indices])
        yield images, ids.astype(np.int32)


def train_on_videos(trainer, video_paths: Sequence[Path], tokenizer,
                    epochs: int = 1, batch_size: int = 64,
                    max_frames_per_video: int = 32,
                    captions: Optional[Dict[str, str]] = None,
                    image_size: int = 224,
                    mean=CLIP_MEAN, std=CLIP_STD):
    """Simple epoch loop; returns per-step losses. ``image_size`` must
    match the tower being trained (cfg.vision.image_size)."""
    losses = []
    for _ in range(epochs):
        for images, ids in frame_caption_batches(
                video_paths, tokenizer, batch_size=batch_size,
                max_frames_per_video=max_frames_per_video,
                captions=captions, image_size=image_size,
                mean=mean, std=std):
            losses.append(trainer.step(images, ids))
    return losses
