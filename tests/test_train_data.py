"""Training data pipeline tests: captioning, batch shapes, end-to-end
fine-tuning loss decrease on a tiny model."""

import json

import numpy as np
import pytest

from tests.helpers import make_synthetic_video
from tests.test_train import TINY
from video_quierer_tpu.models.clip.tokenizer import HashTokenizer
from video_quierer_tpu.train.data import (
    caption_for,
    frame_caption_batches,
    load_captions,
    train_on_videos,
)
from video_quierer_tpu.train.trainer import CLIPTrainer


def test_caption_from_filename():
    assert caption_for("my_dog_at_the_beach.mp4") == \
        "a video of my dog at the beach"
    assert caption_for(
        "1c2ff5aa-1111-2222-3333-444455556666_holiday-trip.mp4") == \
        "a video of holiday trip"
    assert caption_for("x.mp4", {"x.mp4": "a custom caption"}) == \
        "a custom caption"


def test_load_captions(tmp_path):
    assert load_captions(tmp_path) is None
    (tmp_path / "captions.json").write_text(
        json.dumps({"a.mp4": "hello"}))
    assert load_captions(tmp_path) == {"a.mp4": "hello"}
    (tmp_path / "captions.json").write_text("{broken")
    assert load_captions(tmp_path) is None


def test_batch_shapes(tmp_path):
    paths = [make_synthetic_video(tmp_path / f"t{i}.mp4", n_frames=30)
             for i in range(2)]
    tok = HashTokenizer()
    # medium mode: interval = max(1, 30 // (20//2)) = 3 → 10 frames/video
    batches = list(frame_caption_batches(paths, tok, batch_size=16,
                                         max_frames_per_video=20))
    assert len(batches) == 1  # 20 frames → one full 16-batch, tail dropped
    images, ids = batches[0]
    assert images.shape == (16, 224, 224, 3)
    assert images.dtype == np.float32
    assert ids.shape == (16, 77) and ids.dtype == np.int32
    # captions differ between the two videos
    assert not np.array_equal(ids[0], ids[-1])


def test_finetune_loss_decreases(tmp_path):
    paths = [make_synthetic_video(tmp_path / f"ft{i}.mp4", n_frames=20,
                                  size=(32, 32))
             for i in range(2)]

    class TinyTok(HashTokenizer):
        context_length = 8

        def encode_ids(self, text):
            # deterministic hash: builtin hash() is salted per process
            # (PYTHONHASHSEED), which made the loss-decrease assertion
            # flake across runs
            import zlib
            return [1 + (zlib.crc32(w.encode()) % 60)
                    for w in text.split()][:6]

    # tiny model takes 16x16 inputs; use a matching pipeline image size
    tok = TinyTok()
    # monkey-size: generate batches at the tiny model's image size
    from video_quierer_tpu.train.data import frame_caption_batches as fcb
    batches = list(fcb(paths, tok, batch_size=8, max_frames_per_video=8,
                       image_size=16))
    # frames come out at 224 (pipeline default target); resize for tiny
    import cv2
    trainer = CLIPTrainer(TINY, learning_rate=3e-3, seed=0)
    losses = []
    # 6 epochs (not 4): the loss separation after 4 was borderline enough
    # that XLA-CPU reduction-order jitter under full-suite contention
    # occasionally flipped the assertion (seen once in-suite, round 3).
    for _ in range(6):
        for images, ids in batches:
            small = np.stack([cv2.resize(f, (16, 16))
                              for f in images])
            ids8 = np.full((ids.shape[0], 8), 63, np.int32)
            ids8[:, :7] = ids[:, :7] % 62 + 1
            ids8[:, 0] = 62
            losses.append(trainer.step(small, ids8))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
