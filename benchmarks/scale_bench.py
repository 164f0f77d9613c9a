#!/usr/bin/env python3
"""North-star #3 at scale: what it takes to index 10k videos at
ultra_high sampling (~1000 frames/video = 10M frames) — the reference's
"handles 10,000+ videos efficiently" claim (/root/reference/README.md:131)
measured component-by-component, composed into a whole-system projection.

Whole-system ingest = decode (host CPU) → H2D → CLIP embed (TPU) →
index append (host staging + device refresh). Each stage is measured
with the honest harness (distinct pre-staged inputs, settle pass,
device-side checksum — see CLAUDE.md), then the pipeline rate is
min(decode·workers, embed, append) since the engine overlaps stages
(ingest/pipeline.py prefetches decode; embedder double-buffers H2D).

H2D is excluded from the projection bottleneck on purpose: through THIS
environment's remote tunnel it is ~15 MB/s (an environment artifact —
measured and reported, not projected); on direct-attached TPU hosts
PCIe/DMA sustains GB/s, far above the decode ceiling.

    python benchmarks/scale_bench.py [--steps 12] [--batch 256]
        [--decode-seconds 6] [--append-rows 1000000]

Prints ONE JSON line on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

TARGET_VIDEOS = 10_000
FRAMES_PER_VIDEO = 1_000           # ultra_high ≈ 500-1000; worst case


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_embed(args) -> dict:
    """Device path: frames/s/chip through the serving image tower
    (uint8 → fused normalize → ViT-B/32 bf16), on-device batches."""
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.ops.preprocess import normalize_images

    log(f"backend: {jax.default_backend()}")
    model = CLIP(vit_b_32(), dtype=jnp.bfloat16)
    params = init_params(model, seed=0)

    @jax.jit
    def forward(params, frames_u8):
        pixels = normalize_images(frames_u8, dtype=jnp.bfloat16)
        return model.apply({"params": params}, pixels,
                           method=CLIP.encode_image)

    key = jax.random.PRNGKey(0)
    all_frames = jax.random.randint(
        key, (args.steps, args.batch, 224, 224, 3), 0, 255, jnp.uint8)
    steps = [all_frames[i] for i in range(args.steps)]
    for s in steps:
        s.block_until_ready()

    t0 = time.time()
    _ = float(forward(params, steps[0]).sum())
    log(f"[embed] compiled in {time.time() - t0:.1f}s")
    _ = float(sum(forward(params, s).sum() for s in steps))  # settle
    t0 = time.time()
    outs = [forward(params, s) for s in steps]
    checksum = float(sum(o.sum() for o in outs))
    dt = time.time() - t0
    assert checksum == checksum
    fps = args.batch * args.steps / dt
    log(f"[embed] {fps:.0f} frames/s/chip (batch {args.batch}, bf16) "
        f"[checksum {checksum:.1f}]")
    return {"frames_per_s": round(fps, 1), "batch": args.batch,
            "dtype": "bfloat16"}


def measure_decode(args) -> dict:
    """Host decode ceiling per worker: native C++ FFmpeg tier vs OpenCV
    on a synthetic 720p-class video, sampled the way ultra_high ingests
    (every 2nd frame to 224x224)."""
    import numpy as np

    from tests.helpers import make_synthetic_video
    from video_quierer_tpu.ingest import native

    out: dict = {}
    with tempfile.TemporaryDirectory() as tmp:
        n_frames = max(60, int(args.decode_seconds * 30))
        path = make_synthetic_video(Path(tmp) / "d.mp4",
                                    n_frames=n_frames, fps=30.0,
                                    size=(1280, 720))
        if native.available():
            t0 = time.time()
            frames, _ = native.decode_sampled(path, interval=2,
                                              max_frames=n_frames,
                                              target_size=224)
            dt = time.time() - t0
            # decoded every frame, emitted every 2nd
            out["native_fps_per_worker"] = round(n_frames / dt, 1)
            log(f"[decode] native: {n_frames} frames decoded in "
                f"{dt:.2f}s = {n_frames / dt:.0f} f/s/worker "
                f"({frames.shape[0]} sampled)")
        import cv2
        cap = cv2.VideoCapture(str(path))
        t0 = time.time()
        n = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if n % 2 == 0:
                cv2.resize(frame, (224, 224))
            n += 1
        cap.release()
        dt = time.time() - t0
        out["opencv_fps_per_worker"] = round(n / dt, 1)
        log(f"[decode] opencv: {n} frames in {dt:.2f}s = "
            f"{n / dt:.0f} f/s/worker")
    return out


def measure_append(args) -> dict:
    """Host index staging: add_batch rate into DeviceVideoIndex's
    columnar store (device refresh is amortized per ingest batch and
    overlaps the next decode; the host copy is the steady-state cost)."""
    import numpy as np

    from video_quierer_tpu.index.device_index import DeviceVideoIndex

    rows = args.append_rows
    block = 10_000
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((block, 512)).astype(np.float32)
    ts = np.arange(block, dtype=float)
    idx = DeviceVideoIndex()
    t0 = time.time()
    for i in range(rows // block):
        idx.add_batch(emb, f"v{i:05d}.mp4", ts)
    dt = time.time() - t0
    rate = rows / dt
    log(f"[append] {rows} rows staged in {dt:.1f}s = {rate:.0f} rows/s")
    return {"rows_per_s": round(rate, 1), "rows": rows}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--decode-seconds", type=float, default=6.0)
    ap.add_argument("--append-rows", type=int, default=1_000_000)
    ap.add_argument("--decode-workers", type=int, default=8,
                    help="parallel decode processes (ingest.num_decode_"
                         "workers); scales until cores saturate")
    args = ap.parse_args()

    embed = measure_embed(args)
    decode = measure_decode(args)
    append = measure_append(args)

    dec_per_worker = decode.get("native_fps_per_worker",
                                decode.get("opencv_fps_per_worker", 0.0))
    decode_rate = dec_per_worker * args.decode_workers
    # ultra_high emits every 2nd decoded frame: embed/append see half
    # the decode-side frame rate
    emit_ratio = 0.5
    pipeline = min(decode_rate * emit_ratio, embed["frames_per_s"],
                   append["rows_per_s"])
    total_frames = TARGET_VIDEOS * FRAMES_PER_VIDEO
    hours = total_frames / pipeline / 3600.0
    bottleneck = ("decode" if pipeline == decode_rate * emit_ratio else
                  "embed" if pipeline == embed["frames_per_s"] else
                  "append")
    log(f"[projection] pipeline {pipeline:.0f} indexed-frames/s "
        f"(bottleneck: {bottleneck}) -> {TARGET_VIDEOS} videos x "
        f"{FRAMES_PER_VIDEO} frames in {hours:.2f} h")
    print(json.dumps({
        "metric": "ingest_10k_videos_ultra_high_projection",
        "components": {"embed": embed, "decode": decode,
                       "append": append,
                       "decode_workers": args.decode_workers},
        "pipeline_frames_per_s": round(pipeline, 1),
        "bottleneck": bottleneck,
        "hours_to_index_10k_videos": round(hours, 2),
    }))


if __name__ == "__main__":
    main()
