#!/usr/bin/env python3
"""Measured 10k-video index build — the device path at FULL scale.

Round-2 VERDICT item 7: the "≤1.9 h for 10k videos" row was a projection
composed from small measurements; this runs the build at the real scale
(10,000 videos × 200 frames = 2,000,000 frames) and records wall-clock.

What is measured end-to-end here: per-batch CLIP embed on the TPU, the
feature fetch to host, and the REAL ``DeviceVideoIndex`` append path
(normalization, capacity growth, per-video bookkeeping) — i.e.
everything ingest does after decode. Frames are generated ON DEVICE
inside the embed dispatch: this host↔TPU link is a ~15 MB/s tunnel
(CLAUDE.md), so shipping 300 GB of real frames would measure the
tunnel, not the system — production hosts feed the chip over local
PCIe/ICI at GB/s. Decode is measured separately
(tests/test_native_decoder.py: native C++ FFmpeg tier, frames/s/worker;
tests/test_ingest.py pins worker-count invariance), and the system
bound is ``min(decode_rate · workers, this device rate)``.

    python benchmarks/build_bench.py [--videos 10000] [--frames 200]

Prints one JSON line on stdout; diagnostics to stderr.
"""

import argparse
import json
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stream", default="device",
                    choices=("device", "host", "off"),
                    help="mirror streaming mode: 'device' = "
                         "add_batch_device (features never leave the "
                         "device — the engine default), 'host' = "
                         "per-batch sync_mirror() from host, 'off' = "
                         "lazy one-shot sync at first query (the "
                         "round-3 behavior, for A/B)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.ops.preprocess import normalize_images

    log(f"backend: {jax.default_backend()}")
    n_total = args.videos * args.frames
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = CLIP(vit_b_32(), dtype=dtype)
    params = init_params(model, seed=0)

    # engine-true embed routing: the serving embedder runs image
    # encodes through the fused-layer vision tower when eligible
    # (ops/fused_layer.py; VQT_FUSED_LAYER=0 reverts)
    from video_quierer_tpu.ops.fused_layer import (
        fused_batch_eligible, fused_vision_encode,
        fused_vision_tower_eligible)
    cfg = vit_b_32()
    from video_quierer_tpu.ops.fused_layer import fused_vision_seq
    fused_ok = (fused_vision_tower_eligible(cfg.vision, dtype)
                and fused_batch_eligible(
                    args.batch, fused_vision_seq(cfg.vision.seq_len),
                    dtype))
    log(f"fused vision tower: {fused_ok}")

    @jax.jit
    def gen_embed(params, seed):
        # synthetic decode ON DEVICE: distinct uint8 frames per batch
        # (distinct inputs defeat the runtime's dispatch memoization)
        frames = jax.random.randint(
            jax.random.PRNGKey(seed), (args.batch, 224, 224, 3), 0, 255,
            jnp.uint8)
        pixels = normalize_images(frames, dtype=dtype)
        if fused_ok:
            return fused_vision_encode(params, pixels, cfg=cfg,
                                       dtype=dtype)
        return model.apply({"params": params}, pixels,
                           method=CLIP.encode_image)

    idx = DeviceVideoIndex(dim=512,
                           device_dtype=args.dtype
                           if args.dtype != "float32" else "float32")

    t0 = time.time()
    _ = np.asarray(gen_embed(params, jnp.int32(0)))
    log(f"compile: {time.time() - t0:.1f}s")

    fpv = args.frames
    t_start = time.time()
    done = 0
    pending = []
    DEPTH = 4  # dispatch-ahead depth: overlap fetch with compute
    seed = 1
    last_q = None
    while done < n_total or pending:
        while len(pending) < DEPTH and done + len(pending) * args.batch \
                < n_total:
            pending.append(gen_embed(params, jnp.int32(seed)))
            seed += 1
        feats_dev = pending.pop(0)                  # oldest in flight
        fetched = np.asarray(feats_dev)             # device→host fetch
        b = fetched.shape[0]
        start, done = done, done + b
        # segment this batch's rows into their videos (a video can span
        # batch boundaries; appends per video-segment, like the engine)
        pos = 0
        lo0 = idx.count
        while pos < b and start + pos < n_total:
            g = start + pos
            v, in_v = g // fpv, g % fpv
            n = min(fpv - in_v, b - pos, n_total - g)
            stamps = ((in_v + np.arange(n)) / 30.0).tolist()
            idx.add_batch(fetched[pos: pos + n], f"v{v}.mp4", stamps)
            pos += n
        if args.stream == "device":
            # one fused dispatch per embed batch (engine pattern)
            idx.stream_rows_device(feats_dev, offset=0, n=pos, lo=lo0)
        elif args.stream == "host":
            idx.sync_mirror()
        last_q = fetched[-1]
        vids = done // fpv
        if vids and vids % 1000 == 0 and done % fpv == 0:
            el = time.time() - t_start
            log(f"{vids} videos / {done} frames in {el:.0f}s "
                f"({done / el:.0f} f/s)")

    # one search proves the built index serves (and, in 'off' mode,
    # pays the one-shot mirror sync the engine used to do on first
    # query; in streaming modes it must cost steady-state latency)
    t_sync = time.time()
    q = np.asarray(last_q if last_q is not None else
                   np.random.default_rng(0).standard_normal(512),
                   np.float32)
    res = idx.search(q / np.linalg.norm(q), k=10)
    sync_s = time.time() - t_sync
    wall = time.time() - t_start
    assert idx.count == n_total, (idx.count, n_total)
    assert len(res) == 10

    log(f"TOTAL: {args.videos} videos / {n_total} frames in {wall:.0f}s "
        f"+ {sync_s:.1f}s first-query mirror sync")
    print(json.dumps({
        "videos": args.videos, "frames": n_total,
        "wall_s": round(wall, 1),
        "frames_per_s": round(n_total / wall, 1),
        "first_query_sync_s": round(sync_s, 2),
        "stream": args.stream,
        "scope": "device path at full scale: on-device synthetic decode "
                 "+ CLIP ViT-B/32 embed + feature fetch + real "
                 "DeviceVideoIndex append; decode tier measured "
                 "separately (min() composes the system bound)",
    }))


if __name__ == "__main__":
    main()
