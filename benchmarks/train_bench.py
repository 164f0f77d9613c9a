#!/usr/bin/env python3
"""Contrastive training throughput: full CLIP fwd+bwd+AdamW per step.

Round-4 VERDICT weak item 7: the BASELINE training row (1,861 img/s,
f32, batch 128) was a round-2 measurement that predates two rounds of
kernel work and had no MFU or mixed-precision figure. This measures
the REAL ``CLIPTrainer`` step (train/trainer.py — donated state, AdamW,
optional EMA) at batch 128/256 in f32 and bf16-mixed (f32 params +
AdamW moments, bf16 tower compute — flax keeps params at their own
dtype; ``CLIPTrainer(dtype=jnp.bfloat16)`` is the mixed step) in one
session, back-to-back.

Methodology (CLAUDE.md): distinct pre-staged device batches; steps
chain through the donated TrainState so the device pipeline never
drains; completion forced by ONE loss fetch per timed loop; settle
pass + two timed loops, second reported.

FLOP accounting: fwd = B·(vision 4.36 + text 1.41) GF for ViT-B/32
pairs; step ≈ 3x fwd (bwd ~2x fwd; AdamW elementwise is noise). MFU is
quoted against v5e bf16 peak (~197 TFLOP/s) for the bf16 step only —
f32 has no MXU peak to quote on this chip.

    python benchmarks/train_bench.py [--batches 128,256]
        [--dtypes float32,bfloat16] [--steps 12]

One JSON line on stdout; diagnostics to stderr.
"""

import argparse
import json
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


FWD_GF_PER_PAIR = 4.36 + 1.41
PEAK_TFLOPS_BF16 = 197.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--ema", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.train.trainer import CLIPTrainer

    log(f"backend: {jax.default_backend()}")
    out = {"steps_per_loop": args.steps, "modes": {}}

    for dt_name in args.dtypes.split(","):
        dtype = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
        for b in [int(x) for x in args.batches.split(",")]:
            tr = CLIPTrainer(cfg=vit_b_32(), dtype=dtype,
                             learning_rate=1e-5,
                             ema_decay=0.999 if args.ema else None)
            # distinct pre-staged batches ON DEVICE (in-loop host
            # transfers serialize dispatch on this transport)
            imgs = [jax.random.normal(jax.random.PRNGKey(i),
                                      (b, 224, 224, 3), jnp.float32)
                    for i in range(args.steps)]
            ids = [jax.random.randint(jax.random.PRNGKey(100 + i),
                                      (b, 77), 0, 49000, jnp.int32)
                   for i in range(args.steps)]
            for a in imgs + ids:
                a.block_until_ready()
            t0 = time.time()
            state, loss = tr._step(tr.state, imgs[0], ids[0])
            _ = float(loss)
            log(f"[{dt_name} b={b}] compile {time.time() - t0:.1f}s")
            # settle + two timed loops; steps chain through the donated
            # state (device-side dependency), ONE loss fetch at the end
            for rep in range(3):
                t0 = time.time()
                last = None
                for i in range(args.steps):
                    state, last = tr._step(state, imgs[i], ids[i])
                checksum = float(last)
                wall = time.time() - t0
                assert np.isfinite(checksum)
                log(f"[{dt_name} b={b}] rep{rep + 1} "
                    f"{wall / args.steps * 1000:.1f} ms/step "
                    f"[loss {checksum:.3f}]")
            ips = b * args.steps / wall
            tf = ips * 3 * FWD_GF_PER_PAIR / 1000.0
            mode = {"images_per_s": round(ips, 1),
                    "ms_per_step": round(wall / args.steps * 1000, 2),
                    "tflops": round(tf, 1)}
            if dt_name == "bfloat16":
                mode["mfu_pct"] = round(tf / PEAK_TFLOPS_BF16 * 100, 1)
            out["modes"][f"{dt_name}_b{b}"] = mode
            log(f"[{dt_name} b={b}] {ips:.0f} images/s, ~{tf:.1f} "
                "TFLOP/s")
            del tr, state, imgs, ids
    print(json.dumps(out))


if __name__ == "__main__":
    main()
