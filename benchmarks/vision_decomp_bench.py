#!/usr/bin/env python3
"""Per-stage decomposition of the ViT-B/32 fused vision tower.

Round-4 VERDICT weak item 2: the flagship B/32 embed sits at ~63-64%
MFU (14.2k f/s) while B/16 / L/14 / SigLIP read 71-73%, the pad-token
tiling hypothesis was REFUTED on hardware, and no kernel-level
decomposition existed. This times each stage of the fused tower
separately so the shortfall can be located (or proven structural at
d=768 / s=50):

  patchify  conv patch embed + cls/pos + pre-LN        (XLA ops)
  attn12    12x attention-half pallas kernels           (ops/fused_layer)
  mlp12     12x MLP-half pallas kernels
  epilogue  CLS pool + post-LN + projection + L2 norm   (XLA ops)
  tower     the full fused_vision_encode
  flax      unfused A/B twin

Methodology: stages can cost under the ~2 ms dispatch floor, so each
stage is applied R times over DISTINCT slices of a stacked operand
INSIDE one jit (lax.scan) and the per-application time is wall/R/outer
(CLAUDE.md stacked-jit rule); settle pass + two timed loops, second
reported. Per-stage FLOPs are printed next to measured TFLOP/s so the
gap shows as %-of-peak per stage (v5e bf16 peak ~197 TFLOP/s).

    python benchmarks/vision_decomp_bench.py [--batch 256] [--r 8]
        [--outer 4] [--stages patchify,attn12,...] [--tokens 512]

Diagnostics to stderr, one JSON line to stdout.
"""

import argparse
import functools
import json
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


PEAK_TFLOPS = 197.0  # v5e bf16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--stages", default="")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tokens", type=int, default=0,
                    help="override VQT_FUSED_LAYER_TOKENS (tile sweep)")
    args = ap.parse_args()
    if args.tokens:
        import os
        os.environ["VQT_FUSED_LAYER_TOKENS"] = str(args.tokens)
    only = set(s for s in args.stages.split(",") if s)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.ops import fused_layer as fl
    from video_quierer_tpu.ops.preprocess import normalize_images

    log(f"backend: {jax.default_backend()}")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = vit_b_32()
    c = cfg.vision
    model = CLIP(cfg, dtype=dtype)
    params = init_params(model, seed=0)
    b = args.batch
    d, s, heads, r_mlp = (c.hidden_size, c.seq_len, c.num_heads,
                          c.mlp_ratio)
    s_pad = fl.fused_vision_seq(s)
    t = fl._tile_tokens(b, s_pad, jnp.dtype(dtype).itemsize)
    log(f"d={d} s={s} (pad {s_pad}) tile t={t} "
        f"(bt={t // s_pad}) mode={fl._layer_mode(d, r_mlp, dtype)}")
    interp = fl._pallas_mode() == "interpret"
    vp = params["vision"]
    layer_ops = [fl._layer_operands(vp["encoder"][f"layers_{i}"], dtype)
                 for i in range(c.num_layers)]
    idr, idc = fl._item_ids(t, s_pad, s if s_pad != s else None)

    # ---- stage callables (x2 = [B*s_pad, d] residual stream) ----
    def patchify(frames_u8):
        pixels = normalize_images(frames_u8, dtype=dtype)
        patches = jax.lax.conv_general_dilated(
            pixels, vp["patch_embedding"]["kernel"].astype(dtype),
            window_strides=(c.patch_size, c.patch_size), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        patches = patches.reshape(b, c.num_patches, d)
        cls = vp["class_embedding"].astype(dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, d)), patches], axis=1)
        x = x + vp["position_embedding"].astype(dtype)[None]
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        x2 = x.reshape(b * s_pad, d)
        pre = vp["pre_layernorm"]
        return fl._ln_f32(x2, pre["scale"].astype(jnp.float32)[None],
                          pre["bias"].astype(jnp.float32)[None],
                          c.layer_norm_eps, dtype)

    def attn12(x2):
        for ops in layer_ops:
            ln, wqkv, bqkv, wout, bout = ops[:5]
            x2 = fl._attn_half_call(x2, idr, idc, ln, wqkv, bqkv, wout,
                                    bout, heads=heads,
                                    eps=c.layer_norm_eps, causal=False,
                                    interpret=interp)
        return x2

    def mlp12(x2):
        for ops in layer_ops:
            ln = ops[0]
            wfc1, bfc1, wfc2, bfc2 = ops[5:]
            x2 = fl._mlp_half_call(x2, ln, wfc1, bfc1, wfc2, bfc2, t=t,
                                   eps=c.layer_norm_eps,
                                   act="quick_gelu", interpret=interp)
        return x2

    def epilogue(x2):
        pooled = x2[jnp.arange(b) * s_pad]
        post = vp["post_layernorm"]
        pooled = fl._ln_f32(
            pooled, post["scale"].astype(jnp.float32)[None],
            post["bias"].astype(jnp.float32)[None], c.layer_norm_eps,
            dtype)
        proj = params["visual_projection"]["kernel"].astype(dtype)
        feats = jax.lax.dot_general(
            pooled, proj, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return fl._normalize_out(feats, dtype)

    # params as an ARGUMENT, not a closure constant: captured weights
    # embed in the serialized HLO and blow the remote-compile request
    # limit (CLAUDE.md closure-constant rule)
    def tower(p, frames_u8):
        pixels = normalize_images(frames_u8, dtype=dtype)
        return fl.fused_vision_encode(p, pixels, cfg=cfg, dtype=dtype)

    def flax_tower(p, frames_u8):
        pixels = normalize_images(frames_u8, dtype=dtype)
        return model.apply({"params": p}, pixels,
                           method=CLIP.encode_image)

    # ---- per-frame FLOPs (useful work; tile redundancy noted) ----
    # qkv+out projections 8sd^2/layer; attention matmuls as the KERNEL
    # computes them: t x t per head per tile, amortized over t//s_pad
    # frames (the cross-item redundancy is real work the kernel does)
    gf_attn_mm_kernel = 12 * heads * (t * t * (d // heads) * 2 * 2
                                      / (t // s_pad)) / 1e9
    gf_attn = 12 * s * (8 * d * d) / 1e9 + gf_attn_mm_kernel
    gf_mlp = 12 * s * (4 * r_mlp * d * d) / 1e9
    gf_patch = (c.num_patches * (c.patch_size ** 2 * 3) * d * 2) / 1e9
    gf = {"patchify": gf_patch, "attn12": gf_attn, "mlp12": gf_mlp,
          "epilogue": (d * 512 * 2) / 1e9, "tower": None, "flax": None}
    gf["tower"] = gf_patch + gf_attn + gf_mlp + gf["epilogue"]
    gf["flax"] = gf["tower"]

    # ---- stacked-R-in-jit harness ----
    key = jax.random.PRNGKey(0)
    frames = jax.random.randint(
        key, (args.outer, args.r, b, 224, 224, 3), 0, 255, jnp.uint8)
    x2_in = jax.random.normal(
        jax.random.PRNGKey(1), (args.outer, args.r, b * s_pad, d),
        jnp.float32).astype(dtype) * 0.02

    def stacked(fn):
        @jax.jit
        def run(stack):
            def body(acc, x):
                out = fn(x)
                return acc + out.astype(jnp.float32).sum(), 0.0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), stack)
            return acc
        return run

    stages = [
        ("patchify", patchify, frames),
        ("attn12", attn12, x2_in),
        ("mlp12", mlp12, x2_in),
        ("epilogue", epilogue, x2_in),
        ("tower", tower, frames),
        ("flax", flax_tower, frames),
    ]
    # The full towers exceed the remote-compile size limit inside an
    # R-unrolled scan (and at ~18 ms/dispatch they're far above the
    # dispatch floor anyway): time them as pipelined per-dispatch loops
    # over the flattened distinct inputs, like embed_bench.
    results = {}
    for name, fn, inputs in stages:
        if only and name not in only:
            continue
        if name in ("tower", "flax"):
            jfn = jax.jit(fn)
            flat = [inputs[i][j] for i in range(args.outer)
                    for j in range(args.r)]
            t0 = time.time()
            _ = float(jfn(params, flat[0]).sum())
            log(f"[{name}] compiled in {time.time() - t0:.1f}s")
            _ = float(sum(jfn(params, x).sum() for x in flat))
            for rep in (1, 2):
                t0 = time.time()
                acc = float(sum(jfn(params, x).astype(jnp.float32).sum()
                                for x in flat))
                wall = time.time() - t0
                assert np.isfinite(acc)
            per_app_ms = wall / len(flat) * 1000.0
        else:
            run = stacked(fn)
            t0 = time.time()
            _ = float(run(inputs[0]))
            log(f"[{name}] compiled in {time.time() - t0:.1f}s")
            _ = float(sum(run(inputs[i]) for i in range(args.outer)))
            for rep in (1, 2):
                t0 = time.time()
                acc = float(sum(run(inputs[i])
                                for i in range(args.outer)))
                wall = time.time() - t0
                assert np.isfinite(acc)
            per_app_ms = wall / (args.outer * args.r) * 1000.0
        us_frame = per_app_ms * 1000.0 / b
        tf = gf[name] * b / per_app_ms if gf[name] else 0.0
        results[name] = round(per_app_ms, 3)
        log(f"[{name}] {per_app_ms:.3f} ms/batch{b} "
            f"({us_frame:.2f} us/frame"
            + (f", {tf:.1f} TFLOP/s = {tf / PEAK_TFLOPS * 100:.0f}% "
               f"peak on {gf[name]:.2f} GF/frame)" if gf[name]
               else ")"))
    print(json.dumps({"batch": b, "tile_t": t, "stages_ms": results}))


if __name__ == "__main__":
    main()
