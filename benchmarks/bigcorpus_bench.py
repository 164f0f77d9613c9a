#!/usr/bin/env python3
"""Candidate-scan scaling probe beyond the headline corpus.

The sizing table (docs/OPERATIONS.md) claims one 16 GB v5e chip holds
~14M bf16 frames / ~28M int8; this probe substantiates the scan side at
a corpus several times the 2M-row headline: quantized mirrors only (no
f32 row store — at these sizes deployments host-re-rank or shard), live
PREFIX arrangement, fused candidate kernels, B-way batches, the same
stacked-jit steady-state methodology as decomp_bench.

The f32 corpus never exists on device: rows generate per chunk, cast to
the mirror dtypes, and the f32 chunk is freed before the next one.

    python benchmarks/bigcorpus_bench.py [--rows 8000000] [--width 256]

Prints one line per (dtype): steady-state ms/batch and us/query.
"""

import argparse
import math
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--r", type=int, default=4)
    ap.add_argument("--outer", type=int, default=4)
    ap.add_argument("--fetch", type=int, default=128)
    ap.add_argument("--dtypes", default="int8,bf16")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from video_quierer_tpu.ops.quantize import quantize_rows
    from video_quierer_tpu.ops.topk import (
        BLOCK_ROWS, CAND_BLOCK_ROWS, candidate_topk, candidate_topk_int8)

    log(f"backend: {jax.default_backend()}")
    gran = math.lcm(BLOCK_ROWS, CAND_BLOCK_ROWS)
    n_pad = -(-args.rows // gran) * gran
    B, R, OUT, fetch = args.width, args.r, args.outer, args.fetch
    dtypes = set(args.dtypes.split(","))

    # chunked on-device generation: at most one f32 chunk resident
    chunk = gran * max(1, (1 << 20) // gran)     # ~1M rows
    log(f"building {n_pad}x512 mirrors in {chunk}-row chunks...")
    t0 = time.time()
    b16_chunks, code_chunks, scale_chunks = [], [], []

    @jax.jit
    def gen(seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), (chunk, 512),
                              jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        codes, scales = quantize_rows(x)
        return x.astype(jnp.bfloat16), codes, scales

    for ci in range(n_pad // chunk):
        b16c, cc, sc = gen(ci)
        if "bf16" in dtypes:
            b16_chunks.append(b16c)
        if "int8" in dtypes:
            code_chunks.append(cc)
            scale_chunks.append(sc)
        b16c.block_until_ready()
    emb16 = jnp.concatenate(b16_chunks) if b16_chunks else None
    del b16_chunks
    codes = jnp.concatenate(code_chunks) if code_chunks else None
    scales = jnp.concatenate(scale_chunks) if scale_chunks else None
    del code_chunks, scale_chunks
    # prefix arrangement: generated rows ARE the shuffled order; the perm
    # column only translates positions (any values work for timing —
    # use identity so "host rows" are positions)
    perm = jnp.arange(n_pad, dtype=jnp.int32)
    valid = jnp.int32(args.rows)
    for a in (emb16, codes, scales):
        if a is not None:
            a.block_until_ready()
    log(f"mirrors ready in {time.time() - t0:.0f}s")

    qs = []
    for o in range(OUT):
        q = jax.random.normal(jax.random.PRNGKey(100 + o), (R, B, 512),
                              jnp.float32)
        qs.append((q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                   ).block_until_ready())

    def reg(per_batch, bigs):
        def run(stacked, *bs):
            def body(acc, x):
                v, i = per_batch(x, *bs)
                return acc + v.sum() + (i % 7).sum().astype(jnp.float32), \
                    None
            return lax.scan(body, jnp.float32(0), stacked)[0]
        j = jax.jit(run)
        return lambda x, _j=j, _b=bigs: _j(x, *_b)

    stages = []
    if codes is not None:
        stages.append(("scan-int8", reg(
            lambda q, c, s, pm: candidate_topk_int8(
                c, s, q, valid, k=fetch, perm=pm, prefix=True),
            (codes, scales, perm))))
    if emb16 is not None:
        stages.append(("scan-bf16", reg(
            lambda q, e, pm: candidate_topk(
                e, q, valid, k=fetch, perm=pm, prefix=True),
            (emb16, perm))))

    print(f"rows={args.rows} B={B} fetch={fetch}")
    for name, fn in stages:
        t0 = time.time()
        _ = float(fn(qs[0]))
        log(f"[{name}] compiled in {time.time() - t0:.0f}s")
        _ = float(sum(map(float, [fn(x) for x in qs])))     # settle
        for rep in (1, 2):
            t0 = time.time()
            outs = [fn(x) for x in qs]
            tot = outs[0]
            for o in outs[1:]:
                tot = tot + o
            chk = float(tot)
            wall = time.time() - t0
            ms_b = wall / (OUT * R) * 1000.0
            assert np.isfinite(chk)
            log(f"[{name}] rep{rep} {ms_b:.2f} ms/batch [chk {chk:.1f}]")
        print(f"{name} {ms_b:.2f} ms/batch {ms_b / B * 1000:.1f} us/query")


if __name__ == "__main__":
    main()
