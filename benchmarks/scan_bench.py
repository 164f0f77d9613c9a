#!/usr/bin/env python3
"""Scan-kernel microbenchmark: fused cosine top-k over a 2M x 512 corpus.

Isolates the index scan (no text tower) so kernel changes can be compared
against the HBM speed-of-light floor. The scanned matrix is the whole cost:
    f32   4.10 GB  -> ~5.0 ms floor at v5e's ~820 GB/s
    bf16  2.05 GB  -> ~2.5 ms
    int8  1.02 GB  -> ~1.25 ms (+8 MB scales)

Methodology (remote-tunnel safe, see CLAUDE.md): every dispatch gets a
DISTINCT query (identical dispatches are memoized by the runtime), all
iterations are enqueued before any result is touched, and completion is
forced by a checksum value fetch — ``block_until_ready`` is not a reliable
sync on this transport.

Knobs are read at module import, so sweeps run one process per config:
    VQT_BLOCK_ROWS=4096 VQT_SELECT_BLOCKS=8 python benchmarks/scan_bench.py \
        --mode f32 --rows 2000896

Prints one JSON line per mode on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="f32",
                    help="comma list: f32,bf16,int8 (exact scans), "
                         "cand16,cand8 (fused candidate stage, permuted "
                         "mirror, deep fetch)")
    ap.add_argument("--fetch", type=int, default=256,
                    help="candidate fetch depth for cand16/cand8")
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--batch", type=int, default=1,
                    help="queries per dispatch (1 = single-stream path)")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.ops.quantize import quantize_rows
    from video_quierer_tpu.ops.topk import (
        BLOCK_ROWS,
        SELECT_BLOCKS,
        candidate_topk,
        candidate_topk_int8,
        cosine_topk,
        cosine_topk_int8,
    )

    n_pad = -(-args.rows // BLOCK_ROWS) * BLOCK_ROWS
    log(f"backend={jax.default_backend()} rows={args.rows} pad={n_pad} "
        f"B={args.batch} BLOCK_ROWS={BLOCK_ROWS} "
        f"SELECT_BLOCKS={SELECT_BLOCKS}")

    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n_pad, 512), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    emb.block_until_ready()

    qkey = jax.random.PRNGKey(1)
    qs = jax.random.normal(qkey, (args.iters, args.batch, 512), jnp.float32)
    qs = qs / jnp.linalg.norm(qs, axis=-1, keepdims=True)
    # distinct DEVICE-resident queries up front: shipping them inside the
    # timed loop would measure the tunnel's H2D RTT, and the eager wrapper
    # ops around cosine_topk would add per-iteration dispatches — one jit,
    # one dispatch per iteration, is the only honest shape on this link.
    q_dev = [q[0] for q in jnp.split(qs, args.iters)]  # each [B, 512]
    for q in q_dev:
        q.block_until_ready()

    valid = args.rows
    results = {}
    # matrices are jit ARGUMENTS (a closure-captured 4 GB array becomes a
    # jaxpr constant — pathological compile), partially applied per mode.
    f_scan = jax.jit(lambda m, q: cosine_topk(m, q, valid, k=args.k))
    i8_scan = jax.jit(lambda c, s, q: cosine_topk_int8(c, s, q, valid,
                                                       k=args.k))
    # fused candidate stage (the engine's bf16/int8 serving pre-filter):
    # deep fetch over the PERMUTED mirror, exactly the index layout
    fetch = args.fetch
    c_scan = jax.jit(lambda m, p, q: candidate_topk(m, q, valid, k=fetch,
                                                    perm=p))
    c8_scan = jax.jit(lambda c, s, p, q: candidate_topk_int8(
        c, s, q, valid, k=fetch, perm=p))
    perm = None
    if {"cand16", "cand8"} & set(args.modes.split(",")):
        pkey = jax.random.PRNGKey(7)
        perm = jax.random.permutation(pkey, n_pad).astype(jnp.int32)
        perm.block_until_ready()
    for mode in args.modes.split(","):
        if mode == "f32":
            run = lambda q: f_scan(emb, q)
            nbytes = n_pad * 512 * 4
        elif mode == "bf16":
            mat16 = emb.astype(jnp.bfloat16)
            mat16.block_until_ready()
            run = lambda q: f_scan(mat16, q)
            nbytes = n_pad * 512 * 2
        elif mode == "int8":
            codes, scales = quantize_rows(emb)
            codes.block_until_ready()
            run = lambda q: i8_scan(codes, scales, q)
            nbytes = n_pad * 512 + n_pad * 4
        elif mode == "cand16":
            mat16 = emb.astype(jnp.bfloat16)
            mat16.block_until_ready()
            run = lambda q: c_scan(mat16, perm, q)
            nbytes = n_pad * (512 * 2 + 4)
        elif mode == "cand8":
            codes, scales = quantize_rows(emb)
            codes.block_until_ready()
            run = lambda q: c8_scan(codes, scales, perm, q)
            nbytes = n_pad * (512 + 4 + 4)
        else:
            raise SystemExit(f"unknown mode {mode}")

        log(f"[{mode}] compiling...")
        t0 = time.time()
        v, i = run(q_dev[0])
        _ = float(np.asarray(v).sum())  # real sync (value fetch)
        log(f"[{mode}] compiled+warm in {time.time() - t0:.1f}s")

        # settle pass: the first timed loop after a fresh compile has
        # measured 3-6x steady state on this runtime; run the full loop
        # once untimed before measuring.
        _ = float(sum(run(q_dev[j])[0].sum() for j in range(args.iters)))

        t0 = time.time()
        outs = [run(q_dev[j]) for j in range(args.iters)]
        # checksum stays ON DEVICE until one final scalar fetch: a
        # np.asarray per output would serialize a ~25 ms host-fetch RTT
        # per iteration and measure the tunnel, not the kernel (that
        # exact mistake produced a flat "25 ms floor" across every
        # dtype/engine/block-size config before this was fixed).
        checksum = float(sum(o[0].sum() for o in outs))
        wall = time.time() - t0
        per_disp_ms = wall / args.iters * 1000.0
        per_q_ms = per_disp_ms / args.batch
        gbps = nbytes / (per_disp_ms / 1000.0) / 1e9
        assert np.isfinite(checksum)
        v0 = np.asarray(outs[0][0])
        assert (np.diff(v0.reshape(args.batch, -1), axis=-1) <= 1e-6).all()
        log(f"[{mode}] {per_disp_ms:.2f} ms/dispatch, {per_q_ms:.2f} ms/q, "
            f"{gbps:.0f} GB/s effective [checksum {checksum:.2f}]")
        results[mode] = {"ms_per_dispatch": round(per_disp_ms, 3),
                         "ms_per_query": round(per_q_ms, 3),
                         "effective_gbps": round(gbps, 1)}

    print(json.dumps({"block_rows": BLOCK_ROWS,
                      "select_blocks": SELECT_BLOCKS,
                      "batch": args.batch, "rows": args.rows,
                      "results": results}))


if __name__ == "__main__":
    main()
