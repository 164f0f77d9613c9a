#!/usr/bin/env python3
"""IVF latency-vs-recall curve — the ANN tier's reason to exist.

Round-4 VERDICT weak item 6: ``index/ivf.py`` is correctness-validated
but BASELINE.md carried no IVF performance row (the reference's dead
HNSW at least recorded search-time stats, src/indexes/hnsw.py:382-402).
This sweeps ``nprobe`` on a clustered corpus big enough that the probe
scan's traffic advantage is material, and records ms/q + recall@10
against the exact fused-candidate scan line measured in the SAME
session — the two numbers an operator needs to pick ``index.kind``.

Corpus: clustered (temporally-correlated video frames are the realistic
regime — k-means on uniform noise has no structure to find), built on
host because IVF's build packs cluster-contiguous tiles host-side; the
one-time corpus upload through this environment's 15 MB/s tunnel
dominates the recorded build wall and is called out as such (a PCIe
host pays seconds).

Latency is measured on BATCHED queries (width 64, distinct batches):
``IVFIndex.search`` materializes results to numpy per call, so a B=1
loop through this environment's tunnel measures the ~25-60 ms fetch
RTT, not the tier — batching amortizes the RTT to <1 ms/q and is how
the engine's coalescer drives the tier anyway. Settle pass + two timed
loops, second reported.

    python benchmarks/ivf_curve_bench.py [--rows 4000000]
        [--nprobes 4,8,16,32,64] [--width 64] [--batches 4]

One JSON line on stdout; diagnostics to stderr.
"""

import argparse
import json
import math
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nlist", type=int, default=0)
    ap.add_argument("--nprobes", default="4,8,16,32,64")
    ap.add_argument("--kmeans-iters", type=int, default=6)
    ap.add_argument("--noise", type=float, default=0.02,
                    help="per-dim cluster noise. At d=512 the noise "
                         "NORM is noise*sqrt(512): 0.15 (recall_bench's "
                         "candidate-stage convention) gives noise-norm "
                         "~3.4x the center - a near-uniform sphere NO "
                         "method can cluster (measured: kmeans 6 vs 15 "
                         "iters both read recall ~0.2-0.4). 0.02 gives "
                         "in-cluster cos ~0.9, the realistic "
                         "video-frame regime")
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.index.ivf import IVFIndex
    from video_quierer_tpu.ops.quantize import quantize_rows
    from video_quierer_tpu.ops.topk import (BLOCK_ROWS, CAND_BLOCK_ROWS,
                                            candidate_topk,
                                            candidate_topk_int8)

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    n, d = args.rows, 512
    nq = args.width * args.batches
    n_clusters = max(64, n // 2000)
    log(f"building clustered corpus {n}x{d} ({n_clusters} clusters) "
        "on host...")
    t0 = time.time()
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    emb = np.empty((n, d), np.float32)
    per = -(-n // n_clusters)
    for c in range(n_clusters):
        lo, hi = c * per, min((c + 1) * per, n)
        if hi <= lo:
            break
        pts = centers[c] + args.noise * rng.standard_normal(
            (hi - lo, d)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        emb[lo:hi] = pts
    log(f"corpus built in {time.time() - t0:.0f}s")

    q_idx = rng.integers(0, n, nq)
    queries = emb[q_idx] + (args.noise / 5.0) * rng.standard_normal(
        (nq, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    q_batches = [queries[i * args.width:(i + 1) * args.width]
                 for i in range(args.batches)]

    # exact ground truth: chunked host matmul (score desc, row asc)
    t0 = time.time()
    top_rows = np.zeros((nq, args.k), np.int64)
    top_scores = np.full((nq, args.k), -np.inf, np.float32)
    CH = 1_000_000
    for lo in range(0, n, CH):
        hi = min(lo + CH, n)
        s = emb[lo:hi] @ queries.T
        for j in range(nq):
            cs = np.concatenate([top_scores[j], s[:, j]])
            cr = np.concatenate([top_rows[j],
                                 np.arange(lo, hi, dtype=np.int64)])
            o = np.lexsort((cr, -cs))[: args.k]
            top_scores[j], top_rows[j] = cs[o], cr[o]
    log(f"ground truth in {time.time() - t0:.0f}s")
    truth = [set(r.tolist()) for r in top_rows]

    def recall(ids_all):
        hits = sum(len(set(ids_all[j].tolist()) & truth[j])
                   for j in range(nq))
        return hits / (nq * args.k)

    out = {"rows": n, "k": args.k, "queries": nq, "width": args.width,
           "ivf": {}, "exact": {}, "noise": args.noise}

    # ---- IVF tier ----
    ivf = IVFIndex(nlist=args.nlist or None,
                   kmeans_iters=args.kmeans_iters)
    t0 = time.time()
    ivf.build(emb)
    build_s = time.time() - t0
    st = ivf.stats()
    log(f"IVF built in {build_s:.0f}s (upload-dominated through the "
        f"tunnel): nlist={st['nlist']} tiles={st['tiles']} "
        f"padding={st['padding_pct']}%")
    out["ivf_build_s"] = round(build_s, 1)
    out["ivf_stats"] = {k2: st[k2] for k2 in
                        ("nlist", "tiles", "padding_pct",
                         "max_tiles_per_cluster")}

    for nprobe in [int(x) for x in args.nprobes.split(",")]:
        _ = ivf.search(q_batches[0], k=args.k, nprobe=nprobe)  # compile
        for b in q_batches:                                    # settle
            _ = ivf.search(b, k=args.k, nprobe=nprobe)
        for rep in (1, 2):
            t0 = time.time()
            outs = [ivf.search(b, k=args.k, nprobe=nprobe)
                    for b in q_batches]
            wall = time.time() - t0
        ms = wall / nq * 1000.0
        ids = np.concatenate([o[1] for o in outs])
        ids = np.where(ids < 0, n, ids)           # -1 misses never hit
        r = recall(ids)
        out["ivf"][str(nprobe)] = {"ms_per_q": round(ms, 3),
                                   "recall_at_10": round(r, 4)}
        log(f"IVF nprobe={nprobe}: {ms:.3f} ms/q recall@10 {r:.4f}")

    if args.skip_exact:
        print(json.dumps(out))
        return

    # ---- exact fused-candidate line (engine default), same session ---
    del ivf
    gran = math.lcm(BLOCK_ROWS, CAND_BLOCK_ROWS)
    n_pad = -(-n // gran) * gran
    perm_np = rng.permutation(n).astype(np.int32)
    perm_dev = jnp.concatenate(
        [jnp.asarray(perm_np), jnp.arange(n, n_pad, dtype=jnp.int32)])
    fetch = max(128, 4 * args.k)
    qb_dev = [jnp.asarray(b) for b in q_batches]
    for a in qb_dev:
        a.block_until_ready()

    def run_exact(name, scan):
        _ = scan(qb_dev[0])
        _ = float(sum(scan(b)[0].sum() for b in qb_dev))       # settle
        for rep in (1, 2):
            t0 = time.time()
            outs = [scan(b) for b in qb_dev]
            chk = float(sum(o[0].sum() for o in outs))         # on-dev
            wall = time.time() - t0
            assert np.isfinite(chk)
        ms = wall / nq * 1000.0
        # engine results = candidates + exact f32 host re-rank
        ids = []
        for bi, (_v, cand) in enumerate(outs):
            cb = np.asarray(cand)
            for j in range(cb.shape[0]):
                c = np.unique(cb[j][cb[j] < n])
                sc = emb[c] @ q_batches[bi][j]
                o = np.lexsort((c, -sc))[: args.k]
                ids.append(c[o])
        r = recall(np.stack(ids))
        out["exact"][name] = {"ms_per_q_scan": round(ms, 3),
                              "recall_at_10": round(r, 4)}
        log(f"exact {name}: {ms:.3f} ms/q (candidate scan) "
            f"recall@10 {r:.4f}")

    mirror = jnp.asarray(np.concatenate(
        [emb[perm_np], np.zeros((n_pad - n, d), np.float32)])
        .astype(jnp.bfloat16))
    run_exact("bf16", lambda q: candidate_topk(
        mirror, q, jnp.int32(n), k=fetch, perm=perm_dev, prefix=True,
        live=n))
    del mirror
    codes_h, scales_h = quantize_rows(jnp.asarray(emb))
    codes = jnp.concatenate(
        [jnp.take(codes_h, jnp.asarray(perm_np), axis=0),
         jnp.zeros((n_pad - n, d), jnp.int8)])
    scales = jnp.concatenate(
        [jnp.take(scales_h, jnp.asarray(perm_np), axis=0),
         jnp.zeros((n_pad - n, 1), jnp.float32)])
    del codes_h, scales_h
    run_exact("int8", lambda q: candidate_topk_int8(
        codes, scales, q, jnp.int32(n), k=fetch, perm=perm_dev,
        prefix=True, live=n))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
