#!/usr/bin/env python3
"""Recall / latency table across index modes: exact f32, bf16, int8, int4
(+re-rank), IVF at several nprobe settings.

Runs on CPU or TPU. Uses a clustered synthetic corpus (video frames are
temporally correlated, so clustered is the realistic regime for IVF).

    python benchmarks/recall_bench.py [--rows 100000] [--queries 20]
"""

import argparse
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=100_000)
    parser.add_argument("--queries", type=int, default=20)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--nlist", type=int, default=128)
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.evaluation import exact_topk_ids, recall_at_k
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    from video_quierer_tpu.index.ivf import IVFIndex
    from video_quierer_tpu.ops.topk import cosine_topk

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    n_clusters = max(16, args.rows // 2000)
    centers = rng.standard_normal((n_clusters, 512)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    per = args.rows // n_clusters
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + 0.15 * rng.standard_normal(
            (per, 512)).astype(np.float32)
        rows.append(pts / np.linalg.norm(pts, axis=-1, keepdims=True))
    emb = np.concatenate(rows)
    n = emb.shape[0]

    q_idx = rng.integers(0, n, args.queries)
    queries = emb[q_idx] + 0.03 * rng.standard_normal(
        (args.queries, 512)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)

    truth = exact_topk_ids(emb, queries, args.k)

    def timed(fn):
        fn()  # warm/compile
        t0 = time.perf_counter()
        ids = fn()
        return (time.perf_counter() - t0) * 1000, ids

    results = []

    # exact f32 / bf16 / int8 via DeviceVideoIndex modes
    for mode in ("float32", "bfloat16", "int8", "int4"):
        idx = DeviceVideoIndex(device_dtype=mode)
        idx.add_batch(emb, "bench.mp4", np.arange(n, dtype=float))

        def run(idx=idx):
            out = idx.search_batch(queries, k=args.k)
            return np.asarray([[r["frame_id"] for r in row]
                               + [-1] * (args.k - len(row))
                               for row in out])
        ms, ids = timed(run)
        results.append((f"exact-{mode}", ms / args.queries,
                        recall_at_k(truth, ids)))

    # IVF at several probe depths
    ivf = IVFIndex(nlist=args.nlist, kmeans_iters=8, seed=0)
    t0 = time.perf_counter()
    ivf.build(emb)
    build_s = time.perf_counter() - t0
    for nprobe in (4, 16, 64):
        if nprobe > args.nlist:
            continue

        def run(nprobe=nprobe):
            _, ids = ivf.search(queries, k=args.k, nprobe=nprobe)
            return ids
        ms, ids = timed(run)
        results.append((f"ivf-nprobe{nprobe}/{args.nlist}",
                        ms / args.queries, recall_at_k(truth, ids)))

    print(f"\ncorpus: {n} rows x 512 ({n_clusters} clusters), "
          f"{args.queries} queries, k={args.k}; "
          f"IVF build {build_s:.1f}s")
    print(f"{'mode':<24} {'ms/query':>10} {'recall@' + str(args.k):>10}")
    for name, ms, rec in results:
        print(f"{name:<24} {ms:>10.2f} {rec:>10.3f}")


if __name__ == "__main__":
    main()
