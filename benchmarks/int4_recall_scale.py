#!/usr/bin/env python3
"""int4/int8 candidate recall vs fetch depth AT CORPUS SCALE.

The northstar run (results_northstar_10m_r5.json) measured recall@10 =
0.892 at 10M rows with the int4 tier's default doubled fetch-512 — a
bar that recall_bench had only validated at 100k rows. The loss is
entirely in the CANDIDATE stage (device-bf16 and exact-host re-rank
read identical recall), so candidate-SET recall against true top-k IS
engine recall (the exact re-rank orders whatever the candidates
contain correctly). This probe measures exactly that, at full scale,
for a fetch sweep — the data the fetch policy needs.

Corpus: clustered rows (the realistic regime) generated ON DEVICE in
chunks with i.i.d. random cluster assignment — statistically identical
to the permuted mirror's shuffled arrangement, so perm = identity and
nothing big ever crosses the 15 MB/s tunnel. Ground truth: per-chunk
exact f32 top-64 on device (the f32 chunk is discarded after), merged
on host. Scan timings: settle + two timed loops, on-device checksum,
second loop reported.

    python benchmarks/int4_recall_scale.py [--rows 10000000]
        [--queries 256] [--int4-fetch 256,512,1024]
        [--int8-fetch 128,256,512]

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
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--qnoise", type=float, default=0.03)
    ap.add_argument("--int4-fetch", default="256,512,1024")
    ap.add_argument("--int8-fetch", default="128,256,512")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.ops.quantize import (quantize_rows,
                                                quantize_rows_int4)
    from video_quierer_tpu.ops.topk import (BLOCK_ROWS, CAND_BLOCK_ROWS,
                                            candidate_topk_int4,
                                            candidate_topk_int8)

    log(f"backend: {jax.default_backend()}")
    n, d, q_n = args.rows, 512, args.queries
    gran = math.lcm(BLOCK_ROWS, CAND_BLOCK_ROWS)
    n_pad = -(-n // gran) * gran
    n_clusters = max(64, n // 2000)
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
    centers_dev = jnp.asarray(centers)

    @jax.jit
    def gen_chunk(seed):
        m = args.chunk
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        assign = jax.random.randint(k1, (m,), 0, n_clusters)
        rows = (jnp.take(centers_dev, assign, axis=0)
                + args.noise * jax.random.normal(k2, (m, d)))
        return rows / jnp.linalg.norm(rows, axis=-1, keepdims=True)

    @jax.jit
    def chunk_truth(rows, qt, base):
        # exact f32 scores -> per-chunk top-64 (score desc, row asc)
        sc = jnp.dot(qt, rows.T, preferred_element_type=jnp.float32)
        v, i = jax.lax.top_k(sc, 64)
        return v, i + base

    codes4 = jnp.zeros((n_pad, d // 2), jnp.int8)
    scales4 = jnp.zeros((n_pad, 1), jnp.float32)
    codes8 = jnp.zeros((n_pad, d), jnp.int8)
    scales8 = jnp.zeros((n_pad, 1), jnp.float32)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def place4(buf, sbuf, rows, lo):
        c, s = quantize_rows_int4(rows)
        return (jax.lax.dynamic_update_slice(buf, c, (lo, 0)),
                jax.lax.dynamic_update_slice(sbuf, s, (lo, 0)))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def place8(buf, sbuf, rows, lo):
        c, s = quantize_rows(rows)
        return (jax.lax.dynamic_update_slice(buf, c, (lo, 0)),
                jax.lax.dynamic_update_slice(sbuf, s, (lo, 0)))

    # queries: perturb real rows from chunk 0
    first = gen_chunk(jnp.int32(1))
    sample = np.asarray(first[:q_n])
    queries = sample + args.qnoise * rng.standard_normal(
        (q_n, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    qt_dev = jnp.asarray(queries)

    assert n % args.chunk == 0, "rows must divide by chunk"
    t0 = time.time()
    top_v = np.full((q_n, 64), -np.inf, np.float32)
    top_i = np.zeros((q_n, 64), np.int64)
    lo = 0
    seed = 1
    while lo < n:
        m = args.chunk
        rows = first if seed == 1 else gen_chunk(jnp.int32(seed))
        v, i = chunk_truth(rows, qt_dev, jnp.int64(lo))
        codes4, scales4 = place4(codes4, scales4, rows, jnp.int32(lo))
        codes8, scales8 = place8(codes8, scales8, rows, jnp.int32(lo))
        v, i = np.asarray(v), np.asarray(i)
        for j in range(q_n):
            cs = np.concatenate([top_v[j], v[j]])
            cr = np.concatenate([top_i[j], i[j]])
            o = np.lexsort((cr, -cs))[:64]
            top_v[j], top_i[j] = cs[o], cr[o]
        lo += m
        seed += 1
        if seed % 3 == 0:
            log(f"  {lo}/{n} rows ({time.time() - t0:.0f}s)")
    log(f"corpus + ground truth in {time.time() - t0:.0f}s")
    truth = [set(r[: args.k].tolist()) for r in top_i]
    perm = jnp.arange(n_pad, dtype=jnp.int32)

    out = {"rows": n, "k": args.k, "queries": q_n,
           "noise": args.noise, "qnoise": args.qnoise,
           "int4": {}, "int8": {}}

    def measure(name, scan_fn, fetches, store):
        for fetch in fetches:
            fn = lambda: scan_fn(fetch)
            _, idxs = fn()
            _ = float(idxs.sum())                    # warm/compile
            _ = float(fn()[1].sum())                 # settle
            for rep in (1, 2):
                t0 = time.time()
                _v, idxs = fn()
                chk = float(idxs.sum())
                wall = time.time() - t0
                assert np.isfinite(chk)
            ids = np.asarray(idxs)
            hits = sum(len(set(ids[j][ids[j] < n].tolist()) & truth[j])
                       for j in range(q_n))
            r = hits / (q_n * args.k)
            store[str(fetch)] = {
                "candidate_recall_at_10": round(r, 4),
                "scan_ms_per_batch": round(wall * 1000, 2),
                "scan_ms_per_q": round(wall * 1000 / q_n, 4)}
            log(f"{name} fetch={fetch}: recall@10 {r:.4f} "
                f"scan {wall * 1000:.1f} ms/{q_n}-batch")

    measure("int4", lambda f: candidate_topk_int4(
        codes4, scales4, qt_dev, jnp.int32(n), k=f, perm=perm,
        prefix=True, live=n),
        [int(x) for x in args.int4_fetch.split(",")], out["int4"])
    measure("int8", lambda f: candidate_topk_int8(
        codes8, scales8, qt_dev, jnp.int32(n), k=f, perm=perm,
        prefix=True, live=n),
        [int(x) for x in args.int8_fetch.split(",")], out["int8"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
