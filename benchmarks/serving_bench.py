#!/usr/bin/env python3
"""Engine-true coalesced serving throughput on real hardware.

Unlike bench.py — which re-creates the serving dispatch from the ops
layer to isolate device cost — this drives the ACTUAL product path:
``VideoSearchEngine.search_coalesced`` from N concurrent threads, i.e.
request futures → ``SearchCoalescer`` window/flush → tokenizer →
``_search_batch_fused`` → ``DeviceVideoIndex.search_batch_fused``
(fused text encode + candidate scan + re-rank) → per-request result
formatting. What it measures therefore includes every host-side cost a
live server pays per request: Python thread wake-ups, BPE tokenization,
coalescer bookkeeping, result dict building.

On a production TPU host (dozens of cores) the host side scales;
on this 1-core measurement VM the tokenizer+threads are the wall, so
the figure here is a LOWER bound on the engine's capability — the
device-side ceiling is bench.py's number.

    python benchmarks/serving_bench.py [--rows 2000000] [--threads 64]
                                       [--seconds 20] [--width 256]

Prints one JSON line on stdout; diagnostics to stderr.
"""

import argparse
import json
import os
import sys
import threading
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--threads", default="64",
                    help="comma list; each count measures one phase "
                         "against the same warm engine")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=131072)
    ap.add_argument("--resolvers", default="",
                    help="comma list of VQT_COALESCE_RESOLVERS pool "
                         "sizes to A/B within this one warm process "
                         "(the coalescer is closed and re-created per "
                         "size; empty = engine default)")
    args = ap.parse_args()
    thread_counts = [int(t) for t in str(args.threads).split(",")]
    resolver_counts = ([int(r) for r in str(args.resolvers).split(",")]
                       if args.resolvers else [None])

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.engine.config import EngineConfig
    from video_quierer_tpu.engine.system import VideoSearchEngine

    log(f"backend: {jax.default_backend()}")
    cfg = EngineConfig()
    cfg.coalesce_width = args.width
    cfg.api.cache_search = False
    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        eng = VideoSearchEngine(videos_dir=tmp, config=cfg)

        # Populate the index with a device-generated corpus (the host
        # fetch is the honest ingest-side cost of synthetic rows; real
        # ingest produces these rows from the embed pipeline).
        log(f"populating {args.rows} rows...")
        t0 = time.time()
        done = 0
        ci = 0
        while done < args.rows:
            n = min(args.chunk, args.rows - done)
            x = jax.random.normal(jax.random.PRNGKey(ci), (n, 512),
                                  jnp.float32)
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
            rows = np.asarray(x)
            eng.index.add_batch(rows, f"synthetic_{ci}.mp4",
                                [float(t) for t in range(n)])
            done += n
            ci += 1
            if ci % 4 == 0:
                log(f"  {done}/{args.rows} rows ({time.time()-t0:.0f}s)")
        log(f"populated in {time.time()-t0:.0f}s")

        # one search builds device mirrors + compiles the narrow path;
        # a wide burst compiles the coalesced buckets
        t0 = time.time()
        eng.search("warm up the mirrors", k=args.k, use_cache=False)
        log(f"first search (mirror build + compile): {time.time()-t0:.0f}s")
        from video_quierer_tpu.models.clip.embedder import TEXT_BUCKETS
        for b in TEXT_BUCKETS[1:]:
            if b > args.width:
                break
            t0 = time.time()
            eng.search_batch([f"warm bucket {b} {i}" for i in range(b)],
                             k=args.k)
            log(f"warm bucket {b}: {time.time()-t0:.0f}s")

        from video_quierer_tpu.utils import stageprof

        def run_phase(n_threads: int) -> dict:
            stop = threading.Event()
            counts = [0] * n_threads
            lats = []
            errors = []

            def worker(tid: int) -> None:
                i = 0
                while not stop.is_set():
                    q = (f"t{n_threads} thread {tid} query {i} "
                         "people walking on a beach")
                    try:
                        t1 = time.time()
                        res = eng.search_coalesced(q, k=args.k,
                                                   use_cache=False)
                        if i % 8 == 0:
                            lats.append(time.time() - t1)
                        assert res, "empty result"
                    except Exception as e:   # pragma: no cover
                        errors.append(repr(e))
                        break
                    counts[tid] = i = i + 1

            # per-phase batch-size stats: slice the histogram tail this
            # phase appends (bench-only peek at the metrics deque)
            hist = eng.metrics._histograms.get("coalesced_batch_size")
            base_len = len(hist) if hist is not None else 0
            threads = [threading.Thread(target=worker, args=(t,),
                                        daemon=True)
                       for t in range(n_threads)]
            for t in threads:
                t.start()
            time.sleep(5.0)                       # settle/compile tail
            base = sum(counts)
            prof0 = stageprof.snapshot()
            t0 = time.time()
            time.sleep(args.seconds)
            total = sum(counts) - base
            wall = time.time() - t0
            prof1 = stageprof.snapshot()
            stop.set()
            for t in threads:
                t.join(timeout=10)
            tput = total / wall
            if errors:
                log(f"errors: {errors[:3]}")
            hist = eng.metrics._histograms.get("coalesced_batch_size")
            sizes = np.asarray(list(hist)[base_len:]) if hist else None
            batch = {}
            if sizes is not None and sizes.size:
                batch = {"mean": round(float(sizes.mean()), 2),
                         "p50": round(float(np.percentile(sizes, 50)), 2),
                         "p95": round(float(np.percentile(sizes, 95)), 2)}
            lat_ms = {}
            if lats:
                la = np.asarray(lats) * 1000.0
                lat_ms = {"p50": round(float(np.percentile(la, 50)), 1),
                          "p95": round(float(np.percentile(la, 95)), 1)}
            phase = {"threads": n_threads,
                     "searches_per_s": round(tput, 1),
                     "client_latency_ms": lat_ms,
                     "coalesce_batch": batch,
                     "errors": len(errors)}
            if stageprof.ENABLED and total:
                # per-stage host cost, µs per QUERY (stages run once per
                # flush; the delta divides by queries served this phase)
                stages = {}
                for name, (c1, s1) in prof1.items():
                    c0, s0 = prof0.get(name, (0, 0.0))
                    if c1 > c0:
                        stages[name] = {
                            "us_per_query": round(
                                (s1 - s0) * 1e6 / total, 1),
                            "ms_per_flush": round(
                                (s1 - s0) * 1e3 / (c1 - c0), 2)}
                phase["host_profile"] = stages
            log(f"phase {phase}")
            return phase

        phases = []
        for n_res in resolver_counts:
            # A/B resolver-pool sizes inside ONE warm process: close the
            # old coalescer (its executables are engine-owned and stay
            # warm) and let search_coalesced lazily build a new one that
            # reads the env at construction
            if n_res is not None:
                if eng._coalescer is not None:
                    eng._coalescer.close()
                    eng._coalescer = None
                os.environ["VQT_COALESCE_RESOLVERS"] = str(n_res)
                log(f"--- resolvers={n_res} ---")
            for n in thread_counts:
                phase = run_phase(n)
                if n_res is not None:
                    phase["resolvers"] = n_res
                phases.append(phase)
        best = max(phases, key=lambda p: p["searches_per_s"])
        print(json.dumps({
            "metric": "engine_true_coalesced_serving",
            "rows": args.rows,
            "width": args.width,
            "searches_per_s": best["searches_per_s"],
            "best_threads": best["threads"],
            "phases": phases,
            "note": "full product path incl. host-side per-request costs "
                    "on a 1-core VM; device ceiling is bench.py",
        }))


if __name__ == "__main__":
    main()
