#!/usr/bin/env python3
"""Headline benchmark: end-to-end text-search throughput over a
10k-video-scale corpus on one TPU chip.

Measures the full serving path per query — CLIP text-tower encode (77
tokens) + fused cosine matmul/top-k scan over a 2,000,000 x 512 embedding
matrix (= 10k videos x 200 frames at 'high' sampling) resident in HBM —
pipelined over QUERIES requests, the way a loaded server runs.

Baseline: the reference claims "<100 ms for most queries" and "100+
searches/sec" with the corpus held as Python lists that are re-stacked
per query (np.vstack, video_search_overhaul.py:46) — on this corpus size
the reference's own path is seconds per query. ``vs_baseline`` is measured
against the stronger claim: 100 searches/sec.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.models.clip.tokenizer import load_tokenizer
    from video_quierer_tpu.ops.topk import BLOCK_ROWS, cosine_topk

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    n_videos, frames_per_video = 10_000, 200
    n_rows = n_videos * frames_per_video            # 2.0 M frames
    n_pad = -(-n_rows // BLOCK_ROWS) * BLOCK_ROWS
    k = 10
    # Methodology note (remote-TPU tunnel): synchronous per-query timing
    # here measures the tunnel's RTT (~40-70 ms), not the device — and
    # block_until_ready is not a reliable sync on this backend (it has
    # returned in 0.3 ms for a scan whose HBM floor is ~5 ms). So the
    # bench measures SUSTAINED throughput the way a loaded server runs:
    # enqueue all fused queries (distinct inputs — identical dispatches
    # get memoized), then force completion of every result via a value
    # fetch (checksum), and divide.
    queries = 64
    # enough batches in flight that per-dispatch tunnel RTT amortizes
    # (2 batches measured 213 ms/batch; 12 pipelined measure ~20)
    coalesce_batches = 8

    # Corpus generated directly on device (4 GB in HBM) — unit-normalized
    # rows, the layout the engine serves from.
    log(f"building corpus {n_pad}x512 in HBM...")
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n_pad, 512), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    emb.block_until_ready()
    log(f"corpus ready in {time.time() - t0:.1f}s")

    # CLIP text tower (seeded weights — throughput is weight-agnostic)
    cfg = vit_b_32()
    model = CLIP(cfg)
    params = init_params(model, seed=0)
    tokenizer = load_tokenizer()

    # The engine's fused serving path (engine/system.py:_search_fused /
    # DeviceVideoIndex.search_batch_fused): text tower + scan in ONE
    # jitted dispatch per request.
    @jax.jit
    def fused_search(params, ids, emb, valid):
        feats = model.apply({"params": params}, ids,
                            method=CLIP.encode_text)
        q = feats / (jnp.linalg.norm(feats, axis=-1,
                                     keepdims=True) + 1e-10)
        return cosine_topk(emb, q, valid, k=k)

    def one_search(ids):
        return fused_search(params, ids, emb, n_rows)

    def batch_search(ids_batch):
        return fused_search(params, ids_batch, emb, n_rows)

    # tokenize all queries up front (host-side, microseconds each)
    texts = [f"a video of scene number {i} with people" for i in
             range(queries)]
    all_ids = [jnp.asarray(tokenizer(t)) for t in texts]
    coalesce = 16  # the server's enhanced_mode coalescer batches like this
    # distinct texts per batch slot (reusing the single-stream ids plus
    # shifted copies keeps inputs distinct without more tokenization)
    batch_texts = [f"batch {b} scene {i} with people"
                   for b in range(coalesce_batches) for i in range(coalesce)]
    batch_ids = [jnp.asarray(tokenizer(t)) for t in batch_texts]
    batches = [jnp.concatenate(batch_ids[b * coalesce:(b + 1) * coalesce])
               for b in range(coalesce_batches)]

    log("compiling (text tower + fused scan, single + batched)...")
    t0 = time.time()
    vals, idxs = one_search(all_ids[0])
    vals.block_until_ready()
    bv, bi = batch_search(batches[0])
    bv.block_until_ready()
    log(f"compiled in {time.time() - t0:.1f}s")

    # warm the single-query executable with a REAL sync (value fetch)
    _ = np.asarray(one_search(all_ids[0])[0])

    # (a) pipelined single-query throughput: every request its own fused
    # dispatch (the engine's per-request serving path), all in flight,
    # forced complete by the checksum fetch.
    log(f"running {queries} pipelined end-to-end searches...")
    t0 = time.time()
    outs = [one_search(ids) for ids in all_ids]
    checksum = float(sum(o[0].sum() for o in outs))
    wall = time.time() - t0
    per_query_ms = wall / queries * 1000.0
    single_tput = queries / wall

    # sanity: results are real top-k
    v = np.asarray(outs[0][0])
    assert np.isfinite(v).all() and (np.diff(v) <= 1e-6).all()
    assert np.isfinite(checksum)
    log(f"pipelined single-query: {per_query_ms:.2f} ms/query, "
        f"{single_tput:.1f} searches/s over {n_rows} frames "
        f"[checksum {checksum:.1f}]")

    # (b) coalesced serving throughput (the API's enhanced_mode path:
    # concurrent requests share one text-encode + scan device pass)
    _ = np.asarray(batch_search(batches[0])[0])  # warm + real sync
    t0 = time.time()
    outs_b = [batch_search(b) for b in batches]
    checksum_b = float(sum(o[0].sum() for o in outs_b))
    wall_b = time.time() - t0
    coalesced_tput = len(batches) * coalesce / wall_b
    assert np.isfinite(checksum_b)
    log(f"coalesced x{coalesce}: "
        f"{wall_b / len(batches) * 1000:.2f} ms/batch, "
        f"{coalesced_tput:.0f} searches/s")

    best = max(single_tput, coalesced_tput)
    mode = ("16-way coalesced" if coalesced_tput >= single_tput
            else "per-request fused dispatch")
    print(json.dumps({
        "metric": "e2e_text_search_throughput_10kvideo_corpus",
        "value": round(best, 1),
        "unit": "searches/sec sustained (CLIP text encode + exact "
                "2M-frame scan fused per dispatch, 1 chip, completion-"
                f"forced; best mode: {mode}; per-query "
                f"{per_query_ms:.2f} ms pipelined)",
        "vs_baseline": round(best / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
