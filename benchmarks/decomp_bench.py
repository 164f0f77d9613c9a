#!/usr/bin/env python3
"""Stage decomposition of the coalesced serving batch on real hardware.

Splits the headline dispatch (bench.py: text encode + fused candidate
scan + exact f32 re-rank at a 2M-row corpus) into its stages and times
each in isolation at the serving coalesce widths, so per-batch cost can
be attributed: is the wall the matmul scan, the text tower, the re-rank
gather, or dispatch overhead?

Methodology is the honest tunnel harness (CLAUDE.md): distinct
pre-staged device inputs, every dispatch enqueued before any result is
touched, one untimed settle pass after compile, completion forced by a
single device-side checksum fetch.

Usage:  python benchmarks/decomp_bench.py [--widths 64,256] [--batches 6]

Prints one line per (width, stage): ms/batch and ms/query.
"""

import argparse
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="64,256")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--rows", type=int, default=2_000_000)
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]

    import numpy as np
    import jax
    import jax.numpy as jnp

    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.models.clip.tokenizer import load_tokenizer
    from video_quierer_tpu.models.clip.embedder import trim_text_ids
    from video_quierer_tpu.ops.quantize import quantize_rows
    from video_quierer_tpu.ops.topk import (
        BLOCK_ROWS, CAND_BLOCK_ROWS, candidate_topk, candidate_topk_int8)

    log(f"backend: {jax.default_backend()}")
    # align to the index's capacity granularity so the fused candidate
    # kernel engages (ops/topk.py:_fused_usable)
    import math
    gran = math.lcm(BLOCK_ROWS, CAND_BLOCK_ROWS)
    n_pad = -(-args.rows // gran) * gran
    k, fetch = 10, 256

    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n_pad, 512), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    perm = jax.random.permutation(jax.random.PRNGKey(7),
                                  n_pad).astype(jnp.int32)
    emb16 = jnp.take(emb, perm, axis=0).astype(jnp.bfloat16)
    codes_h, scales_h = quantize_rows(emb)
    codes = jnp.take(codes_h, perm, axis=0)
    scales = jnp.take(scales_h, perm, axis=0)
    del codes_h, scales_h
    for a in (emb16, codes, scales, perm):
        a.block_until_ready()
    log("corpus staged")

    cfg = vit_b_32()
    model = CLIP(cfg, dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_params(model, seed=0))
    tokenizer = load_tokenizer()
    valid = jnp.int32(args.rows)

    def _encode(params, ids):
        feats = model.apply({"params": params}, ids,
                            method=CLIP.encode_text)
        return feats / (jnp.linalg.norm(feats, axis=-1,
                                        keepdims=True) + 1e-10)

    def _rerank(emb32, q, cand):
        rows = jnp.take(emb32, jnp.clip(cand, 0, n_pad - 1), axis=0)
        exact = jnp.einsum("bfd,bd->bf", rows, q,
                           preferred_element_type=jnp.float32)
        exact = jnp.where(cand < valid, exact, -jnp.inf)
        vals, pos = jax.lax.top_k(exact, k)
        return vals, jnp.take_along_axis(cand, pos, axis=-1)

    stages_by_width = {}
    for width in widths:
        texts = [f"w{width} batch {b} scene {i} with people"
                 for b in range(args.batches) for i in range(width)]
        tids = [tokenizer(t) for t in texts]
        ids = [jnp.asarray(trim_text_ids(np.concatenate(
            tids[b * width:(b + 1) * width])))
            for b in range(args.batches)]
        qs = [jax.random.normal(jax.random.PRNGKey(100 + i), (width, 512),
                                jnp.float32) for i in range(args.batches)]
        qs = [q / jnp.linalg.norm(q, axis=-1, keepdims=True) for q in qs]
        cands = [jax.random.randint(jax.random.PRNGKey(200 + i), (width, fetch),
                                    0, args.rows, jnp.int32)
                 for i in range(args.batches)]
        for a in ids + qs + cands:
            a.block_until_ready()
        log(f"[{width}] ids shape {ids[0].shape} (trimmed seq bucket)")

        # every big array rides as an ARGUMENT — a jit closure constant
        # re-embeds/re-uploads it per executable build (CLAUDE.md)
        enc_raw = jax.jit(lambda p, i: _encode(p, i))
        encode_j = lambda i: enc_raw(params, i)
        s16_raw = jax.jit(lambda e, p, q: candidate_topk(
            e, q, valid, k=fetch, perm=p))
        scan16_j = lambda q: s16_raw(emb16, perm, q)
        s8_raw = jax.jit(lambda c, s, p, q: candidate_topk_int8(
            c, s, q, valid, k=fetch, perm=p))
        scan8_j = lambda q: s8_raw(codes, scales, perm, q)
        rr_raw = jax.jit(lambda e, q, c: _rerank(e, q, c))
        rerank_j = lambda q, c: rr_raw(emb, q, c)

        @jax.jit
        def full16_raw(p, e32, e16, pm, i):
            q = _encode(p, i)
            _, cand = candidate_topk(e16, q, valid, k=fetch, perm=pm)
            return _rerank(e32, q, cand)

        @jax.jit
        def full8_raw(p, e32, c8, s8, pm, i):
            q = _encode(p, i)
            _, cand = candidate_topk_int8(c8, s8, q, valid,
                                          k=fetch, perm=pm)
            return _rerank(e32, q, cand)

        stages = [
            ("encode", encode_j, ids, lambda o: o.sum()),
            ("scan-bf16", scan16_j, qs, lambda o: o[0].sum()),
            ("scan-int8", scan8_j, qs, lambda o: o[0].sum()),
            ("rerank", rerank_j,
             list(zip(qs, cands)), lambda o: o[0].sum()),
            ("full-bf16",
             lambda i: full16_raw(params, emb, emb16, perm, i),
             ids, lambda o: o[0].sum()),
            ("full-int8",
             lambda i: full8_raw(params, emb, codes, scales, perm, i),
             ids, lambda o: o[0].sum()),
        ]
        rows = {}
        for name, fn, inputs, chk in stages:
            call = (lambda fn: lambda x: fn(*x) if isinstance(x, tuple)
                    else fn(x))(fn)
            t0 = time.time()
            _ = float(jnp.sum(chk(call(inputs[0]))))
            log(f"[{width}] {name}: compiled in {time.time() - t0:.0f}s")
            _ = float(sum(jnp.sum(chk(call(x))) for x in inputs))  # settle
            # two timed loops, keep the second: the first loop over a
            # fresh executable reads 1.5-6x steady state on this
            # runtime even after the settle pass
            for rep in (1, 2):
                t0 = time.time()
                outs = [call(x) for x in inputs]
                checksum = float(sum(jnp.sum(chk(o)) for o in outs))
                wall = time.time() - t0
                ms_b = wall / len(inputs) * 1000.0
                assert np.isfinite(checksum)
                log(f"[{width}] {name}: rep{rep} {ms_b:.2f} ms/batch "
                    f"({ms_b / width * 1000:.1f} us/q) [chk {checksum:.1f}]")
            rows[name] = ms_b
        stages_by_width[width] = rows

    print("width stage ms/batch us/query")
    for width, rows in stages_by_width.items():
        for name, ms_b in rows.items():
            print(f"{width} {name} {ms_b:.2f} {ms_b / width * 1000:.1f}")


if __name__ == "__main__":
    main()
