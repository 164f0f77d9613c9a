#!/usr/bin/env python3
"""Stage decomposition of the coalesced serving batch on real hardware.

Splits the headline dispatch (bench.py: text encode + fused candidate
scan + exact f32 re-rank at a 2M-row corpus) into its stages and times
each at the serving widths, attributing per-batch cost: text tower,
bf16/int8 candidate scan, re-rank gather, or the full fused dispatch.

Methodology — the only one that yields device-true numbers on this
remote-tunnel runtime (CLAUDE.md): each stage runs R times over
DISTINCT stacked inputs INSIDE one jit (``lax.scan``), so per-dispatch
tunnel overhead amortizes to nothing and runtime memoization cannot
fire; big arrays ride as jit arguments (closure constants re-upload
through the tunnel); several distinct stacked inputs are enqueued
before ONE device-side checksum fetch; two timed loops run and the
second is reported (the first loop over a fresh executable reads
1.5-6x steady state even after a settle pass).

Usage:  python benchmarks/decomp_bench.py [--widths 64,256] [--r 8]
            [--stages encode,rerank,...] [--fetch 256]
            [--prec default|high|highest]

``--stages`` compiles and times only the named stages (each stage costs
~1-5 min of fresh-shape compile through the tunnel); ``--fetch`` sets
the candidate over-fetch depth (the re-rank gather width); ``--prec``
sets the re-rank einsum precision (the product re-rank uses HIGHEST —
index/device_index.py:_device_exact_rerank).

Prints one line per (width, stage): steady-state ms/batch and us/query.
Reference stage table for 2026-08-18 (B=256, 2M rows, one v5e):
encode 3.97 · scan-bf16 5.50 · scan-int8 4.84 · rerank 2.02 ·
full-bf16 9.95 · full-int8 9.27 ms/batch.
"""

import argparse
import math
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--widths", default="64,256")
    ap.add_argument("--r", type=int, default=8,
                    help="stage applications stacked inside one jit")
    ap.add_argument("--outer", type=int, default=4,
                    help="distinct stacked inputs enqueued per timing")
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--stages", default="",
                    help="comma list; empty = all")
    ap.add_argument("--fetch", type=int, default=256)
    ap.add_argument("--prec", default="default",
                    choices=("default", "high", "highest"))
    ap.add_argument("--layout", default="prefix",
                    choices=("prefix", "perm"),
                    help="mirror arrangement: live-prefix (the "
                         "single-device serving default; iota liveness, "
                         "VQT_CAND_ORIENT picks the matmul orientation) "
                         "or the fixed full-capacity permutation the "
                         "corpus meshes use")
    ap.add_argument("--orients", default="col",
                    help="comma list of prefix-kernel orientations to "
                         "sweep for the scan/full stages (col,row)")
    args = ap.parse_args()
    widths = [int(w) for w in args.widths.split(",")]
    only = set(s for s in args.stages.split(",") if s)
    orients = [o for o in args.orients.split(",") if o]

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.models.clip.tokenizer import load_tokenizer
    from video_quierer_tpu.models.clip.embedder import trim_text_ids
    from video_quierer_tpu.ops.quantize import (quantize_rows,
                                                quantize_rows_int4)
    from video_quierer_tpu.ops.topk import (
        BLOCK_ROWS, CAND_BLOCK_ROWS, candidate_topk, candidate_topk_int4,
        candidate_topk_int8)

    log(f"backend: {jax.default_backend()}")
    # align to the index's capacity granularity so the fused candidate
    # kernel engages (ops/topk.py:_fused_usable)
    gran = math.lcm(BLOCK_ROWS, CAND_BLOCK_ROWS)
    n_pad = -(-args.rows // gran) * gran
    k, fetch = 10, args.fetch
    prec = {"default": None, "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[args.prec]
    R, OUT = args.r, args.outer

    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n_pad, 512), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    prefix = args.layout == "prefix"
    if prefix:
        perm = jnp.concatenate([
            jax.random.permutation(jax.random.PRNGKey(7),
                                   args.rows).astype(jnp.int32),
            jnp.arange(args.rows, n_pad, dtype=jnp.int32)])
    else:
        perm = jax.random.permutation(jax.random.PRNGKey(7),
                                      n_pad).astype(jnp.int32)
    emb16 = jnp.take(emb, perm, axis=0).astype(jnp.bfloat16)
    codes_h, scales_h = quantize_rows(emb)
    codes = jnp.take(codes_h, perm, axis=0)
    scales = jnp.take(scales_h, perm, axis=0)
    del codes_h, scales_h
    codes4_h, scales4_h = quantize_rows_int4(emb)
    codes4 = jnp.take(codes4_h, perm, axis=0)
    scales4 = jnp.take(scales4_h, perm, axis=0)
    del codes4_h, scales4_h
    valid = jnp.int32(args.rows)
    for a in (emb16, codes, scales, codes4, scales4, perm):
        a.block_until_ready()
    log("corpus staged")

    cfg = vit_b_32()
    model = CLIP(cfg, dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_params(model, seed=0))
    tokenizer = load_tokenizer()

    def _encode(ids, p):
        feats = model.apply({"params": p}, ids, method=CLIP.encode_text)
        return feats / (jnp.linalg.norm(feats, axis=-1,
                                        keepdims=True) + 1e-10)

    import os as _os_probe

    def _rerank(q, cand, e32):
        if _os_probe.environ.get("VQT_RERANK_SORT") == "1":
            # probe: ascending-id gather order (page-locality experiment
            # for the XLA row gather); top-k below is order-independent
            order = jnp.argsort(cand, axis=-1)
            cand = jnp.take_along_axis(cand, order, axis=-1)
        rows = jnp.take(e32, jnp.clip(cand, 0, n_pad - 1), axis=0)
        exact = jnp.einsum("bfd,bd->bf", rows, q,
                           preferred_element_type=jnp.float32,
                           precision=prec)
        exact = jnp.where(cand < valid, exact, -jnp.inf)
        vals, pos = lax.top_k(exact, k)
        return vals, jnp.take_along_axis(cand, pos, axis=-1)

    rows_table = []
    for width in widths:
        # distinct stacked inputs: token ids [OUT][R, width, seq],
        # normalized queries and random candidate sets for the isolated
        # scan / re-rank stages
        seqs = []
        for o in range(OUT):
            txts = [f"w{width} o{o} r{r} scene {i} with people"
                    for r in range(R) for i in range(width)]
            tids = np.concatenate([tokenizer(t) for t in txts])
            tids = trim_text_ids(tids)
            seqs.append(jnp.asarray(
                tids.reshape(R, width, -1)).block_until_ready())
        qs = []
        for o in range(OUT):
            q = jax.random.normal(jax.random.PRNGKey(100 + o),
                                  (R, width, 512), jnp.float32)
            qs.append((q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                       ).block_until_ready())
        cands = [jax.random.randint(jax.random.PRNGKey(200 + o),
                                    (R, width, fetch), 0, args.rows,
                                    jnp.int32).block_until_ready()
                 for o in range(OUT)]
        log(f"[{width}] ids shape {seqs[0].shape} (trimmed seq bucket)")

        def reg(per_batch, bigs):
            def run(stacked, *bs):
                def body(acc, x):
                    return acc + per_batch(x, *bs), None
                return lax.scan(body, jnp.float32(0), stacked)[0]
            j = jax.jit(run)
            return lambda x, _j=j, _b=bigs: _j(x, *_b)

        def chk(vi):
            v, i = vi
            return v.sum() + (i % 7).sum().astype(jnp.float32)

        def full16(ids, p, e16, pm, e32):
            q = _encode(ids, p).astype(jnp.float32)
            _, cand = candidate_topk(e16, q, valid, k=fetch, perm=pm,
                                     prefix=prefix)
            return chk(_rerank(q, cand, e32))

        def full8(ids, p, c, s, pm, e32):
            q = _encode(ids, p).astype(jnp.float32)
            _, cand = candidate_topk_int8(c, s, q, valid, k=fetch,
                                          perm=pm, prefix=prefix)
            return chk(_rerank(q, cand, e32))

        def full4(ids, p, c, s, pm, e32):
            q = _encode(ids, p).astype(jnp.float32)
            _, cand = candidate_topk_int4(c, s, q, valid, k=fetch,
                                          perm=pm, prefix=prefix)
            return chk(_rerank(q, cand, e32))

        # builders, not built fns: orientation is read from the env at
        # TRACE time, so each measured orient needs a fresh jit
        from video_quierer_tpu.ops.fused_layer import (
            fused_seq_eligible, fused_text_encode,
            fused_text_tower_eligible)

        def _encode_fused(ids, p):
            return fused_text_encode(p, ids, cfg=cfg,
                                     dtype=jnp.bfloat16).sum()

        fused_ok = (fused_text_tower_eligible(cfg.text, jnp.bfloat16)
                    and fused_seq_eligible(seqs[0].shape[-1]))
        stages = [
            ("encode", lambda: reg(lambda ids, p: _encode(ids, p).sum(),
                                   (params,)), seqs),
            # the serving path (CLIPEmbedder._encode_text_fn) when the
            # fused-layer tower is eligible (ops/fused_layer.py)
            *([("encode-fused",
                lambda: reg(_encode_fused, (params,)), seqs)]
              if fused_ok else []),
            ("scan-bf16", lambda: reg(lambda q, e, pm: chk(candidate_topk(
                e, q, valid, k=fetch, perm=pm, prefix=prefix)),
                (emb16, perm)), qs),
            ("scan-int8", lambda: reg(
                lambda q, c, s, pm: chk(candidate_topk_int8(
                    c, s, q, valid, k=fetch, perm=pm, prefix=prefix)),
                (codes, scales, perm)), qs),
            *([("scan-int4", lambda: reg(
                lambda q, c, s, pm: chk(candidate_topk_int4(
                    c, s, q, valid, k=fetch, perm=pm, prefix=prefix)),
                (codes4, scales4, perm)), qs),
               ("full-int4", lambda: reg(
                   full4, (params, codes4, scales4, perm, emb)), seqs)]
              if prefix else []),
            ("rerank", lambda: reg(
                lambda qc, e32: chk(_rerank(qc[0], qc[1], e32)),
                (emb,)), list(zip(qs, cands))),
            ("full-bf16", lambda: reg(full16, (params, emb16, perm, emb)),
             seqs),
            ("full-int8", lambda: reg(full8,
                                      (params, codes, scales, perm, emb)),
             seqs),
        ]
        import os as _os

        def time_stage(name, fn, inputs):
            t0 = time.time()
            _ = float(fn(inputs[0]))
            log(f"[{width}] {name}: compiled in {time.time() - t0:.0f}s")
            _ = float(sum(map(float, [fn(x) for x in inputs])))  # settle
            for rep in (1, 2):
                t0 = time.time()
                outs = [fn(x) for x in inputs]
                total = outs[0]
                for o in outs[1:]:
                    total = total + o          # device-side adds
                checksum = float(total)        # ONE fetch
                wall = time.time() - t0
                ms_b = wall / (OUT * R) * 1000.0
                assert np.isfinite(checksum)
                log(f"[{width}] {name}: rep{rep} {ms_b:.2f} ms/batch "
                    f"({ms_b / width * 1000:.1f} us/q) "
                    f"[chk {checksum:.1f}]")
            rows_table.append((width, name, ms_b))

        for name, build, inputs in stages:
            if only and name not in only:
                continue
            orient_dep = prefix and (name.startswith("scan-")
                                     or name.startswith("full-"))
            for orient in (orients if orient_dep else orients[:1]):
                if orient_dep:
                    _os.environ["VQT_CAND_ORIENT"] = orient
                try:
                    tag = f"{name}@{orient}" if orient_dep \
                        and len(orients) > 1 else name
                    time_stage(tag, build(), inputs)
                finally:
                    _os.environ.pop("VQT_CAND_ORIENT", None)

    print("width stage ms/batch us/query")
    for width, name, ms_b in rows_table:
        print(f"{width} {name} {ms_b:.2f} {ms_b / width * 1000:.1f}")


if __name__ == "__main__":
    main()
