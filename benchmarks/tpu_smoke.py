#!/usr/bin/env python3
"""Hardware smoke: every engine-level device surface on the REAL backend.

The CPU test suite runs Pallas kernels in interpreter mode
(VQT_PALLAS_INTERPRET=1), which accepts block shapes the hardware
Mosaic lowering rejects — round 2 found the IVF pair-grid kernel broken
on a real TPU that way (a per-pair (D, 1) query BlockSpec violates the
lane-tiling rule). This script compiles and runs each device surface on
whatever backend jax resolves, asserting cross-mode agreement:

- exact f32 scan vs bf16 and int8 re-ranked modes (identical rows)
- device-side video ranking (_video_rank_device) in all three modes
- batched search
- the IVF tier (build + full-probe search covers the exact top-k)
- the FUSED candidate kernels (ops/topk.py:_pallas_cand_scan[_int8])
  at a 163,840-row corpus — above the scale the fused stage engages
  ((N/bucket)·rounds >= fetch; 131,072 rows at bucket=1024, rounds=2,
  fetch=256) — over the permuted mirror, B=1 and batched, int8
  native-MXU and bf16-upcast contracts, each asserted equal to the
  exact f32 scan
- the fused single-block attention kernel (ops/attention.py) at every
  eligible tower shape vs the einsum oracle
- the fused transformer-LAYER text tower (ops/fused_layer.py) at the
  serving config (real B/32 tower, bf16, seq buckets 8/16/32) vs the
  flax tower oracle

Run it on the TPU after touching any Pallas kernel, BlockSpec, or
device-path dispatch logic:

    python benchmarks/tpu_smoke.py

Exits non-zero on the first mismatch. Takes a few minutes of compiles
on a cold process; seconds when the compilation cache is warm.
"""

import sys

import numpy as np


def main() -> None:
    import jax

    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    from video_quierer_tpu.index.ivf import IVFIndex

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(3)
    n_videos, per = 6, 1000
    emb = rng.standard_normal((n_videos * per, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    idxs = {}
    for mode in ("float32", "bfloat16", "int8", "int4"):
        idx = DeviceVideoIndex(device_dtype=mode)
        for v in range(n_videos):
            idx.add_batch(emb[v * per:(v + 1) * per], f"v{v}.mp4",
                          np.arange(per, dtype=float))
        idxs[mode] = idx

    q = emb[1234] + 0.05 * rng.standard_normal(512).astype(np.float32)

    want = idxs["float32"].search(q, k=8)
    assert want[0]["frame_id"] == 1234
    for mode in ("bfloat16", "int8", "int4"):
        got = idxs[mode].search(q, k=8)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want], (mode, got, want)
        print(f"[smoke] {mode} search == f32 search")

    vr_want = None
    for mode in ("float32", "bfloat16", "int8", "int4"):
        vr = idxs[mode].search_videos(q, k=3)
        names = [r["video_name"] for r in vr]
        if vr_want is None:
            vr_want = names
        assert names == vr_want, (mode, names, vr_want)
        print(f"[smoke] {mode} search_videos ranking consistent")

    qs = emb[[10, 2040, 3060, 5090]] + \
        0.05 * rng.standard_normal((4, 512)).astype(np.float32)
    wb = idxs["float32"].search_batch(qs, k=5)
    gb = idxs["bfloat16"].search_batch(qs, k=5)
    for wr, gr in zip(wb, gb):
        assert [r["frame_id"] for r in wr] == [r["frame_id"] for r in gr]
    print("[smoke] batched bf16 == f32")

    ivf = IVFIndex(nlist=16, nprobe=16, kmeans_iters=4, seed=0)
    ivf.build(emb)
    qn = DeviceVideoIndex.normalize_query(q)
    _, ids = ivf.search(qn[None], k=8)
    full = set(int(i) for i in ids[0] if i >= 0)
    exact = set(r["frame_id"] for r in want)
    assert exact <= full, (exact - full)
    print("[smoke] IVF full probe covers the exact top-8")

    # --- fused candidate kernels at engagement scale (>= 131,072 rows:
    # (N/CAND_BUCKET)·CAND_ROUNDS must cover the default 256 fetch at
    # the round-3 bucket=1024) ---
    import os

    from video_quierer_tpu.ops.topk import _fused_usable

    n_big = 160 * 1024
    emb_big = rng.standard_normal((n_big, 512)).astype(np.float32)
    emb_big /= np.linalg.norm(emb_big, axis=-1, keepdims=True)
    assert _fused_usable(n_big, 256, 8), "fused stage must engage here"

    big = {}
    for mode in ("float32", "bfloat16", "int8", "int4"):
        idx = DeviceVideoIndex(device_dtype=mode)
        for lo in range(0, n_big, 8192):
            idx.add_batch(emb_big[lo:lo + 8192], f"big{lo}.mp4",
                          np.arange(min(8192, n_big - lo), dtype=float))
        big[mode] = idx

    qb = emb_big[[777, 12345, 30000, 39999]] + \
        0.02 * rng.standard_normal((4, 512)).astype(np.float32)
    want1 = big["float32"].search(qb[0], k=10)          # exact oracle
    wantb = big["float32"].search_batch(qb, k=10)

    # force the fused kernel for every batch size (the serving policy
    # routes B < FUSED_MIN_B to the approx scan — exercised below)
    from video_quierer_tpu.ops import topk as topk_mod
    saved_min_b = topk_mod.FUSED_MIN_B
    topk_mod.FUSED_MIN_B = 1
    try:
        for mode in ("bfloat16", "int8", "int4"):
            assert big[mode]._mirror_layout() == "prefix", mode
            got1 = big[mode].search(qb[0], k=10)        # fused B=1
            assert big[mode]._mirror_layout_cur == "prefix", mode
            assert [r["frame_id"] for r in got1] == \
                [r["frame_id"] for r in want1], (mode, got1, want1)
            gotb = big[mode].search_batch(qb, k=10)     # fused batched
            for wr, gr in zip(wantb, gotb):
                assert [r["frame_id"] for r in wr] == \
                    [r["frame_id"] for r in gr], (mode, gr, wr)
            print(f"[smoke] fused {mode} candidate scan (live-prefix "
                  f"mirror, B=1 + batched) == exact f32 @ {n_big} rows")

        # prefix-kernel ORIENTATIONS (col is the serving default; row is
        # the fallback) + the fixed-perm kernels the corpus meshes run —
        # all four against the same exact oracle
        for orient in ("col", "row"):
            os.environ["VQT_CAND_ORIENT"] = orient
            try:
                for mode in ("bfloat16", "int8", "int4"):
                    big[mode]._fused_jits.clear()
                    gotb = big[mode].search_batch(qb, k=10)
                    for wr, gr in zip(wantb, gotb):
                        assert [r["frame_id"] for r in wr] == \
                            [r["frame_id"] for r in gr], (mode, orient)
                print(f"[smoke] prefix kernels orient={orient} == exact")
            finally:
                del os.environ["VQT_CAND_ORIENT"]
        # two-level packb2 selection (round 4): col-orientation kernels
        # for all three quantized dtypes vs the exact oracle
        os.environ["VQT_CAND_SELECT"] = "packb2"
        try:
            for mode in ("bfloat16", "int8", "int4"):
                big[mode]._fused_jits.clear()
                gotb = big[mode].search_batch(qb, k=10)
                for wr, gr in zip(wantb, gotb):
                    assert [r["frame_id"] for r in wr] == \
                        [r["frame_id"] for r in gr], (mode, "packb2")
            print("[smoke] packb2 two-level selection == exact")
        finally:
            del os.environ["VQT_CAND_SELECT"]
            for mode in ("bfloat16", "int8", "int4"):
                big[mode]._fused_jits.clear()

        from video_quierer_tpu.ops.topk import (candidate_topk,
                                                candidate_topk_int8)
        import jax.numpy as _jnp
        perm16 = big["bfloat16"]._perm_arg()
        _, cidx = candidate_topk(big["bfloat16"]._device_emb,
                                 _jnp.asarray(qb), n_big, k=256,
                                 perm=perm16, prefix=False)
        perm8 = big["int8"]._perm_arg()
        _, cidx8 = candidate_topk_int8(big["int8"]._device_emb,
                                       big["int8"]._device_scales,
                                       _jnp.asarray(qb), n_big, k=256,
                                       perm=perm8, prefix=False)
        for b_i, wr in enumerate(wantb):
            exact_ids = {r["frame_id"] for r in wr}
            assert exact_ids <= set(np.asarray(cidx)[b_i].tolist()), b_i
            assert exact_ids <= set(np.asarray(cidx8)[b_i].tolist()), b_i
        print("[smoke] fixed-perm kernels (mesh layout) cover exact top-k")

        # int8 bf16-upcast contract variant (VQT_INT8_MXU=upcast)
        os.environ["VQT_INT8_MXU"] = "upcast"
        try:
            got = big["int8"].search_batch(qb, k=10)
            for wr, gr in zip(wantb, got):
                assert [r["frame_id"] for r in wr] == \
                    [r["frame_id"] for r in gr]
            print("[smoke] fused int8 upcast contract == exact f32")
        finally:
            del os.environ["VQT_INT8_MXU"]
    finally:
        topk_mod.FUSED_MIN_B = saved_min_b

    # serving policy's small-B path: approx scan over the SAME permuted
    # mirror (bf16 + native-int8 XLA contracts) == exact f32
    for mode in ("bfloat16", "int8", "int4"):
        got1 = big[mode].search(qb[0], k=10)
        assert [r["frame_id"] for r in got1] == \
            [r["frame_id"] for r in want1], (mode, got1, want1)
        print(f"[smoke] approx+perm {mode} single-query == exact f32")

    # fused device re-rank (index.device_rerank=on): candidate scan +
    # exact f32 re-rank in one dispatch == host re-rank, row for row
    import jax.numpy as jnp

    enc_table = jnp.asarray(rng.standard_normal((100, 512))
                            .astype(np.float32))

    def enc_fn(params, ids):
        feats = params[ids].mean(axis=1)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    ids_b = rng.integers(0, 100, (8, 8)).astype(np.int32)
    for mode in ("bfloat16", "int8", "int4"):
        os.environ["VQT_DEVICE_RERANK"] = "off"
        try:
            host_rows = big[mode].search_batch_fused(
                enc_fn, enc_table, ids_b, k=10)
            os.environ["VQT_DEVICE_RERANK"] = "on"
            assert big[mode]._device_rerank_active()
            dev_rows = big[mode].search_batch_fused(
                enc_fn, enc_table, ids_b, k=10)
        finally:
            del os.environ["VQT_DEVICE_RERANK"]
        for hr, dr in zip(host_rows, dev_rows):
            assert [r["frame_id"] for r in hr] == \
                [r["frame_id"] for r in dr], (mode, hr, dr)
            np.testing.assert_allclose(
                [r["score"] for r in hr], [r["score"] for r in dr],
                rtol=1e-6, atol=1e-6)
        print(f"[smoke] fused device re-rank {mode} == host re-rank")

    # fused single-block attention (ops/attention.py) on real Mosaic:
    # every eligible tower shape, causal + valid_len, vs the einsum oracle
    import jax.numpy as jnp
    from video_quierer_tpu.ops.attention import (
        fused_attention, fused_attention_eligible)

    def _einsum_attn(qa, ka, va, *, h, causal):
        b, s, d = qa.shape
        hd = d // h
        sp = lambda t: t.reshape(b, s, h, hd)
        lg = jnp.einsum("bqhd,bkhd->bhqk", sp(qa), sp(ka),
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
        if causal:
            m = jnp.tril(jnp.ones((s, s), dtype=bool))
            lg = jnp.where(m[None, None], lg, -jnp.inf)
        w = jax.nn.softmax(lg, axis=-1).astype(qa.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, sp(va)).reshape(b, s, d)

    for s, h, d, causal, tag in ((50, 8, 512, False, "B/32 vision"),
                                 (16, 8, 512, True, "text s16"),
                                 (77, 8, 512, True, "text s77"),
                                 (64, 12, 768, False, "SigLIP text"),
                                 (196, 12, 768, False, "B/16-class "
                                  "vision (2-head lane group)")):
        assert fused_attention_eligible(s, h, d), (s, h, d)
        key = jax.random.PRNGKey(s * h)
        qa, ka, va = (jax.random.normal(k, (3, s, d), jnp.float32)
                      for k in jax.random.split(key, 3))
        got = np.asarray(fused_attention(qa, ka, va, num_heads=h,
                                         causal=causal))
        want = np.asarray(_einsum_attn(qa, ka, va, h=h, causal=causal))
        # f32 MXU matmuls differ between the kernel and XLA by
        # bf16x3-pass rounding that grows with the contraction length
        # (measured max abs 3.8e-5 at S=50, 2.8e-4 at S=196); the CPU
        # interpret-mode tests prove exact math identity
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-4)
        print(f"[smoke] fused attention {tag} == einsum oracle")

    # fused transformer-LAYER text tower (ops/fused_layer.py) on real
    # Mosaic: the serving config (real B/32 tower, bf16) at every
    # eligible seq bucket vs the flax tower oracle
    from video_quierer_tpu.models.clip.config import get_config
    from video_quierer_tpu.models.clip.model import CLIP, init_params
    from video_quierer_tpu.ops.fused_layer import (
        fused_seq_eligible, fused_text_encode, fused_text_tower_eligible)

    cfg = get_config("openai/clip-vit-base-patch32")
    assert fused_text_tower_eligible(cfg.text, jnp.bfloat16)
    model = CLIP(cfg, dtype=jnp.bfloat16)
    params = init_params(model, seed=0)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    for s in (8, 16, 32):
        assert fused_seq_eligible(s)
        ids = rng.integers(1, cfg.text.vocab_size - 2, size=(64, s))
        eot = rng.integers(s // 2, s, size=64)
        for i in range(64):
            ids[i, eot[i]] = cfg.text.vocab_size - 1
            ids[i, eot[i] + 1:] = 0
        ids = jnp.asarray(ids.astype(np.int32))
        ref = np.asarray(model.apply({"params": params}, ids,
                                     method=CLIP.encode_text))
        got = np.asarray(fused_text_encode(params, ids, cfg=cfg,
                                           dtype=jnp.bfloat16))
        assert not np.isnan(got).any()
        cos = np.sum(got * ref, axis=-1)
        assert cos.min() > 0.999, (s, cos.min())
        print(f"[smoke] fused-layer text tower s={s} == flax tower "
              f"(min cos {cos.min():.6f})")

    # fused-layer VISION tower (768-wide → split mode: attn + MLP
    # halves as two pallas_calls per block) vs the flax tower
    from video_quierer_tpu.ops.fused_layer import (
        _layer_mode, fused_vision_encode, fused_vision_tower_eligible)
    assert fused_vision_tower_eligible(cfg.vision, jnp.bfloat16)
    assert _layer_mode(cfg.vision.hidden_size, cfg.vision.mlp_ratio,
                       jnp.bfloat16) == "split"
    pix = jnp.asarray(rng.standard_normal((32, 224, 224, 3))
                      .astype(np.float32))
    ref = np.asarray(model.apply({"params": params}, pix,
                                 method=CLIP.encode_image))
    got = np.asarray(fused_vision_encode(params, pix, cfg=cfg,
                                         dtype=jnp.bfloat16))
    assert not np.isnan(got).any()
    cos = np.sum(got * ref, axis=-1)
    assert cos.min() > 0.999, cos.min()
    print(f"[smoke] fused-layer vision tower (split mode) == flax tower "
          f"(min cos {cos.min():.6f})")

    # pad-token scheme (round 4): padded fused vision (s=50 → 56,
    # dead tokens w/ unique negative item ids) must equal the unpadded
    # fused run EXACTLY on hardware Mosaic
    import os as _os_pad
    from video_quierer_tpu.ops.fused_layer import fused_vision_seq
    assert fused_vision_seq(cfg.vision.seq_len) == 50  # pad is opt-in
    _os_pad.environ["VQT_FUSED_VISION_PAD"] = "1"
    try:
        assert fused_vision_seq(cfg.vision.seq_len) == 56
        padded = np.asarray(fused_vision_encode(params, pix, cfg=cfg,
                                                dtype=jnp.bfloat16))
    finally:
        del _os_pad.environ["VQT_FUSED_VISION_PAD"]
    unpadded = got
    # exact-arithmetic identity is pinned by the f32 CPU test
    # (test_fused_layer.py); on hardware the pad changes the tile size
    # (t=400 → 448), and Mosaic's bf16 matmul strategy differs per tile
    # shape — measured ~2e-3 rounding spread, the same order as the
    # tower's own bf16 noise vs flax
    cosp = np.sum(padded * unpadded, axis=-1)
    assert cosp.min() > 0.9999, cosp.min()
    np.testing.assert_allclose(padded, unpadded, atol=5e-3)
    print(f"[smoke] padded fused vision == unpadded (bf16 tile-shape "
          f"tolerance; min cos {cosp.min():.6f})")

    # device-resident streamed appends (round 4): add_batch_device on
    # hardware (on-device quantize + Fisher-Yates relocate/scatter)
    # must serve identically to the lazy host-synced build
    for mode in ("bfloat16", "int8", "int4"):
        streamed = DeviceVideoIndex(device_dtype=mode)
        for lo in range(0, 6000, 1500):
            streamed.add_batch_device(
                jnp.asarray(emb[lo:lo + 1500]), f"s{lo}.mp4",
                np.arange(1500, dtype=float))
        assert streamed._device_rows == streamed._count == 6000
        lazy = DeviceVideoIndex(device_dtype=mode)
        for lo in range(0, 6000, 1500):
            lazy.add_batch(emb[lo:lo + 1500], f"s{lo}.mp4",
                           np.arange(1500, dtype=float))
        got_s = streamed.search_batch(qs, k=8)
        got_l = lazy.search_batch(qs, k=8)
        for gr, lr in zip(got_s, got_l):
            assert [r["frame_id"] for r in gr] == \
                [r["frame_id"] for r in lr], (mode, gr, lr)
        print(f"[smoke] streamed device append {mode} == lazy build")

    # mesh-serving path: the fused encode under shard_map (params
    # replicated, batch sharded over the data axis) — one real device
    # still exercises pallas-inside-shard_map on hardware Mosaic
    from jax.sharding import Mesh
    from video_quierer_tpu.ops.fused_layer import fused_encode_shard_map
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    ids16 = rng.integers(1, cfg.text.vocab_size - 2, size=(64, 16))
    ids16[:, -1] = cfg.text.vocab_size - 1
    ids16 = jnp.asarray(ids16.astype(np.int32))
    direct = np.asarray(fused_text_encode(params, ids16, cfg=cfg,
                                          dtype=jnp.bfloat16))
    sm = fused_encode_shard_map(
        lambda p, i: fused_text_encode(p, i, cfg=cfg,
                                       dtype=jnp.bfloat16),
        mesh1, "data", in_ndim=2)
    got = np.asarray(sm(params, ids16))
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-5)
    print("[smoke] shard_map'd fused text encode == direct (1-dev mesh)")

    # fused SigLIP towers (second family: 768-wide split kernels,
    # gelu_tanh explicit-exp activation, non-causal text) vs flax
    from video_quierer_tpu.models.siglip.fused import (
        fused_siglip_text_encode)
    from video_quierer_tpu.models.siglip.model import (
        SigLIP, siglip_base_patch16, siglip_init_params)
    scfg = siglip_base_patch16()
    smodel = SigLIP(scfg, dtype=jnp.bfloat16)
    sparams = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a,
        siglip_init_params(smodel, seed=0))
    sids = jnp.asarray(rng.integers(
        1, scfg.text.vocab_size - 1,
        size=(8, scfg.text.context_length)).astype(np.int32))
    ref = np.asarray(smodel.apply({"params": sparams}, sids,
                                  method=SigLIP.encode_text))
    got = np.asarray(fused_siglip_text_encode(sparams, sids, cfg=scfg,
                                              dtype=jnp.bfloat16))
    cos = np.sum(got * ref, axis=-1)
    assert not np.isnan(got).any() and cos.min() > 0.999, cos.min()
    print(f"[smoke] fused SigLIP text tower == flax "
          f"(min cos {cos.min():.6f})")

    print(f"ALL ENGINE DEVICE SURFACES OK on {jax.default_backend()}")


if __name__ == "__main__":
    main()
