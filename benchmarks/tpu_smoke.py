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
    for mode in ("float32", "bfloat16", "int8"):
        idx = DeviceVideoIndex(device_dtype=mode)
        for v in range(n_videos):
            idx.add_batch(emb[v * per:(v + 1) * per], f"v{v}.mp4",
                          np.arange(per, dtype=float))
        idxs[mode] = idx

    q = emb[1234] + 0.05 * rng.standard_normal(512).astype(np.float32)

    want = idxs["float32"].search(q, k=8)
    assert want[0]["frame_id"] == 1234
    for mode in ("bfloat16", "int8"):
        got = idxs[mode].search(q, k=8)
        assert [r["frame_id"] for r in got] == \
            [r["frame_id"] for r in want], (mode, got, want)
        print(f"[smoke] {mode} search == f32 search")

    vr_want = None
    for mode in ("float32", "bfloat16", "int8"):
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

    print(f"ALL ENGINE DEVICE SURFACES OK on {jax.default_backend()}")


if __name__ == "__main__":
    main()
