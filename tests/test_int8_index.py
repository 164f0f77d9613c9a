"""int8 quantized index mode: quantizer correctness, scan + re-rank
parity with the f32 index, Pallas int8 kernel in interpreter mode."""

import numpy as np
import jax.numpy as jnp
import pytest

from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.ops.quantize import quantize_rows
from video_quierer_tpu.ops.topk import cosine_topk_int8


def _unit(rng, n):
    e = rng.standard_normal((n, 512)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_quantize_rows_roundtrip(rng):
    emb = _unit(rng, 64)
    q, scales = quantize_rows(jnp.asarray(emb))
    q, scales = np.asarray(q), np.asarray(scales)
    assert q.dtype == np.int8 and scales.shape == (64, 1)
    recon = q.astype(np.float32) * scales
    err = np.abs(recon - emb).max()
    assert err < 1.0 / 127.0  # within one quantization step


def test_quantize_zero_rows():
    q, scales = quantize_rows(jnp.zeros((4, 512)))
    assert np.asarray(q).max() == 0
    assert np.asarray(scales).max() == 0


def test_int8_scan_close_to_f32(rng):
    emb = _unit(rng, 2048)
    codes, scales = quantize_rows(jnp.asarray(emb))
    q = _unit(rng, 2)
    vals, idxs = cosine_topk_int8(codes, scales, jnp.asarray(q), 2048, k=5)
    exact = emb @ q.T  # [N, 2]
    for b in range(2):
        for v, i in zip(np.asarray(vals)[b], np.asarray(idxs)[b]):
            assert abs(v - exact[i, b]) < 2e-2


def test_int8_index_matches_f32_after_rerank(rng):
    emb = _unit(rng, 3000)
    ts = np.arange(3000, dtype=float)
    f32 = DeviceVideoIndex()
    f32.add_batch(emb, "v.mp4", ts)
    i8 = DeviceVideoIndex(device_dtype="int8")
    i8.add_batch(emb, "v.mp4", ts)
    agree = 0
    for t in range(10):
        qv = emb[t * 100] + 0.05 * rng.standard_normal(512).astype(
            np.float32)
        rf = f32.search(qv, k=10)
        ri = i8.search(qv, k=10)
        # top-1 must be exact; re-ranked scores are f32-exact
        assert ri[0]["frame_id"] == rf[0]["frame_id"]
        assert abs(ri[0]["score"] - rf[0]["score"]) < 1e-5
        agree += len({r["frame_id"] for r in rf}
                     & {r["frame_id"] for r in ri})
    assert agree / 100 > 0.95  # recall@10 after re-rank


def test_int8_index_append_and_search(rng):
    idx = DeviceVideoIndex(device_dtype="int8")
    idx.add_batch(_unit(rng, 100), "a.mp4", np.arange(100, dtype=float))
    idx.search(np.ones(512, np.float32), k=3)
    spike = np.zeros((1, 512), np.float32)
    spike[0, 3] = 1.0
    idx.add_batch(spike, "b.mp4", [9.0])
    res = idx.search(spike[0], k=1)
    assert res[0]["video_name"] == "b.mp4"
    assert res[0]["score"] == pytest.approx(1.0, abs=1e-5)


def test_int8_sharded_matches_single(rng):
    """int8 + corpus sharding: same results as the single-device int8
    index (both re-rank in f32)."""
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    emb = _unit(rng, 3000)
    ts = np.arange(3000, dtype=float)
    single = DeviceVideoIndex(device_dtype="int8")
    single.add_batch(emb, "v.mp4", ts)
    sharded = DeviceVideoIndex(device_dtype="int8", mesh=corpus_mesh(8))
    sharded.add_batch(emb, "v.mp4", ts)
    for t in range(5):
        q = emb[t * 300] + 0.05 * rng.standard_normal(512).astype(
            np.float32)
        rs = single.search(q, k=10)
        rm = sharded.search(q, k=10)
        assert rm[0]["frame_id"] == rs[0]["frame_id"]
        overlap = len({r["frame_id"] for r in rs}
                      & {r["frame_id"] for r in rm})
        assert overlap >= 9  # candidate sets may differ at the margin


def test_int8_pallas_interpret(rng, monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    emb = _unit(rng, 1024)
    codes, scales = quantize_rows(jnp.asarray(emb))
    q = _unit(rng, 1)
    vals, idxs = cosine_topk_int8(codes, scales, jnp.asarray(q), 1000, k=5)
    exact = emb[:1000] @ q[0]
    best = int(np.argmax(exact))
    assert int(np.asarray(idxs)[0][0]) == best or \
        abs(np.asarray(vals)[0][0] - exact[best]) < 2e-2
