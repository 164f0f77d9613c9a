"""DeviceVideoIndex behavior + pickle v1.0 parity tests.

The pickle round-trip is checked against the exact reference schema
(video_search_overhaul.py:66-106): ``{'embeddings': [f32 (512,) ...],
'metadata': [{'video_name','timestamp','frame_id'} ...], 'video_hashes': {},
'version': '1.0'}``.
"""

import pickle

import numpy as np
import pytest

from video_quierer_tpu.index.device_index import DeviceVideoIndex


def _rand_emb(rng, n=1):
    e = rng.standard_normal((n, 512)).astype(np.float32)
    return e / np.linalg.norm(e, axis=-1, keepdims=True)


def test_empty_search_returns_empty():
    idx = DeviceVideoIndex()
    assert idx.search(np.ones(512, np.float32), k=5) == []


def test_add_and_search_scores_match_numpy(rng):
    idx = DeviceVideoIndex()
    embs = _rand_emb(rng, 300)
    for i in range(300):
        idx.add_frame(embs[i], f"vid{i % 3}.mp4", float(i) / 30.0)
    q = rng.standard_normal(512).astype(np.float32)
    results = idx.search(q, k=5)
    assert len(results) == 5
    qn = q / (np.linalg.norm(q) + 1e-10)
    scores = embs @ qn
    order = np.argsort(-scores, kind="stable")[:5]
    for r, oi in zip(results, order):
        assert r["frame_id"] == oi
        assert r["video_name"] == f"vid{oi % 3}.mp4"
        assert abs(r["timestamp"] - oi / 30.0) < 1e-9
        assert abs(r["score"] - scores[oi]) < 1e-5


def test_incremental_append_after_search(rng):
    """Device mirror must refresh when rows are appended post-search."""
    idx = DeviceVideoIndex()
    idx.add_batch(_rand_emb(rng, 100), "a.mp4", list(range(100)))
    idx.search(np.ones(512, np.float32), k=3)
    spike = np.zeros(512, np.float32)
    spike[0] = 1.0
    idx.add_frame(spike, "b.mp4", 42.0)
    res = idx.search(spike, k=1)
    assert res[0]["video_name"] == "b.mp4"
    assert res[0]["timestamp"] == 42.0
    assert res[0]["frame_id"] == 100


def test_capacity_growth(rng):
    idx = DeviceVideoIndex()
    idx.add_batch(_rand_emb(rng, 5000), "big.mp4",
                  np.arange(5000, dtype=float))
    assert len(idx) == 5000
    res = idx.search(_rand_emb(rng)[0], k=10)
    assert len(res) == 10


def test_remove_video(rng):
    idx = DeviceVideoIndex()
    idx.add_batch(_rand_emb(rng, 50), "a.mp4", np.arange(50, dtype=float))
    spike = np.zeros((1, 512), np.float32)
    spike[0, 5] = 1.0
    idx.add_batch(spike, "b.mp4", [7.0])
    idx.add_batch(_rand_emb(rng, 20), "c.mp4", np.arange(20, dtype=float))
    removed = idx.remove_video("a.mp4")
    assert removed == 50
    assert len(idx) == 21
    res = idx.search(spike[0], k=1)
    assert res[0]["video_name"] == "b.mp4"
    # surviving rows keep their original frame_id (reference behavior)
    assert res[0]["frame_id"] == 50
    assert "a.mp4" not in idx.video_names()


def test_pickle_roundtrip_schema(tmp_path, rng):
    idx = DeviceVideoIndex()
    embs = _rand_emb(rng, 10)
    idx.add_batch(embs, "x.mp4", np.arange(10, dtype=float))
    idx.video_hashes["x.mp4"] = "abc123"
    path = tmp_path / "cache.pkl"
    assert idx.save_to_disk(path)

    with open(path, "rb") as f:
        raw = pickle.load(f)
    assert raw["version"] == "1.0"
    assert len(raw["embeddings"]) == 10
    assert isinstance(raw["embeddings"][0], np.ndarray)
    assert raw["embeddings"][0].dtype == np.float32
    assert raw["embeddings"][0].shape == (512,)
    assert raw["metadata"][3] == {"video_name": "x.mp4", "timestamp": 3.0,
                                  "frame_id": 3}
    assert raw["video_hashes"] == {"x.mp4": "abc123"}

    idx2 = DeviceVideoIndex()
    assert idx2.load_from_disk(path)
    assert len(idx2) == 10
    np.testing.assert_array_equal(idx2._emb[:10], embs)
    assert idx2.video_hashes == {"x.mp4": "abc123"}


def test_load_reference_style_pickle(tmp_path, rng):
    """A pickle written the way the reference writes it must load."""
    embs = [_rand_emb(rng)[0] for _ in range(4)]
    payload = {
        "embeddings": embs,
        "metadata": [{"video_name": "ref.mp4", "timestamp": float(i),
                      "frame_id": i} for i in range(4)],
        "video_hashes": {"ref.mp4": "deadbeef"},
        "version": "1.0",
    }
    path = tmp_path / "ref_cache.pkl"
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    idx = DeviceVideoIndex()
    assert idx.load_from_disk(path)
    res = idx.search(embs[2], k=1)
    assert res[0]["frame_id"] == 2
    assert res[0]["video_name"] == "ref.mp4"


def test_load_missing_file(tmp_path):
    idx = DeviceVideoIndex()
    assert not idx.load_from_disk(tmp_path / "nope.pkl")


def test_native_roundtrip(tmp_path, rng):
    idx = DeviceVideoIndex()
    idx.add_batch(_rand_emb(rng, 33), "n.mp4", np.arange(33, dtype=float))
    idx.video_hashes["n.mp4"] = "h"
    p = tmp_path / "native.npz"
    idx.save_native(p)
    idx2 = DeviceVideoIndex()
    idx2.load_native(p)
    assert len(idx2) == 33
    assert idx2.video_hashes == {"n.mp4": "h"}
    np.testing.assert_array_equal(idx2._emb[:33], idx._emb[:33])


# ---------------------------------------------------------------------------
# Video-level search (incremental means + one-dispatch ranking)
# ---------------------------------------------------------------------------


def _video_oracle(idx, q, k):
    import numpy as np
    n = idx.count
    q = q / (np.linalg.norm(q) + 1e-10)
    ids = idx._video_ids[:n]
    uniq = sorted(set(ids.tolist()))
    rows = []
    for vid in uniq:
        mask = ids == vid
        mean = idx._emb[:n][mask].mean(axis=0)
        mean = mean / max(np.linalg.norm(mean), 1e-10)
        fscores = idx._emb[:n] @ q
        best = np.nonzero(mask)[0][np.argmax(fscores[mask])]
        rows.append((float(mean @ q), vid, best))
    rows.sort(key=lambda t: (-t[0], t[1]))
    return rows[:k]


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_search_videos_matches_oracle(rng, dtype):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    idx = DeviceVideoIndex(device_dtype=dtype)
    for v in range(5):
        emb = rng.standard_normal((40 + v * 7, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        idx.add_batch(emb, f"vid{v}.mp4",
                      [float(t) for t in range(emb.shape[0])])
    q = rng.standard_normal(512).astype(np.float32)
    got = idx.search_videos(q, k=3)
    want = _video_oracle(idx, q, 3)
    assert len(got) == 3
    for g, (score, vid, best) in zip(got, want):
        assert g["video_name"] == f"vid{vid}.mp4"
        # all dtypes rank from the exact f32 means and pick best frames
        # from the f32 rows (round-2 review fix: quantized fscores used
        # to leak into best_timestamp)
        np.testing.assert_allclose(g["score"], score, atol=1e-6,
                                   rtol=1e-5)
        assert g["best_timestamp"] == float(idx._timestamps[best])


def test_search_videos_incremental_after_remove(rng):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    idx = DeviceVideoIndex()
    for v in range(4):
        emb = rng.standard_normal((30, 512)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        idx.add_batch(emb, f"vid{v}.mp4", [float(t) for t in range(30)])
    idx.remove_video("vid1.mp4")
    # append more to an existing video after the removal/compaction
    more = rng.standard_normal((10, 512)).astype(np.float32)
    more /= np.linalg.norm(more, axis=-1, keepdims=True)
    idx.add_batch(more, "vid2.mp4", [float(100 + t) for t in range(10)])
    q = rng.standard_normal(512).astype(np.float32)
    got = idx.search_videos(q, k=4)
    names = [g["video_name"] for g in got]
    assert "vid1.mp4" not in names and len(got) == 3
    want = _video_oracle(idx, q, 4)
    for g, (score, vid, best) in zip(got, want):
        assert g["video_name"] == f"vid{vid}.mp4"
        np.testing.assert_allclose(g["score"], score, rtol=1e-5)
        assert g["best_timestamp"] == float(idx._timestamps[best])
    counts = idx.video_frame_counts()
    assert counts["vid2.mp4"] == 40


def test_search_videos_after_pickle_roundtrip(rng, tmp_path):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    idx = DeviceVideoIndex()
    emb = rng.standard_normal((64, 512)).astype(np.float32)
    idx.add_batch(emb[:40], "a.mp4", [float(t) for t in range(40)])
    idx.add_batch(emb[40:], "b.mp4", [float(t) for t in range(24)])
    path = tmp_path / "c.pkl"
    assert idx.save_to_disk(path)
    idx2 = DeviceVideoIndex()
    assert idx2.load_from_disk(path)
    q = rng.standard_normal(512).astype(np.float32)
    a = idx.search_videos(q, k=2)
    b = idx2.search_videos(q, k=2)
    assert [r["video_name"] for r in a] == [r["video_name"] for r in b]
    np.testing.assert_allclose([r["score"] for r in a],
                               [r["score"] for r in b], rtol=1e-6)


def test_bf16_search_is_f32_true(rng):
    """bf16 mirror over-fetches + re-ranks on host: final results must be
    EXACTLY the f32 index's (scores f32, same rows) despite the bf16 scan."""
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    emb = rng.standard_normal((600, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    # inject near-ties a bf16 scan alone would misorder
    emb[100] = emb[50] + 1e-5 * emb[51]
    emb[100] /= np.linalg.norm(emb[100])
    for idx in (f32, b16):
        idx.add_batch(emb, "a.mp4", [float(t) for t in range(600)])
    q = emb[50] + 0.01 * rng.standard_normal(512).astype(np.float32)
    want = f32.search(q, k=8)
    got = b16.search(q, k=8)
    assert [r["frame_id"] for r in got] == [r["frame_id"] for r in want]
    np.testing.assert_allclose([r["score"] for r in got],
                               [r["score"] for r in want], rtol=1e-6)


def test_bf16_fused_search_is_f32_true(rng):
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    import jax.numpy as jnp

    f32 = DeviceVideoIndex(device_dtype="float32")
    b16 = DeviceVideoIndex(device_dtype="bfloat16")
    emb = rng.standard_normal((600, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for idx in (f32, b16):
        idx.add_batch(emb, "a.mp4", [float(t) for t in range(600)])

    proj = rng.standard_normal((16, 512)).astype(np.float32)

    def encode(params, ids_dev):
        # toy "tower": one-hot mean -> projection (jit-traceable)
        x = jnp.take(params, ids_dev % 16, axis=0).mean(axis=1)
        return x

    ids = np.asarray(rng.integers(0, 1000, (2, 7)), np.int32)
    want = f32.search_batch_fused(encode, jnp.asarray(proj), ids, k=6)
    got = b16.search_batch_fused(encode, jnp.asarray(proj), ids, k=6)
    for wq, gq in zip(want, got):
        assert [r["frame_id"] for r in gq] == [r["frame_id"] for r in wq]
        np.testing.assert_allclose([r["score"] for r in gq],
                                   [r["score"] for r in wq], rtol=1e-6)
