"""Streaming device-mirror sync (round-4 VERDICT item 3).

A 10k-video build used to pay a one-shot multi-GB mirror upload at the
FIRST search (measured 130.7 s through the tunnel — BASELINE.md). The
ingest path now calls ``DeviceVideoIndex.sync_mirror()`` after each
append batch, and capacity growth became a device-side zeros-concat
(``_grow_rows``) with the host prefix arrangement preserved across the
growth (``_extend_perm_to`` grow branch) — so streamed builds never
re-upload the mirror. These tests pin the invariant that matters:
streamed-and-grown mirrors are bit-identical in effect to a fresh lazy
sync (same results, same device rows, same perm column).

Reference contrast: video_search_overhaul.py:46 re-uploads the corpus
per query, so the reference has no stall — and now neither do we.
"""

import numpy as np
import pytest

from video_quierer_tpu.index.device_index import DeviceVideoIndex


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def _rows(rng, n, d=512):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _build(dtype, batches, stream):
    idx = DeviceVideoIndex(device_dtype=dtype)
    for i, rows in enumerate(batches):
        idx.add_batch(rows, f"v{i}.mp4",
                      np.arange(len(rows), dtype=float))
        if stream:
            idx.sync_mirror()
    return idx

def _results_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for xa, xb in zip(ra, rb):
            assert xa["video_name"] == xb["video_name"]
            assert xa["frame_id"] == xb["frame_id"]
            assert xa["timestamp"] == xb["timestamp"]
            assert np.isclose(xa["score"], xb["score"],
                              rtol=1e-5)


# batches sized to cross the initial 8192-row capacity (growth to
# 16384+ happens mid-stream): 3000+4000+3000+2500 = 12500 rows
_BATCH_SIZES = (3000, 4000, 3000, 2500)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_streamed_equals_lazy_across_growth(rng, dtype):
    batches = [_rows(rng, n) for n in _BATCH_SIZES]
    queries = _rows(rng, 4)
    streamed = _build(dtype, batches, stream=True)
    lazy = _build(dtype, batches, stream=False)
    # streaming left no sync work for the first search
    assert streamed._device_rows == streamed._count
    assert streamed._device_cap == streamed._emb.shape[0]
    _results_equal(streamed.search_batch(queries, k=10),
                   lazy.search_batch(queries, k=10))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_streamed_mirror_matches_host_perm(rng, dtype):
    """The grown device mirror holds exactly emb[perm] (live prefix) and
    the device perm column equals the host arrangement."""
    batches = [_rows(rng, n) for n in _BATCH_SIZES]
    idx = _build(dtype, batches, stream=True)
    n = idx._count
    perm = idx._perm
    assert idx._mirror_layout_cur == "prefix"
    np.testing.assert_array_equal(np.asarray(idx._perm_dev), perm)
    # live prefix is a permutation of the host rows
    assert sorted(perm[:n].tolist()) == list(range(n))
    dev = np.asarray(idx._device_emb)[:n]
    host = idx._emb[perm[:n]]
    if dtype == "bfloat16":
        np.testing.assert_allclose(dev.astype(np.float32), host,
                                   atol=1e-2)
    else:
        scales = np.asarray(idx._device_scales)[:n]
        np.testing.assert_allclose(dev.astype(np.float32) * scales,
                                   host, atol=1e-2)


def test_grow_preserves_prefix_arrangement(rng):
    """_extend_perm_to across a capacity increase keeps the existing
    shuffled prefix (identical values), extends the tail with identity,
    and keeps inv_perm consistent — the invariant that makes the
    device-side grow sound."""
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    idx.add_batch(_rows(rng, 1000), "a.mp4",
                  np.arange(1000, dtype=float))
    idx.sync_mirror()
    before = idx._perm[:1000].copy()
    cap = idx._emb.shape[0]
    # grow without new live rows
    idx._extend_perm_to(1000, cap * 2)
    assert idx._perm.shape[0] == cap * 2
    np.testing.assert_array_equal(idx._perm[:1000], before)
    np.testing.assert_array_equal(idx._perm[1000:],
                                  np.arange(1000, cap * 2))
    inv = idx._inv_perm
    np.testing.assert_array_equal(idx._perm[inv],
                                  np.arange(cap * 2))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_remove_after_streaming_full_replaces(rng, dtype):
    """Compaction invalidates the streamed mirror; the next search must
    rebuild and stay correct."""
    batches = [_rows(rng, n) for n in (3000, 4000)]
    idx = _build(dtype, batches, stream=True)
    spike = np.zeros((1, 512), np.float32)
    spike[0, 3] = 1.0
    idx.add_batch(spike, "z.mp4", [5.0])
    idx.sync_mirror()
    idx.remove_video("v0.mp4")
    idx.sync_mirror()
    res = idx.search(spike[0], k=1)
    assert res[0]["video_name"] == "z.mp4"
    assert res[0]["timestamp"] == 5.0


def _build_device(dtype, batches, videos_per_batch=3):
    """Engine-pattern device-resident build: each batch is one device
    array feeding several per-video appends via offsets."""
    import jax.numpy as jnp
    idx = DeviceVideoIndex(device_dtype=dtype)
    v = 0
    for rows in batches:
        feats = jnp.asarray(rows)
        feats_np = np.asarray(feats, np.float32)
        n = len(rows)
        cuts = np.linspace(0, n, videos_per_batch + 1).astype(int)
        for a, b in zip(cuts[:-1], cuts[1:]):
            if b > a:
                idx.add_batch_device(
                    feats, f"dv{v}.mp4",
                    np.arange(b - a, dtype=float).tolist(),
                    offset=int(a), feats_np=feats_np)
                v += 1
    return idx


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
def test_device_append_equals_lazy(rng, dtype):
    """add_batch_device (zero bulk host→device traffic) must serve
    results identical to the lazy host-synced build of the same rows."""
    batches = [_rows(rng, n) for n in _BATCH_SIZES]
    streamed = _build_device(dtype, batches)
    # lazy twin with the same per-video segmentation
    lazy = DeviceVideoIndex(device_dtype=dtype)
    v = 0
    for rows in batches:
        n = len(rows)
        cuts = np.linspace(0, n, 4).astype(int)
        for a, b in zip(cuts[:-1], cuts[1:]):
            if b > a:
                lazy.add_batch(rows[a:b], f"dv{v}.mp4",
                               np.arange(b - a, dtype=float).tolist())
                v += 1
    assert streamed._device_rows == streamed._count == lazy._count
    queries = _rows(rng, 4)
    _results_equal(streamed.search_batch(queries, k=10),
                   lazy.search_batch(queries, k=10))


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_device_append_mirror_bytes_consistent(rng, dtype):
    """The device-built mirror must hold exactly what a host sync of the
    same arrangement would produce: emb[perm] quantized, matching perm
    column, matching f32 re-rank store."""
    batches = [_rows(rng, n) for n in _BATCH_SIZES]
    idx = _build_device(dtype, batches)
    n = idx._count
    perm = idx._perm
    assert idx._mirror_layout_cur == "prefix"
    np.testing.assert_array_equal(np.asarray(idx._perm_dev), perm)
    assert sorted(perm[:n].tolist()) == list(range(n))
    host = idx._emb[perm[:n]]
    dev = np.asarray(idx._device_emb)[:n]
    if dtype == "bfloat16":
        np.testing.assert_allclose(dev.astype(np.float32), host,
                                   atol=1e-2)
    else:
        absmax = np.abs(host).max(axis=-1, keepdims=True)
        scales = absmax * np.float32(1.0 / 127.0)
        safe = np.where(scales > 0, scales, 1.0)
        codes = np.clip(np.round(host / safe), -127, 127).astype(np.int8)
        np.testing.assert_array_equal(dev, codes)
        # exact: host and device quantize are the same f32 multiply
        np.testing.assert_array_equal(
            np.asarray(idx._device_scales)[:n], scales)
    if idx._device_f32 is not None:
        np.testing.assert_array_equal(
            np.asarray(idx._device_f32)[:n], idx._emb[:n])
        assert idx._f32_rows == n


def test_device_append_after_search_and_remove(rng):
    """Mirror created lazily by a search, then device-appends continue
    incrementally; compaction falls back to a full re-place."""
    import jax.numpy as jnp
    idx = DeviceVideoIndex(device_dtype="int8")
    idx.add_batch(_rows(rng, 500), "a.mp4",
                  np.arange(500, dtype=float))
    idx.search(_rows(rng, 1)[0], k=5)          # lazy mirror build
    feats = jnp.asarray(_rows(rng, 300))
    idx.add_batch_device(feats, "b.mp4", np.arange(300, dtype=float))
    assert idx._device_rows == idx._count == 800
    idx.remove_video("a.mp4")
    feats2 = jnp.asarray(_rows(rng, 100))
    idx.add_batch_device(feats2, "c.mp4", np.arange(100, dtype=float))
    spike = np.zeros(512, np.float32)
    spike[7] = 1.0
    idx.add_batch_device(jnp.asarray(spike[None, :] /
                                     np.linalg.norm(spike)),
                         "z.mp4", [9.0])
    res = idx.search(spike, k=1)
    assert res[0]["video_name"] == "z.mp4"
    assert res[0]["timestamp"] == 9.0


def test_stream_codes_id_layout_falls_back(rng, monkeypatch):
    """int8 under the exact-candidate escape hatch (identity layout) has
    no streaming kernel: device appends must route through the host
    quantize path, never materialize a FLOAT mirror that the int8 sync's
    clean-check would then serve as codes (ADVICE r4 #1)."""
    import jax.numpy as jnp
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VQT_CANDIDATE_TOPK", "pallas")
    idx = DeviceVideoIndex(device_dtype="int8")
    assert idx._mirror_layout() == "id"
    rows = _rows(rng, 300)
    idx.add_batch_device(jnp.asarray(rows), "a.mp4",
                         np.arange(300, dtype=float))
    assert idx._device_emb.dtype == jnp.int8
    assert idx._device_scales is not None
    lazy = DeviceVideoIndex(device_dtype="int8")
    lazy.add_batch(rows, "a.mp4", np.arange(300, dtype=float))
    q = _rows(rng, 2)
    _results_equal(idx.search_batch(q, k=10), lazy.search_batch(q, k=10))


def test_remove_then_append_past_old_marks(rng):
    """remove_video compaction must invalidate the arrangement and the
    f32 re-rank store: appends that push the row count back past the
    pre-compaction high-water marks would otherwise make the incremental
    syncs cover only the new tail, leaving stale device bytes on every
    compaction-shifted row (ADVICE r4 #2)."""
    idx = DeviceVideoIndex(device_dtype="int8", device_rerank="on")
    a, b, c = _rows(rng, 600), _rows(rng, 600), _rows(rng, 700)
    idx.add_batch(a, "a.mp4", np.arange(600, dtype=float))
    idx.add_batch(b, "b.mp4", np.arange(600, dtype=float))
    idx.sync_mirror()                       # marks at 1200
    idx.remove_video("a.mp4")               # count 600, rows shifted
    idx.add_batch(c, "c.mp4", np.arange(700, dtype=float))
    idx.sync_mirror()                       # count 1300 > old marks
    n = idx._count
    perm = idx._perm
    host = idx._emb[perm[:n]]
    codes, scales = idx._quantize_host(host)
    np.testing.assert_array_equal(np.asarray(idx._device_emb)[:n], codes)
    np.testing.assert_array_equal(
        np.asarray(idx._device_scales)[:n], scales)
    np.testing.assert_array_equal(np.asarray(idx._device_f32)[:n],
                                  idx._emb[:n])
    assert idx._f32_rows == n


def test_streamed_oversized_batch_falls_back(rng):
    """An append batch larger than the biggest update bucket full-places
    the mirror but stays correct."""
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    idx.add_batch(_rows(rng, 9000), "big.mp4",
                  np.arange(9000, dtype=float))
    idx.sync_mirror()
    idx.add_batch(_rows(rng, 200), "small.mp4",
                  np.arange(200, dtype=float))
    idx.sync_mirror()
    assert idx._device_rows == idx._count == 9200
    lazy = DeviceVideoIndex(device_dtype="bfloat16")
    lazy.add_batch(idx._emb[:9000].copy(), "big.mp4",
                   np.arange(9000, dtype=float))
    lazy.add_batch(idx._emb[9000:9200].copy(), "small.mp4",
                   np.arange(200, dtype=float))
    q = _rows(rng, 2)
    _results_equal(idx.search_batch(q, k=10),
                   lazy.search_batch(q, k=10))
