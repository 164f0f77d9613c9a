"""Fused text-encode + scan search path: one device dispatch per query
(DeviceVideoIndex.search_batch_fused + engine integration). Must return
exactly what the two-step encode → scan path returns."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_quierer_tpu.index.device_index import DeviceVideoIndex


def _toy_encoder(vocab: int = 100, dim: int = 64, seed: int = 0):
    """A jit-able stand-in text tower: ids → mean of an embedding table,
    L2-normalized (same contract as CLIP.encode_text)."""
    table = np.random.default_rng(seed).standard_normal(
        (vocab, dim)).astype(np.float32)

    def encode_fn(params, ids):
        feats = params[ids].mean(axis=1)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    return jnp.asarray(table), encode_fn


def _filled_index(rng, dim=64, n=400, **kw):
    idx = DeviceVideoIndex(dim=dim, **kw)
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    for i in range(n):
        idx.add_frame(emb[i], f"v{i % 5}.mp4", float(i))
    return idx


def test_fused_matches_two_step(rng):
    idx = _filled_index(rng)
    params, encode_fn = _toy_encoder()
    ids = rng.integers(0, 100, (2, 8)).astype(np.int32)
    q = np.asarray(jax.jit(encode_fn)(params, jnp.asarray(ids)))
    want = idx.search_batch(q, k=7)
    got = idx.search_batch_fused(encode_fn, params, ids, k=7)
    assert len(got) == 2
    for g, w in zip(got, want):
        assert [r["frame_id"] for r in g] == [r["frame_id"] for r in w]
        np.testing.assert_allclose([r["score"] for r in g],
                                   [r["score"] for r in w], rtol=1e-5)


def test_fused_on_sharded_mesh(rng):
    from video_quierer_tpu.parallel.mesh import corpus_mesh
    idx = _filled_index(rng, mesh=corpus_mesh(8))
    params, encode_fn = _toy_encoder()
    ids = rng.integers(0, 100, (1, 8)).astype(np.int32)
    q = np.asarray(jax.jit(encode_fn)(params, jnp.asarray(ids)))
    want = idx.search_batch(q, k=5)
    got = idx.search_batch_fused(encode_fn, params, ids, k=5)
    assert [r["frame_id"] for r in got[0]] == \
        [r["frame_id"] for r in want[0]]


def test_fused_on_multislice_mesh(rng):
    from video_quierer_tpu.parallel.mesh import multislice_corpus_mesh
    idx = _filled_index(rng, mesh=multislice_corpus_mesh(2, n_devices=8))
    params, encode_fn = _toy_encoder()
    ids = rng.integers(0, 100, (1, 8)).astype(np.int32)
    q = np.asarray(jax.jit(encode_fn)(params, jnp.asarray(ids)))
    want = idx.search_batch(q, k=5)
    got = idx.search_batch_fused(encode_fn, params, ids, k=5)
    assert [r["frame_id"] for r in got[0]] == \
        [r["frame_id"] for r in want[0]]


def test_fused_int8_matches_two_step(rng):
    """Round-1 VERDICT item 9: the int8 mode must keep the single-dispatch
    fused path (encoder + over-fetching int8 scan fused, f32 re-rank on
    host) and return exactly what the two-step int8 path returns."""
    idx = _filled_index(rng, device_dtype="int8")
    params, encode_fn = _toy_encoder()
    ids = rng.integers(0, 100, (2, 8)).astype(np.int32)
    q = np.asarray(jax.jit(encode_fn)(params, jnp.asarray(ids)))
    want = idx.search_batch(q, k=7)
    got = idx.search_batch_fused(encode_fn, params, ids, k=7)
    assert len(got) == 2
    for g, w in zip(got, want):
        assert [r["frame_id"] for r in g] == [r["frame_id"] for r in w]
        np.testing.assert_allclose([r["score"] for r in g],
                                   [r["score"] for r in w], rtol=1e-5)


def test_fused_int8_matches_f32_ranking(rng):
    """The fused int8 results must agree with the exact f32 index on the
    same corpus (the re-rank restores exact ordering)."""
    idx8 = _filled_index(rng, device_dtype="int8")
    idxf = DeviceVideoIndex(dim=64)
    idxf._emb = idx8._emb.copy()
    n = idx8.count
    idxf._video_ids = idx8._video_ids.copy()
    idxf._timestamps = idx8._timestamps.copy()
    idxf._frame_ids = idx8._frame_ids.copy()
    idxf._video_names = list(idx8._video_names)
    idxf._video_name_to_id = dict(idx8._video_name_to_id)
    idxf._count = n
    params, encode_fn = _toy_encoder()
    ids = rng.integers(0, 100, (1, 8)).astype(np.int32)
    q = np.asarray(jax.jit(encode_fn)(params, jnp.asarray(ids)))
    want = idxf.search_batch(q, k=5)
    got = idx8.search_batch_fused(encode_fn, params, ids, k=5)
    assert [r["frame_id"] for r in got[0]] == \
        [r["frame_id"] for r in want[0]]
    np.testing.assert_allclose([r["score"] for r in got[0]],
                               [r["score"] for r in want[0]], rtol=1e-5)


def test_fused_empty_index():
    idx = DeviceVideoIndex(dim=64)
    params, encode_fn = _toy_encoder()
    out = idx.search_batch_fused(encode_fn, params,
                                 np.zeros((3, 8), np.int32), k=5)
    assert out == [[], [], []]


def test_fused_executable_reuse(rng):
    idx = _filled_index(rng)
    params, encode_fn = _toy_encoder()
    ids = rng.integers(0, 100, (1, 8)).astype(np.int32)
    idx.search_batch_fused(encode_fn, params, ids, k=5)
    assert len(idx._fused_jits) == 1
    idx.search_batch_fused(encode_fn, params, ids, k=5)
    assert len(idx._fused_jits) == 1  # same (encoder, k) → cached
    idx.search_batch_fused(encode_fn, params, ids, k=9)
    assert len(idx._fused_jits) == 2


def test_embedder_text_encode_fn_identity_stable():
    """text_encode_fn must be the SAME object across accesses — fused
    executables (and jax.jit's cache) key on its identity; a fresh bound
    method per access would recompile every query."""
    from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
    emb = CLIPEmbedder(seed=0)
    assert emb.text_encode_fn is emb.text_encode_fn


@pytest.mark.slow
def test_engine_fused_path_with_real_clip(rng, tmp_path, monkeypatch):
    """End-to-end: the engine takes the fused path with a real CLIP
    embedder and returns the same results as the two-step path."""
    from video_quierer_tpu.engine import (ApiConfig, EngineConfig,
                                          VideoSearchEngine)
    from tests.helpers import make_synthetic_video
    vids = tmp_path / "videos"
    vids.mkdir()
    make_synthetic_video(vids / "a.mp4", n_frames=40)
    cfg = EngineConfig(api=ApiConfig(max_frames=8, sampling_mode="high",
                                     cache_search=False))
    eng = VideoSearchEngine(str(vids), config=cfg)
    eng.startup()
    fused, _ = eng.search_ex("a red scene", k=4)
    assert fused  # fused path produced rows
    assert eng.metrics.counter("fused_search_fallbacks") == 0
    monkeypatch.setenv("VQT_FUSED_SEARCH", "0")
    twostep, _ = eng.search_ex("a red scene", k=4)
    assert [r["frame_id"] for r in fused] == \
        [r["frame_id"] for r in twostep]
    np.testing.assert_allclose([r["score"] for r in fused],
                               [r["score"] for r in twostep], rtol=1e-4)
