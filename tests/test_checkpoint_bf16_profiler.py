"""Tests: orbax training checkpoints, bf16 index mode, profiler endpoints."""

import numpy as np
import pytest
import requests

from tests.test_train import TINY, _batch
from video_quierer_tpu.index.device_index import DeviceVideoIndex
from video_quierer_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from video_quierer_tpu.train.trainer import CLIPTrainer


# -- checkpoints -----------------------------------------------------------

def test_checkpoint_roundtrip(tmp_path, rng):
    t1 = CLIPTrainer(TINY, learning_rate=1e-3, seed=1)
    images, ids = _batch(rng)
    for _ in range(3):
        t1.step(images, ids)
    save_checkpoint(tmp_path, t1, step=3)
    assert latest_step(tmp_path) == 3

    t2 = CLIPTrainer(TINY, learning_rate=1e-3, seed=999)  # different init
    step = restore_checkpoint(tmp_path, t2)
    assert step == 3
    # identical params → identical next loss
    l1 = t1.step(images, ids)
    l2 = t2.step(images, ids)
    assert abs(l1 - l2) < 1e-6


def test_restore_missing_raises(tmp_path):
    t = CLIPTrainer(TINY)
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(tmp_path / "none", t)


# -- bf16 index ------------------------------------------------------------

def test_bf16_index_recall(rng):
    embs = rng.standard_normal((2000, 512)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=-1, keepdims=True)
    ts = np.arange(2000, dtype=float)

    f32 = DeviceVideoIndex()
    f32.add_batch(embs, "v.mp4", ts)
    bf16 = DeviceVideoIndex(device_dtype="bfloat16")
    bf16.add_batch(embs, "v.mp4", ts)

    hits = 0
    for i in range(20):
        q = embs[i * 37] + 0.05 * rng.standard_normal(512).astype(
            np.float32)
        top_f32 = {r["frame_id"] for r in f32.search(q, k=10)}
        top_bf16 = {r["frame_id"] for r in bf16.search(q, k=10)}
        hits += len(top_f32 & top_bf16)
        # the actual nearest frame must be found in both
        assert bf16.search(q, k=1)[0]["frame_id"] == i * 37
    assert hits / (20 * 10) > 0.9  # recall@10 vs f32


def test_bf16_pickle_stays_f32(tmp_path, rng):
    idx = DeviceVideoIndex(device_dtype="bfloat16")
    idx.add_batch(rng.standard_normal((3, 512)).astype(np.float32),
                  "v.mp4", [0.0, 1.0, 2.0])
    p = tmp_path / "c.pkl"
    idx.save_to_disk(p)
    import pickle
    raw = pickle.loads(p.read_bytes())
    assert raw["embeddings"][0].dtype == np.float32


def test_bad_dtype_rejected():
    with pytest.raises(ValueError):
        DeviceVideoIndex(device_dtype="float64")


# -- profiler endpoints ----------------------------------------------------

def test_profiler_endpoints(tmp_path):
    # reuse the API server fixture machinery inline (small scope)
    import asyncio
    import threading
    from aiohttp import web as aioweb
    from tests.fake_embedder import FakeEmbedder
    from video_quierer_tpu.api.app import create_app
    from video_quierer_tpu.engine import VideoSearchEngine, EngineConfig

    eng = VideoSearchEngine(str(tmp_path / "videos"),
                            config=EngineConfig(),
                            embedder=FakeEmbedder())
    app = create_app(engine=eng, config_path=tmp_path / "cfg.json",
                     static_dir=tmp_path, run_startup=False)
    loop = asyncio.new_event_loop()
    state = {}
    ready = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def boot():
            runner = aioweb.AppRunner(app)
            await runner.setup()
            site = aioweb.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            state["port"] = site._server.sockets[0].getsockname()[1]
        loop.run_until_complete(boot())
        ready.set()
        loop.run_forever()

    threading.Thread(target=run, daemon=True).start()
    assert ready.wait(15)
    base = f"http://127.0.0.1:{state['port']}"
    trace_dir = str(tmp_path / "trace")
    r = requests.post(base + "/api/profiler/start",
                      json={"trace_dir": trace_dir})
    assert r.status_code == 200, r.text
    # generate some device work to trace
    import jax.numpy as jnp
    (jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    r2 = requests.post(base + "/api/profiler/stop")
    assert r2.status_code == 200
    from pathlib import Path
    assert any(Path(trace_dir).rglob("*"))  # trace artifacts exist
    # double stop → clean 409
    assert requests.post(base + "/api/profiler/stop").status_code == 409
    loop.call_soon_threadsafe(loop.stop)
