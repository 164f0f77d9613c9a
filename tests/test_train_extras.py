"""Trainer upgrades: LR schedules, gradient clipping, EMA params, and
validation retrieval metrics. (No reference analog — the reference has no
training at all, SURVEY.md §2.3.)"""

import numpy as np
import jax
import pytest

from tests.test_train import TINY, _batch
from video_quierer_tpu.train import (
    CLIPTrainer,
    build_lr_schedule,
    evaluate_trainer,
    retrieval_metrics,
)
from video_quierer_tpu.train.eval import _ranks


def test_cosine_schedule_shape():
    s = build_lr_schedule(1e-3, "cosine", warmup_steps=10, total_steps=100)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(55)) < 1e-3
    assert float(s(100)) == pytest.approx(0.0, abs=1e-9)


def test_constant_schedule_with_warmup():
    s = build_lr_schedule(1e-3, "constant", warmup_steps=4)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(2)) == pytest.approx(5e-4)
    assert float(s(4)) == float(s(1000)) == pytest.approx(1e-3)


def test_cosine_requires_total_steps():
    with pytest.raises(ValueError, match="total_steps"):
        build_lr_schedule(1e-3, "cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        build_lr_schedule(1e-3, "nope")


def test_trainer_current_lr_follows_schedule(rng):
    t = CLIPTrainer(TINY, learning_rate=1e-3, schedule="cosine",
                    warmup_steps=1, total_steps=4)
    assert t.current_lr() == pytest.approx(0.0)
    images, ids = _batch(rng)
    t.step(images, ids)
    assert t.current_lr() == pytest.approx(1e-3)
    t.step(images, ids)
    assert 0.0 < t.current_lr() < 1e-3


def test_grad_clipping_steps(rng):
    t = CLIPTrainer(TINY, learning_rate=1e-3, max_grad_norm=0.5)
    images, ids = _batch(rng)
    l0 = t.step(images, ids)
    l1 = t.step(images, ids)
    assert np.isfinite(l0) and np.isfinite(l1)


def test_ema_tracks_params(rng):
    t = CLIPTrainer(TINY, learning_rate=1e-2, ema_decay=0.9, seed=5)
    p0 = jax.tree.map(np.asarray, t.state.params)
    images, ids = _batch(rng)
    t.step(images, ids)
    t.step(images, ids)
    leaf = lambda tree: np.asarray(  # noqa: E731
        tree["vision"]["embeddings"]["patch"]["kernel"]
        if "vision" in tree else next(iter(tree.values())))
    live = jax.tree.leaves(t.state.params)[0]
    ema = jax.tree.leaves(t.state.ema_params)[0]
    init = jax.tree.leaves(p0)[0]
    live, ema, init = map(np.asarray, (live, ema, init))
    assert not np.allclose(live, ema)          # EMA lags the live weights
    assert not np.allclose(ema, init)          # but it did move
    # EMA lies between init and live (element-wise blend of the history)
    d_live = np.abs(ema - live).mean()
    d_init = np.abs(live - init).mean()
    assert d_live < d_init
    # serving_params returns the EMA tree
    sp = jax.tree.leaves(t.serving_params)[0]
    assert np.allclose(np.asarray(sp), ema)


def test_serving_params_without_ema(rng):
    t = CLIPTrainer(TINY, learning_rate=1e-3)
    assert t.state.ema_params is None
    assert t.serving_params is t.state.params


def test_ema_on_mesh(rng):
    from video_quierer_tpu.parallel.mesh import data_mesh
    mesh = data_mesh()
    t = CLIPTrainer(TINY, mesh=mesh, learning_rate=1e-3, ema_decay=0.8)
    images, ids = _batch(rng)
    loss = t.step(images, ids)
    assert np.isfinite(loss)
    assert t.state.ema_params is not None


def test_ranks_pessimistic_ties():
    sim = np.array([[1.0, 1.0, 0.0],
                    [0.0, 0.5, 0.2],
                    [0.9, 0.8, 0.1]])
    r = _ranks(sim)
    assert r[0] == 1  # tie with column 1 counts against the match
    assert r[1] == 0
    assert r[2] == 2


def test_retrieval_metrics_end_to_end(rng):
    t = CLIPTrainer(TINY, learning_rate=1e-3, ema_decay=0.99)
    images, ids = _batch(rng, b=10)
    m = evaluate_trainer(t, images, ids, ks=(1, 5), batch_size=4)
    for key in ("i2t_recall@1", "i2t_recall@5", "t2i_recall@1",
                "t2i_recall@5", "i2t_median_rank", "t2i_median_rank"):
        assert key in m
        assert np.isfinite(m[key])
    assert 0.0 <= m["i2t_recall@1"] <= m["i2t_recall@5"] <= 1.0
    assert 1.0 <= m["i2t_median_rank"] <= 10.0


def test_retrieval_metrics_validates_pairing(rng):
    t = CLIPTrainer(TINY)
    images, ids = _batch(rng, b=4)
    with pytest.raises(ValueError, match="1:1"):
        retrieval_metrics(t.model, t.state.params, images, ids[:3])
    assert retrieval_metrics(t.model, t.state.params,
                             images[:0], ids[:0]) == {}


@pytest.mark.slow
def test_checkpoint_roundtrip_with_ema(rng, tmp_path):
    from video_quierer_tpu.train.checkpoint import (restore_checkpoint,
                                                    save_checkpoint)
    t = CLIPTrainer(TINY, learning_rate=1e-3, ema_decay=0.9, seed=7)
    images, ids = _batch(rng)
    t.step(images, ids)
    save_checkpoint(tmp_path, t, step=1)
    t2 = CLIPTrainer(TINY, learning_rate=1e-3, ema_decay=0.9, seed=99)
    step = restore_checkpoint(tmp_path, t2)
    assert step == 1
    a = jax.tree.leaves(t.state.ema_params)[0]
    b = jax.tree.leaves(t2.state.ema_params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))
