"""packb2's exactness tail is FETCH-INDEPENDENT (round-5 closure).

Round-4 VERDICT item 3 proposed "packb2 + a deepened fetch to restore
the recall bar" — the trade the int4 tier makes. That hypothesis is
structurally wrong for packb2: its level-1 fold collapses each group of
8 mirror rows to its single maximum BEFORE the selection rounds
(ops/topk.py:_bucket_select_cols2), so a same-group runner-up is
discarded in-kernel — deeper fetch or more rounds only select over the
already-folded group surface and can never return it. (The int4 tier's
loss mode is candidate-RANK noise, which deeper fetch does absorb;
packb2's is candidate DELETION.)

These tests pin that structural property with a constructed collision:
two top-2 rows planted in one fold group ({p, p + blk/8} — the spaced
partition the contiguous-half fold produces). packb returns both at any
fetch; packb2 returns exactly one at EVERY fetch/rounds setting. This
is why packb2 stays an opt-in speed knob (VQT_CAND_SELECT=packb2,
~4% scan time for a ~1.5e-4/query top-10 tail at 2M rows) rather than
the default: no fetch policy can buy the exactness back.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from video_quierer_tpu.ops import topk as topk_mod


N = topk_mod.CAND_BLOCK_ROWS          # one candidate block (4096)
NG = N // 8                           # fold-group spacing (blk/8)
D = 512


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("VQT_CANDIDATE_TOPK", raising=False)
    monkeypatch.setattr(topk_mod, "FUSED_MIN_B", 1)


def _collision_corpus(rng):
    """Unit rows with the true top-2 planted in ONE fold group
    (mirror rows 0 and NG), everything else well below."""
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    emb *= 0.1                                     # depress the field
    v = rng.standard_normal(D).astype(np.float32)
    v /= np.linalg.norm(v)
    u = rng.standard_normal(D).astype(np.float32)
    u -= (u @ v) * v
    u /= np.linalg.norm(u)
    emb[0] = v                                     # score 1.0
    emb[NG] = 0.9 * v + np.sqrt(1 - 0.81) * u      # score 0.9, rank 2
    return emb, v


def _candidates(emb, q, select, rounds, fetch, monkeypatch):
    monkeypatch.setenv("VQT_CAND_SELECT", select)
    monkeypatch.setattr(topk_mod, "CAND_ROUNDS", rounds)
    perm = jnp.arange(N, dtype=jnp.int32)          # identity layout
    _, idxs = topk_mod.candidate_topk(
        jnp.asarray(emb, jnp.bfloat16), jnp.asarray(q[None, :]),
        jnp.int32(N), k=fetch, perm=perm, prefix=True, live=N)
    return set(np.asarray(idxs)[0].tolist())


def test_packb_returns_both_collided_rows(interpret, monkeypatch):
    emb, q = _collision_corpus(np.random.default_rng(0))
    cands = _candidates(emb, q, "packb", 2, 8, monkeypatch)
    assert {0, NG} <= cands


@pytest.mark.parametrize("rounds,fetch", [(2, 8), (4, 16), (8, 32)])
def test_packb2_drops_group_runner_up_at_any_fetch(
        interpret, monkeypatch, rounds, fetch):
    """The planted runner-up is missing from packb2's candidates at
    EVERY fetch/rounds depth — the deletion happens at the fold, before
    selection. (If a future packb2 variant keeps >=2 survivors per
    group, this test should start failing on the deepest setting and
    the default can be revisited.)"""
    emb, q = _collision_corpus(np.random.default_rng(0))
    cands = _candidates(emb, q, "packb2", rounds, fetch, monkeypatch)
    got = {0, NG} & cands
    assert len(got) == 1, (
        "expected exactly one of the collided pair to survive the "
        f"group fold, got {sorted(got)} among {len(cands)} candidates")


def test_packb2_keeps_cross_group_near_ties(interpret, monkeypatch):
    """Control: the same two rows placed in DIFFERENT fold groups are
    both returned — the tail is specifically same-group collision."""
    emb, q = _collision_corpus(np.random.default_rng(0))
    emb[1] = emb[NG].copy()                        # runner-up now in
    emb[NG] = 0.05 * emb[0]                        # group e=1
    cands = _candidates(emb, q, "packb2", 2, 8, monkeypatch)
    assert {0, 1} <= cands
