"""Fused transformer-layer text tower (ops/fused_layer.py) vs the flax
tower (models/clip/model.py:TextTower) — the unfused path is the oracle.

The fused path rebuilds the text half of the reference's CLIP encode
(`_encode_clip_text`, /root/reference/video_search_overhaul.py:278-295)
as one pallas_call per encoder block. Interpreter mode exercises the
exact kernel logic on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_quierer_tpu.models.clip.config import CLIPConfig, CLIPTextConfig
from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
from video_quierer_tpu.models.clip.model import CLIP, init_params
from video_quierer_tpu.ops.fused_layer import (
    fused_seq_eligible,
    fused_text_encode,
    fused_text_tower_eligible,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")


def _small_cfg():
    # a 128-wide 2-layer tower keeps the interpreter fast while hitting
    # every kernel feature (multi-head lane slices, causal mask, MLP)
    return CLIPConfig(
        name="test-small",
        projection_dim=64,
        text=CLIPTextConfig(vocab_size=512, context_length=32,
                            hidden_size=128, num_layers=2, num_heads=2),
    )


def _ids(rng, b, s, vocab):
    # ascending-ish ids with the max (EOT analog) at a random position
    ids = rng.integers(1, vocab - 2, size=(b, s))
    eot = rng.integers(s // 2, s, size=b)
    for i in range(b):
        ids[i, eot[i]] = vocab - 1
        ids[i, eot[i] + 1:] = 0
    return ids.astype(np.int32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("s", [8, 16])
def test_fused_matches_flax_tower(rng, dtype, s, monkeypatch):
    if dtype == jnp.float32:
        # f32 exceeds the default weight budget by design; raise it so
        # the exact-math parity case runs
        monkeypatch.setenv("VQT_FUSED_LAYER_BUDGET", str(64 * 2 ** 20))
    cfg = _small_cfg()
    assert fused_text_tower_eligible(cfg.text, dtype)
    model = CLIP(cfg, dtype=dtype)
    params = init_params(model, seed=0)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    ids = jnp.asarray(_ids(rng, 4, s, cfg.text.vocab_size))
    ref = np.asarray(model.apply({"params": params}, ids,
                                 method=CLIP.encode_text))
    got = np.asarray(fused_text_encode(params, ids, cfg=cfg, dtype=dtype))
    assert got.shape == ref.shape
    assert not np.isnan(got).any()
    cos = np.sum(got * ref, axis=-1)
    if dtype == jnp.float32:
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    else:
        # bf16 towers: fused LN keeps f32 stats like flax, but rounding
        # points differ — unit rows must still agree tightly
        assert cos.min() > 0.999
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               rtol=1e-5)


def test_uneven_batch_tile(rng, monkeypatch):
    # B=3 forces bt=1 (and B=6 bt with s=16 → token target clamps)
    monkeypatch.setenv("VQT_FUSED_LAYER_BUDGET", str(64 * 2 ** 20))
    cfg = _small_cfg()
    model = CLIP(cfg, dtype=jnp.float32)
    params = init_params(model, seed=1)
    ids = jnp.asarray(_ids(rng, 3, 16, cfg.text.vocab_size))
    ref = np.asarray(model.apply({"params": params}, ids,
                                 method=CLIP.encode_text))
    got = np.asarray(fused_text_encode(params, ids, cfg=cfg,
                                       dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_eligibility_gates(monkeypatch):
    from video_quierer_tpu.models.clip.config import (get_config,
                                                      CLIPVisionConfig)
    from video_quierer_tpu.ops.fused_layer import (
        _layer_mode, fused_batch_eligible, fused_vision_tower_eligible)
    cfg = _small_cfg()
    # seq buckets: 77 (non-multiple of 8) falls back
    assert fused_seq_eligible(8) and fused_seq_eligible(32)
    assert not fused_seq_eligible(77)
    # env escape hatch
    monkeypatch.setenv("VQT_FUSED_LAYER", "0")
    assert not fused_text_tower_eligible(cfg.text, jnp.bfloat16)
    monkeypatch.delenv("VQT_FUSED_LAYER")
    # data meshes serve fused via shard_map; the GPipe tower keeps its
    # own stage-sharded path
    devs = np.array(jax.devices()[:2])
    from jax.sharding import Mesh
    assert fused_text_tower_eligible(
        cfg.text, jnp.bfloat16, Mesh(devs, ("data",)))
    assert not fused_text_tower_eligible(
        cfg.text, jnp.bfloat16, Mesh(devs, ("pipe",)))
    # the real b32 text tower: full-layer fusion in bf16; f32 doubles
    # the weight set past the full budget but the halves fit → split
    real = CLIPTextConfig()
    assert fused_text_tower_eligible(real, jnp.bfloat16)
    assert _layer_mode(real.hidden_size, real.mlp_ratio,
                       jnp.bfloat16) == "full"
    assert fused_text_tower_eligible(real, jnp.float32)
    assert _layer_mode(real.hidden_size, real.mlp_ratio,
                       jnp.float32) == "split"
    # the 768-wide B/32 vision tower: split mode in bf16
    b32v = get_config("openai/clip-vit-base-patch32").vision
    assert fused_vision_tower_eligible(b32v, jnp.bfloat16)
    assert _layer_mode(b32v.hidden_size, b32v.mlp_ratio,
                       jnp.bfloat16) == "split"
    # L/14 vision (1024-wide): MLP half exceeds even the half budget
    l14v = get_config("openai/clip-vit-large-patch14").vision
    assert not fused_vision_tower_eligible(l14v, jnp.bfloat16)
    # MoE towers keep the flax encoder
    moev = CLIPVisionConfig(hidden_size=768, moe_experts=4)
    assert not fused_vision_tower_eligible(moev, jnp.bfloat16)
    # per-call gates: image buckets tile at s=50 (bt=8 → t=400); the
    # B/16 seq of 197 has no sublane-multiple tile; tiny batches stay
    # on the flax tower (MIN_TOKENS)
    assert fused_batch_eligible(256, 50)
    assert not fused_batch_eligible(256, 197)
    assert not fused_batch_eligible(1, 16)
    # dtype-aware: f32 halves the token target, so a shape that tiles
    # in bf16 (s=196 → bt=2, t=392) has NO f32 tile — the gate must
    # reject it rather than let the encode divide by a zero tile
    assert fused_batch_eligible(32, 196, jnp.bfloat16)
    assert not fused_batch_eligible(32, 196, jnp.float32)


def _small_vision_cfg():
    from video_quierer_tpu.models.clip.config import CLIPVisionConfig
    # 32px/8px patches → seq 17 (16 patches + CLS): exercises the
    # non-power-of-two, non-sublane-multiple seq path (tile = 8·17)
    return CLIPConfig(
        name="test-small-v",
        projection_dim=64,
        vision=CLIPVisionConfig(image_size=32, patch_size=8,
                                hidden_size=128, num_layers=2,
                                num_heads=2),
        text=CLIPTextConfig(vocab_size=512, context_length=32,
                            hidden_size=128, num_layers=2, num_heads=2),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_vision_matches_flax_tower(rng, dtype):
    from video_quierer_tpu.ops.fused_layer import (
        fused_vision_encode, fused_vision_tower_eligible)
    cfg = _small_vision_cfg()
    assert fused_vision_tower_eligible(cfg.vision, dtype)
    model = CLIP(cfg, dtype=dtype)
    params = init_params(model, seed=2)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    pixels = jnp.asarray(rng.standard_normal((8, 32, 32, 3))
                         .astype(np.float32))
    ref = np.asarray(model.apply({"params": params}, pixels,
                                 method=CLIP.encode_image))
    got = np.asarray(fused_vision_encode(params, pixels, cfg=cfg,
                                         dtype=dtype))
    assert got.shape == ref.shape
    assert not np.isnan(got).any()
    if dtype == jnp.float32:
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    else:
        assert np.sum(got * ref, axis=-1).min() > 0.999
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               rtol=1e-5)


def test_split_mode_matches_full(rng, monkeypatch):
    """Force split mode (full budget below the layer's weight bytes) —
    the two-pallas_call path must match the flax tower exactly in f32."""
    monkeypatch.setenv("VQT_FUSED_LAYER_BUDGET", "400000")
    import importlib
    import video_quierer_tpu.ops.fused_layer as fl
    importlib.reload(fl)
    try:
        cfg = _small_vision_cfg()
        assert fl._layer_mode(cfg.vision.hidden_size,
                              cfg.vision.mlp_ratio,
                              jnp.float32) == "split"
        model = CLIP(cfg, dtype=jnp.float32)
        params = init_params(model, seed=3)
        pixels = jnp.asarray(rng.standard_normal((8, 32, 32, 3))
                             .astype(np.float32))
        ref = np.asarray(model.apply({"params": params}, pixels,
                                     method=CLIP.encode_image))
        got = np.asarray(fl.fused_vision_encode(params, pixels, cfg=cfg,
                                                dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    finally:
        monkeypatch.delenv("VQT_FUSED_LAYER_BUDGET")
        importlib.reload(fl)


def _small_siglip_cfg():
    from video_quierer_tpu.models.siglip.model import (
        SigLIPConfig, SigLIPTextConfig, SigLIPVisionConfig)
    return SigLIPConfig(
        name="test-small-siglip",
        vision=SigLIPVisionConfig(image_size=32, patch_size=8,
                                  hidden_size=128, num_layers=2,
                                  num_heads=2),
        text=SigLIPTextConfig(vocab_size=256, context_length=16,
                              hidden_size=128, num_layers=2,
                              num_heads=2),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_siglip_matches_flax(rng, dtype):
    """The SigLIP TEXT tower (non-causal, gelu_tanh, last-token
    pooling) through the fused-layer kernels vs the flax oracle. The
    fused VISION twin was deleted in round 4 — measured slower than
    flax in every configuration (models/siglip/fused.py)."""
    from video_quierer_tpu.models.siglip.fused import (
        fused_siglip_text_encode)
    from video_quierer_tpu.models.siglip.model import (
        SigLIP, siglip_init_params)
    cfg = _small_siglip_cfg()
    model = SigLIP(cfg, dtype=dtype)
    params = siglip_init_params(model, seed=4)
    if dtype == jnp.bfloat16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    ids = jnp.asarray(
        rng.integers(1, cfg.text.vocab_size - 1,
                     size=(8, cfg.text.context_length)).astype(np.int32))
    ref = np.asarray(model.apply({"params": params}, ids,
                                 method=SigLIP.encode_text))
    got = np.asarray(fused_siglip_text_encode(params, ids, cfg=cfg,
                                              dtype=dtype))
    assert got.shape == ref.shape and not np.isnan(got).any()
    if dtype == jnp.float32:
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)
    else:
        assert np.sum(got * ref, axis=-1).min() > 0.999
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0,
                               rtol=1e-5)


def test_siglip_real_width_split_eligible():
    """The real SigLIP towers (768-wide) are fused-eligible via SPLIT
    mode in bf16, and the per-call gates admit the serving buckets."""
    from video_quierer_tpu.models.siglip.model import siglip_base_patch16
    from video_quierer_tpu.ops.fused_layer import (
        _layer_mode, fused_batch_eligible, fused_text_tower_eligible,
        fused_vision_tower_eligible)
    cfg = siglip_base_patch16()
    assert fused_text_tower_eligible(cfg.text, jnp.bfloat16)
    assert fused_vision_tower_eligible(cfg.vision, jnp.bfloat16)
    assert _layer_mode(768, 4, jnp.bfloat16) == "split"
    # text context 64: batches >= 4 clear MIN_TOKENS; image buckets
    # tile at s=196 (bt=2 -> t=392)
    assert fused_batch_eligible(8, 64)
    assert not fused_batch_eligible(1, 64)
    assert fused_batch_eligible(32, 196)


def test_shard_map_vision_wrapper(rng):
    """The 4-D (NHWC) shard_map wrapper: fused vision encode per data
    shard == the direct call."""
    from jax.sharding import Mesh
    from video_quierer_tpu.ops.fused_layer import (
        fused_encode_shard_map, fused_vision_encode)
    cfg = _small_vision_cfg()
    model = CLIP(cfg, dtype=jnp.float32)
    params = init_params(model, seed=5)
    # s=17 tiles only at bt=8, so each shard needs >= 8 items — 16
    # items over a 2-device mesh (the embedder's _fused_shard_ok gates
    # exactly this per-shard eligibility)
    pixels = jnp.asarray(rng.standard_normal((16, 32, 32, 3))
                         .astype(np.float32))
    direct = np.asarray(fused_vision_encode(params, pixels, cfg=cfg,
                                            dtype=jnp.float32))
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    fn = fused_encode_shard_map(
        lambda p, px: fused_vision_encode(p, px, cfg=cfg,
                                          dtype=jnp.float32),
        mesh, "data", in_ndim=4)
    got = np.asarray(fn(params, pixels))
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-5)


def test_run_layers_rejects_overbudget(monkeypatch, rng):
    """Weights fitting neither budget must fail loudly, not launch
    over-budget kernels into an opaque Mosaic VMEM error."""
    monkeypatch.setenv("VQT_FUSED_LAYER_BUDGET", "1")
    monkeypatch.setenv("VQT_FUSED_HALF_BUDGET", "1")
    import importlib
    import video_quierer_tpu.ops.fused_layer as fl
    importlib.reload(fl)
    try:
        cfg = _small_cfg()
        model = CLIP(cfg, dtype=jnp.float32)
        params = init_params(model, seed=6)
        ids = jnp.asarray(_ids(rng, 4, 16, cfg.text.vocab_size))
        with pytest.raises(ValueError, match="exceed both"):
            fl.fused_text_encode(params, ids, cfg=cfg, dtype=jnp.float32)
    finally:
        monkeypatch.delenv("VQT_FUSED_LAYER_BUDGET")
        monkeypatch.delenv("VQT_FUSED_HALF_BUDGET")
        importlib.reload(fl)


def test_embedder_mesh_fused_parity(monkeypatch):
    """DP-mesh serving routes fused encodes per data-shard via
    shard_map (params replicated) — outputs must match the meshless
    flax tower. MIN_TOKENS is lowered so the 8-way shard split stays
    eligible at a test-sized batch."""
    import video_quierer_tpu.ops.fused_layer as fl
    from jax.sharding import Mesh
    monkeypatch.setattr(fl, "MIN_TOKENS", 1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    emb_m = CLIPEmbedder(model_name="openai/clip-vit-base-patch32",
                         dtype=jnp.bfloat16, mesh=mesh)
    assert emb_m._fused_text
    texts = [f"shard parity text {i}" for i in range(32)]
    got = emb_m.embed_texts(texts)
    monkeypatch.setenv("VQT_FUSED_LAYER", "0")
    emb0 = CLIPEmbedder(model_name="openai/clip-vit-base-patch32",
                        dtype=jnp.bfloat16)
    ref = emb0.embed_texts(texts)
    assert np.sum(got * ref, axis=-1).min() > 0.999


def test_embedder_uses_fused_path(rng, monkeypatch):
    """End to end through CLIPEmbedder.embed_texts: fused on, fused off
    and the flax tower agree (the embedder is what serving calls)."""
    emb = CLIPEmbedder(model_name="openai/clip-vit-base-patch32",
                       dtype=jnp.bfloat16)
    assert emb._fused_text and emb._fused_vision
    # 32 short texts → bucket 32 × seq 8 = 256 tokens: clears the
    # MIN_TOKENS gate so the fused tower actually engages
    texts = [f"a cat on skateboard number {i}" for i in range(32)]
    fused = emb.embed_texts(texts)
    monkeypatch.setenv("VQT_FUSED_LAYER", "0")
    emb2 = CLIPEmbedder(model_name="openai/clip-vit-base-patch32",
                        dtype=jnp.bfloat16)
    assert not (emb2._fused_text or emb2._fused_vision)
    ref = emb2.embed_texts(texts)
    cos = np.sum(fused * ref, axis=-1)
    assert cos.min() > 0.999


def test_vision_pad_scheme_identical_outputs(rng, monkeypatch):
    """Pad-token scheme (round-4 VERDICT item 2): padded fused vision
    must produce outputs IDENTICAL to the unpadded fused run — masked
    pad columns contribute exp(-inf)=0 to the f32 accumulate, and pads
    attend only themselves (unique negative ids), so real-token rows
    never see them."""
    import video_quierer_tpu.ops.fused_layer as fl
    cfg = _small_vision_cfg()          # seq 17: pads to 24
    model = CLIP(cfg, dtype=jnp.float32)
    params = init_params(model, seed=3)
    pixels = jnp.asarray(rng.standard_normal((8, 32, 32, 3))
                         .astype(np.float32))
    monkeypatch.delenv("VQT_FUSED_VISION_PAD", raising=False)
    assert fl.fused_vision_seq(17) == 17   # pad is opt-in (measured)
    unpadded = np.asarray(fl.fused_vision_encode(
        params, pixels, cfg=cfg, dtype=jnp.float32))
    monkeypatch.setenv("VQT_FUSED_VISION_PAD", "1")
    assert fl.fused_vision_seq(17) == 24
    padded = np.asarray(fl.fused_vision_encode(
        params, pixels, cfg=cfg, dtype=jnp.float32))
    assert not np.isnan(padded).any()
    np.testing.assert_allclose(padded, unpadded, rtol=1e-6, atol=1e-6)


def test_vision_pad_policy(monkeypatch):
    """Padding is OPT-IN (measured losing/even where it changes the
    tile — fused_vision_seq docstring records the same-session A/B):
    default keeps the raw sequence; VQT_FUSED_VISION_PAD=1 pads to the
    next sublane multiple, which legalizes tiles s=197 lacks."""
    from video_quierer_tpu.ops.fused_layer import (fused_batch_eligible,
                                                   fused_vision_seq)
    monkeypatch.delenv("VQT_FUSED_VISION_PAD", raising=False)
    assert fused_vision_seq(197) == 197    # default: no pad
    assert fused_vision_seq(50) == 50
    assert not fused_batch_eligible(256, 197)
    monkeypatch.setenv("VQT_FUSED_VISION_PAD", "1")
    assert fused_vision_seq(197) == 200
    assert fused_batch_eligible(256, fused_vision_seq(197))
    assert fused_vision_seq(50) == 56
    assert fused_vision_seq(196) == 200
    assert fused_vision_seq(64) == 64      # aligned: never padded


def test_min_tokens_policy():
    """Round-4 VERDICT item 6: the B=1 fused-text split is ONE policy —
    the MIN_TOKENS gate (fused_layer.py documents the measured
    crossover and why no small-batch kernel variant can win). This pins
    both sides of the boundary: singles at every text bucket route to
    the flax tower; serving batches route fused."""
    from video_quierer_tpu.ops.fused_layer import (MIN_TOKENS,
                                                   fused_batch_eligible)
    assert MIN_TOKENS == 256           # the measured crossover knob
    for s in (8, 16, 32):              # text seq buckets
        assert not fused_batch_eligible(1, s)      # singles → flax
        assert fused_batch_eligible(MIN_TOKENS // s, s)   # batch → fused
    # boundary exactness: one token short of the gate stays flax
    assert not fused_batch_eligible(15, 16)
    assert fused_batch_eligible(16, 16)


def test_mixed_attn_mlp_tiles_match_flax(rng, monkeypatch):
    """Split mode with DIFFERENT attn/MLP tiles (the B/32-vision
    mixed-tile config, round-5: attn t=200 / mlp t=400) must match the
    flax tower exactly — the tile partition never changes the math."""
    import video_quierer_tpu.ops.fused_layer as fl
    monkeypatch.setenv("VQT_PALLAS_INTERPRET", "1")
    # force split mode for the small tower and distinct tiles
    monkeypatch.setattr(fl, "WEIGHT_BUDGET", 1)
    monkeypatch.setattr(fl, "HALF_BUDGET", 10 * 2 ** 20)
    # s=17 (16 patches + CLS, f32): bt must be a multiple of 8 —
    # targets chosen so MLP tiles at bt=16 (t=272) and attn at bt=8
    # (t=136), proving the halves really run on different grids
    monkeypatch.setattr(fl, "TOKEN_TARGET", 1100)
    monkeypatch.setattr(fl, "ATTN_TOKEN_TARGET", 300)
    cfg = _small_vision_cfg()
    model = CLIP(cfg, dtype=jnp.float32)
    params = init_params(model, seed=3)
    b, s = 16, cfg.vision.seq_len
    t = fl._tile_tokens(b, s, 4)
    t_attn = fl._tile_tokens(b, s, 4, token_target=300)
    assert t == 272 and t_attn == 136    # the mixed path is exercised
    pixels = jnp.asarray(rng.standard_normal((b, 32, 32, 3))
                         .astype(np.float32))
    ref = np.asarray(model.apply({"params": params}, pixels,
                                 method=CLIP.encode_image))
    got = np.asarray(fl.fused_vision_encode(params, pixels, cfg=cfg,
                                            dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
