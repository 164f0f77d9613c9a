"""Real-checkpoint path hardening (round-2 VERDICT item 8).

Two tiers:

1. **Structural fixtures (always run)** — a byte-faithful HF checkpoint
   directory (``model.safetensors`` / ``pytorch_model.bin`` with the HF
   CLIP state-dict names, ``vocab.json`` + ``merges.txt`` in the real HF
   format incl. the ``#version`` header) must load end-to-end through
   ``find_local_checkpoint`` → ``convert_hf_checkpoint`` →
   ``CLIPEmbedder``. This pins the exact file layout the operator drops
   in, with no network (reference loads the same artifacts live:
   video_search_overhaul.py:127-130).

2. **Real-weights smoke (gated)** — runs only when
   ``VQT_CLIP_CHECKPOINT`` names a directory with real OpenAI weights
   (zero-egress CI skips it; on a weights-capable host it is one
   command: ``VQT_CLIP_CHECKPOINT=... pytest tests/test_real_checkpoint.py``).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from video_quierer_tpu.models.clip.config import (
    CLIPConfig, CLIPTextConfig, CLIPVisionConfig, register_config)

TINY_HF = "hf-fixture-tiny"
_VIS = dict(hidden=16, layers=2, heads=2, patch=16, image=32)
# ctx must be 77: the checkpoint's tokenizer pads to CLIP's context
_TXT = dict(hidden=16, layers=2, heads=2, vocab=512, ctx=77)


def _tiny_cfg():
    return CLIPConfig(
        name=TINY_HF, projection_dim=8,
        vision=CLIPVisionConfig(image_size=_VIS["image"],
                                patch_size=_VIS["patch"],
                                hidden_size=_VIS["hidden"],
                                num_layers=_VIS["layers"],
                                num_heads=_VIS["heads"]),
        text=CLIPTextConfig(vocab_size=_TXT["vocab"],
                            context_length=_TXT["ctx"],
                            hidden_size=_TXT["hidden"],
                            num_layers=_TXT["layers"],
                            num_heads=_TXT["heads"],
                            eot_token_id=_TXT["vocab"] - 1),
    )


register_config(TINY_HF, _tiny_cfg)


def _hf_state_dict(rng):
    """HF ``CLIPModel.state_dict()`` tensor names/shapes for the tiny
    config (torch [out, in] linear convention — the converter
    transposes)."""
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.02
        if bias:
            sd[prefix + ".bias"] = np.zeros(dout, np.float32)

    def ln(prefix, d):
        sd[prefix + ".weight"] = np.ones(d, np.float32)
        sd[prefix + ".bias"] = np.zeros(d, np.float32)

    def encoder(prefix, d, layers):
        for i in range(layers):
            p = f"{prefix}.layers.{i}"
            ln(f"{p}.layer_norm1", d)
            ln(f"{p}.layer_norm2", d)
            for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
                lin(f"{p}.self_attn.{name}", d, d)
            lin(f"{p}.mlp.fc1", d, 4 * d)
            lin(f"{p}.mlp.fc2", 4 * d, d)

    dv, dt = _VIS["hidden"], _TXT["hidden"]
    n_pos = (_VIS["image"] // _VIS["patch"]) ** 2 + 1
    sd["vision_model.embeddings.patch_embedding.weight"] = \
        rng.standard_normal((dv, 3, _VIS["patch"],
                             _VIS["patch"])).astype(np.float32) * 0.02
    sd["vision_model.embeddings.class_embedding"] = \
        rng.standard_normal(dv).astype(np.float32) * 0.02
    sd["vision_model.embeddings.position_embedding.weight"] = \
        rng.standard_normal((n_pos, dv)).astype(np.float32) * 0.02
    ln("vision_model.pre_layrnorm", dv)  # HF's actual (misspelled) name
    encoder("vision_model.encoder", dv, _VIS["layers"])
    ln("vision_model.post_layernorm", dv)

    sd["text_model.embeddings.token_embedding.weight"] = \
        rng.standard_normal((_TXT["vocab"], dt)).astype(np.float32) * 0.02
    sd["text_model.embeddings.position_embedding.weight"] = \
        rng.standard_normal((_TXT["ctx"], dt)).astype(np.float32) * 0.02
    encoder("text_model.encoder", dt, _TXT["layers"])
    ln("text_model.final_layer_norm", dt)

    lin("visual_projection", dv, 8, bias=False)
    lin("text_projection", dt, 8, bias=False)
    sd["logit_scale"] = np.array(2.6592, np.float32)
    return sd


def _write_tokenizer_files(d: Path):
    """vocab.json + merges.txt exactly as the HF artifacts are laid out
    (merges.txt leads with a ``#version`` header line; word-final tokens
    carry the ``</w>`` suffix)."""
    vocab = {}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    for tok in ("do", "do</w>", "og</w>", "dog</w>",
                "<|startoftext|>", "<|endoftext|>"):
        vocab[tok] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\nd o\ndo g</w>\no g</w>\n")


@pytest.fixture
def hf_dir(tmp_path):
    from safetensors.numpy import save_file
    d = tmp_path / "clip-tiny-hf"
    d.mkdir()
    sd = _hf_state_dict(np.random.default_rng(0))
    save_file(sd, str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(
        {"model_type": "clip", "projection_dim": 8}))
    _write_tokenizer_files(d)
    return d


def test_safetensors_fixture_converts_and_serves(hf_dir, monkeypatch):
    from video_quierer_tpu.models.clip import convert as convert_mod
    monkeypatch.setenv("VQT_CLIP_CHECKPOINT", str(hf_dir))
    found = convert_mod.find_local_checkpoint(TINY_HF)
    assert found == hf_dir

    from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
    emb = CLIPEmbedder(model_name=TINY_HF, checkpoint_dir=hf_dir)
    assert emb.pretrained
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (3, 32, 32, 3), np.uint8)
    feats = emb.embed_frames(frames)
    assert feats.shape == (3, 8)
    assert np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)
    # the tokenizer came from the checkpoint's vocab/merges pair
    from video_quierer_tpu.models.clip.tokenizer import CLIPBPETokenizer
    assert isinstance(emb.tokenizer, CLIPBPETokenizer)
    t = emb.embed_text("dog")
    assert np.isfinite(t).all()


def test_pytorch_bin_fixture_loads(tmp_path):
    torch = pytest.importorskip("torch")
    from video_quierer_tpu.models.clip import convert as convert_mod
    d = tmp_path / "clip-tiny-bin"
    d.mkdir()
    sd = _hf_state_dict(np.random.default_rng(2))
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()}, d / "pytorch_model.bin")
    params = convert_mod.convert_hf_checkpoint(d, _tiny_cfg())
    # spot-check the transposes the converter owns
    np.testing.assert_allclose(
        params["vision"]["encoder"]["layers_0"]["attn"]["q_proj"]["kernel"],
        sd["vision_model.encoder.layers.0.self_attn.q_proj.weight"].T)
    assert params["vision"]["patch_embedding"]["kernel"].shape == \
        (_VIS["patch"], _VIS["patch"], 3, _VIS["hidden"])


def test_tokenizer_reads_hf_artifact_format(tmp_path):
    """The real artifacts' quirks: #version header, </w> suffixes."""
    from video_quierer_tpu.models.clip.tokenizer import load_tokenizer, \
        CLIPBPETokenizer
    _write_tokenizer_files(tmp_path)
    tok = load_tokenizer(tmp_path)
    assert isinstance(tok, CLIPBPETokenizer)
    # "dog" must BPE-merge via the merges list: d+o -> do, do+g</w>
    ids = tok(["dog"])
    assert ids.shape[0] == 1
    merged = tok.encoder.get("dog</w>")
    assert merged is not None and merged in ids[0].tolist()


# ---------------------------------------------------------------------------
# Gated real-weights smoke
# ---------------------------------------------------------------------------

_REAL = os.environ.get("VQT_CLIP_CHECKPOINT")
_real_ok = bool(_REAL) and (
    Path(_REAL or ".").joinpath("model.safetensors").exists()
    or Path(_REAL or ".").joinpath("pytorch_model.bin").exists())


@pytest.mark.skipif(not _real_ok,
                    reason="set VQT_CLIP_CHECKPOINT to a real "
                           "openai/clip-vit-base-patch32 dir to run")
def test_real_openai_weights_end_to_end():
    """convert → embed → search with the shipped OpenAI weights.

    Asserts retrieval sanity: each frame retrieves itself first, and a
    text query prefers a frame of its color. Uses flat-color frames so
    the assertion holds for any faithfully-converted CLIP."""
    from video_quierer_tpu.index.device_index import DeviceVideoIndex
    from video_quierer_tpu.models.clip.embedder import CLIPEmbedder

    emb = CLIPEmbedder(checkpoint_dir=Path(_REAL))
    assert emb.pretrained
    colors = {"red": (220, 30, 30), "green": (30, 200, 30),
              "blue": (30, 30, 220)}
    frames = np.stack([np.full((224, 224, 3), c, np.uint8)
                       for c in colors.values()])
    feats = emb.embed_frames(frames)
    assert np.allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)

    idx = DeviceVideoIndex(dim=emb.embed_dim)
    idx.add_batch(feats, "colors.mp4", [0.0, 1.0, 2.0])
    for i in range(3):
        got = idx.search(feats[i], k=1)
        assert got[0]["frame_id"] == i
    for i, name in enumerate(colors):
        q = emb.embed_text(f"a plain {name} image")
        best = idx.search(q, k=1)[0]["frame_id"]
        assert best == i, (name, best)
