"""HuggingFace CLIP checkpoint → Flax parameter conversion.

The reference downloads ``openai/clip-vit-base-patch32`` at runtime
(video_search_overhaul.py:127-130). This environment is offline, so weights
load from a **local** checkpoint directory (``model.safetensors`` or
``pytorch_model.bin`` plus tokenizer files) when one is available; otherwise
the engine falls back to deterministic seeded init — numerically valid,
semantically untrained (tests and benchmarks are weight-agnostic).

Conventions converted:
- torch ``Linear.weight`` is ``[out, in]`` → flax ``kernel`` ``[in, out]``;
- torch conv weight ``[out, in, kh, kw]`` → flax NHWC ``[kh, kw, in, out]``;
- HF module names (including the historical ``pre_layrnorm`` typo) → our
  tree (see model.py).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from video_quierer_tpu.models.clip.config import CLIPConfig


def _load_state_dict(ckpt_dir: Path) -> Dict[str, np.ndarray]:
    ckpt_dir = Path(ckpt_dir)
    st = ckpt_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file
        return load_file(st)
    bin_path = ckpt_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors or pytorch_model.bin under {ckpt_dir}")


def _linear(sd, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if bias:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _layernorm(sd, prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _encoder_layers(sd, prefix: str, n_layers: int) -> Dict:
    layers = {}
    for i in range(n_layers):
        p = f"{prefix}.layers.{i}"
        layers[f"layers_{i}"] = {
            "layer_norm1": _layernorm(sd, f"{p}.layer_norm1"),
            "layer_norm2": _layernorm(sd, f"{p}.layer_norm2"),
            "attn": {
                "q_proj": _linear(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{p}.self_attn.v_proj"),
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }
    return layers


def convert_hf_checkpoint(ckpt_dir: Path, cfg: CLIPConfig) -> Dict:
    """Build the flax param tree for ``CLIP`` from an HF checkpoint dir."""
    sd = _load_state_dict(ckpt_dir)
    v, t = cfg.vision, cfg.text

    patch = sd["vision_model.embeddings.patch_embedding.weight"]
    params = {
        "vision": {
            "patch_embedding": {
                "kernel": np.ascontiguousarray(
                    np.transpose(patch, (2, 3, 1, 0))),
            },
            "class_embedding":
                sd["vision_model.embeddings.class_embedding"].reshape(-1),
            "position_embedding":
                sd["vision_model.embeddings.position_embedding.weight"],
            # NB: HF spells it "pre_layrnorm"
            "pre_layernorm": _layernorm(sd, "vision_model.pre_layrnorm"),
            "encoder": _encoder_layers(sd, "vision_model.encoder",
                                       v.num_layers),
            "post_layernorm": _layernorm(sd, "vision_model.post_layernorm"),
        },
        "text": {
            "token_embedding": {
                "embedding":
                    sd["text_model.embeddings.token_embedding.weight"],
            },
            "position_embedding":
                sd["text_model.embeddings.position_embedding.weight"],
            "encoder": _encoder_layers(sd, "text_model.encoder",
                                       t.num_layers),
            "final_layer_norm":
                _layernorm(sd, "text_model.final_layer_norm"),
        },
        "visual_projection": _linear(sd, "visual_projection", bias=False),
        "text_projection": _linear(sd, "text_projection", bias=False),
        "logit_scale": sd["logit_scale"].reshape(()),
    }
    return params


def find_local_checkpoint(name: str = "openai/clip-vit-base-patch32",
                          search_dirs: Optional[list] = None
                          ) -> Optional[Path]:
    """Look for a usable local checkpoint directory.

    Checks (in order): ``$VQT_CLIP_CHECKPOINT``, ``./checkpoints/<name>``,
    the HF hub cache layout under ``~/.cache/huggingface``.
    """
    import os
    cands = []
    env = os.environ.get("VQT_CLIP_CHECKPOINT")
    if env:
        cands.append(Path(env))
    short = name.split("/")[-1]
    cands.append(Path("checkpoints") / short)
    hub = Path.home() / ".cache" / "huggingface" / "hub" / \
        f"models--{name.replace('/', '--')}" / "snapshots"
    if hub.exists():
        cands.extend(sorted(hub.iterdir()))
    for c in cands:
        if c.is_dir() and ((c / "model.safetensors").exists()
                           or (c / "pytorch_model.bin").exists()):
            return c
    return None
