"""Train → serve loop: fine-tuned orbax params load into the serving
embedder and change its outputs; plus UI ↔ API consistency."""

import re
from pathlib import Path

import numpy as np
import pytest


@pytest.mark.slow
def test_orbax_params_into_embedder(tmp_path, rng):
    """Serve weights produced by the trainer: embeddings must equal the
    trainer's params, not the seeded init."""
    from video_quierer_tpu.models.clip.embedder import CLIPEmbedder
    from video_quierer_tpu.models.clip.config import vit_b_32
    from video_quierer_tpu.train.checkpoint import save_checkpoint
    from video_quierer_tpu.train.trainer import CLIPTrainer

    trainer = CLIPTrainer(vit_b_32(), learning_rate=1e-3, seed=0)
    images = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    ids = rng.integers(1, 49405, (2, 77)).astype(np.int32)
    trainer.step(images, ids)  # params now differ from seed-0 init
    path = save_checkpoint(tmp_path, trainer, step=1)

    tuned = CLIPEmbedder(orbax_checkpoint=path, seed=0)
    fresh = CLIPEmbedder(seed=0)
    assert tuned.pretrained is True
    frames = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    out_tuned = tuned.embed_frames(frames)
    out_fresh = fresh.embed_frames(frames)
    assert not np.allclose(out_tuned, out_fresh, atol=1e-4)
    # and they match the trainer's own params applied directly
    import jax.numpy as jnp
    from video_quierer_tpu.models.clip.model import CLIP
    from video_quierer_tpu.ops.preprocess import normalize_images
    direct = trainer.model.apply(
        {"params": trainer.state.params},
        normalize_images(jnp.asarray(frames)), method=CLIP.encode_image)
    np.testing.assert_allclose(out_tuned, np.asarray(direct), atol=1e-5)


def test_ui_endpoints_exist_in_api():
    """Every URL the web UI fetches must be a registered route."""
    html = Path("static/index.html").read_text()
    raw = set(re.findall(r"""api\(["'`](/[^"'`]+)""", html))
    raw |= set(re.findall(r'window\.location\s*=\s*"(/[^"]+)"', html))
    # JS template params `${expr}` become a path segment placeholder
    called = {re.sub(r"\$\{[^}]+\}", "X", u) for u in raw}
    from video_quierer_tpu.api.openapi import _ENDPOINTS
    documented = {path for _, path, *_ in _ENDPOINTS}

    def covered(url):
        path = url.split("?")[0]
        if path.endswith("/"):  # JS string concatenation of an id
            path += "X"
        if path in documented:
            return True
        # parameterized routes
        for doc in documented:
            if "{" in doc:
                pattern = re.sub(r"\{[^}]+\}", "[^/]+", doc) + "$"
                if re.match(pattern, path):
                    return True
        return False

    missing = sorted(u for u in called if not covered(u))
    assert not missing, f"UI calls unregistered endpoints: {missing}"


def test_ui_dom_ids_consistent():
    """Every element id the UI's JS queries must exist in the markup."""
    html = Path("static/index.html").read_text()
    queried = set(re.findall(r'\$\("#([\w-]+)"\)', html))
    queried |= set(re.findall(r'getElementById\("([\w-]+)"\)', html))
    declared = set(re.findall(r'id="([\w-]+)"', html))
    missing = sorted(queried - declared)
    assert not missing, f"JS queries ids missing from markup: {missing}"
