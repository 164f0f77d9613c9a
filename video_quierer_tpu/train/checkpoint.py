"""Training checkpoint/resume via Orbax.

The reference's only "checkpoint" is the engine's pickle cache (SURVEY.md
§5); the training subsystem adds real model checkpointing: params +
optimizer state + step, saved atomically, resumable across processes.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir: Path, trainer, step: int) -> Path:
    """Save the trainer's state under ``ckpt_dir/step_<N>``."""
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).resolve()
    path = ckpt_dir / f"step_{step}"
    tree = {
        "params": trainer.state.params,
        "opt_state": trainer.state.opt_state,
        "step": np.asarray(step),
    }
    if trainer.state.ema_params is not None:
        tree["ema_params"] = trainer.state.ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree)
    logger.info("checkpoint saved: %s", path)
    return path


def latest_step(ckpt_dir: Path) -> Optional[int]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = []
    for p in ckpt_dir.iterdir():
        if p.name.startswith("step_"):
            try:
                steps.append(int(p.name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: Path, trainer,
                       step: Optional[int] = None) -> int:
    """Restore params/opt_state into the trainer; returns the step."""
    import orbax.checkpoint as ocp
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = Path(ckpt_dir).resolve() / f"step_{step}"
    with ocp.PyTreeCheckpointer() as ckptr:
        saved_keys = set(ckptr.metadata(path).item_metadata.keys())
        disk_ema = "ema_params" in saved_keys
        target = {
            "params": trainer.state.params,
            "opt_state": trainer.state.opt_state,
            "step": np.asarray(0),
        }
        if disk_ema:
            # item structure must match what's on disk, even if this
            # trainer doesn't track EMA (restored copy is then dropped)
            target["ema_params"] = (trainer.state.ema_params
                                    if trainer.state.ema_params is not None
                                    else trainer.state.params)
        restored = ckptr.restore(path, item=target)
    ema = None
    if trainer.state.ema_params is not None:
        # resuming a pre-EMA checkpoint seeds the average from the
        # restored live weights
        ema = restored["ema_params"] if disk_ema else restored["params"]
    trainer.state = trainer.state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=int(restored["step"]), ema_params=ema)
    logger.info("checkpoint restored: %s", path)
    return int(restored["step"])
