"""Driver-contract regression: __graft_entry__ entry() and a small
dryrun_multichip stay functional."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_small():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(2)
