"""Guard the driver entry points: small-config entry() forward and the
8-device DP+TP training-step dryrun must keep compiling and running."""

import os
import sys

import numpy as np


def test_entry_small(monkeypatch):
    monkeypatch.setenv("FROZENBILM_ENTRY_SMALL", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    import jax

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 20, 64)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_dryrun_multichip_8():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on non-finite loss / sharding errors
