"""Driver-contract regression tests: entry() compiles and runs; the
multi-chip dryrun executes a full sharded train->prescribe step on the
8-device CPU mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (8, 96, 6)
    assert out[1].shape == (8, 96, 12)
    assert bool(jax.numpy.all(jax.numpy.isfinite(out[0])))


def test_dryrun_multichip_8():
    # multihost=False: the 2-process DCN legs are covered (with parity
    # pins) by tests/test_multihost.py / test_multihost_pallas.py; the
    # driver's default call includes them, and three re-runs here would
    # blow the 1-CPU per-file 900 s budget
    import __graft_entry__ as g
    g.dryrun_multichip(8, multihost=False)  # asserts internally


def test_dryrun_multichip_odd_device_count():
    import __graft_entry__ as g
    g.dryrun_multichip(3, multihost=False)  # prime count => (3, 1) mesh
