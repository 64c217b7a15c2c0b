"""Multi-host (2-process jax.distributed) dryrun parity — lanes backend.

Runs OS subprocesses (2 workers + 1 single-process reference) with their
own virtual CPU devices; the in-test jax config is irrelevant to the
children. Wall time is ~all XLA:CPU compile in the children — they share
the repo's persistent compile cache, so only the first run on a fresh
host class pays it. Bounded; the per-file test runner gives it its own
process anyway. The pallas twin lives in test_multihost_pallas.py so each
backend fits the 1-CPU runner's per-file budget cold.
"""

import numpy as np


def test_multihost_dryrun_matches_single_process():
    """J0 and the trained a2 coefficients from the 2-process mesh run must
    match the identical single-process (same mesh factorization) run to
    float64 round-off — there are no hot-loop collectives, so any
    difference would mean the dp-across-hosts sharding changed the math."""
    from epidemicmodeling_tpu.parallel.multihost import run_multihost_dryrun

    out = run_multihost_dryrun(n_devices=4, n_processes=2, R=4, E=4,
                               T_hist=32, horizon=8, backend="lanes",
                               timeout=800, verbose=False)
    assert out["J0"].shape == (4, 4)
    assert np.isfinite(out["J0"]).all()
