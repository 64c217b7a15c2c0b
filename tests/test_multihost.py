"""Multi-host (multi-process) SPMD validation: 2 jax.distributed worker
processes x 2 virtual CPU devices each, Gloo collectives over localhost
standing in for DCN, mesh spanning both processes (SURVEY.md §2.10's
last row: >1-host scaling).

Heavy (spawns 3 fresh interpreters that each compile the pipeline) but
bounded; the per-file test runner gives it its own process anyway.
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
                               timeout=1500, verbose=False)
    assert out["J0"].shape == (4, 4)
    assert np.isfinite(out["J0"]).all()
    assert out["max_abs_diff"] < 1e-9
