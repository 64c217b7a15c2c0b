"""Multi-host (2-process jax.distributed) dryrun parity — pallas backend.

Same harness as test_multihost.py, with the fused Mosaic kernels
shard_mapped across the process-spanning mesh (interpret mode on the CPU
devices). Separate file so the 1-CPU per-file runner's budget covers a
cold-cache run (the pallas programs are the slowest XLA:CPU compiles in
the suite; the children share the repo's persistent compile cache, so
warm runs take seconds).
"""

import numpy as np


def test_multihost_pallas_dryrun_matches_single_process():
    """shard_map of the fused Pallas kernels across 2 OS processes must
    reproduce the single-process J0/a2 to float64 round-off — pins the
    DCN path x Mosaic-kernel combination the CLI's default backend ships."""
    from epidemicmodeling_tpu.parallel.multihost import run_multihost_dryrun

    out = run_multihost_dryrun(n_devices=4, n_processes=2, R=4, E=4,
                               T_hist=32, horizon=8, backend="pallas",
                               timeout=800, verbose=False)
    assert out["J0"].shape == (4, 4)
    assert np.isfinite(out["J0"]).all()
