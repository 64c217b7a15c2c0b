"""Extended fuzz soak: the CI fuzz families (tests/test_ekf_fuzz.py,
tests/test_backend_fuzz.py) re-run over a much wider seed range.

Gated behind EPI_SOAK=1 so the default suite's runtime is unchanged;
run explicitly as a latent-bug hunt:

    scripts/soak.sh            # preferred: per-family processes + retry
    EPI_SOAK=1 [EPI_SOAK_N=25] python -m pytest tests/test_soak_fuzz.py -q -n0

On 1-CPU hosts prefer scripts/soak.sh: a monolithic soak process issues
hundreds of fresh XLA:CPU compiles and this environment segfaults
nondeterministically in backend_compile_and_load under that load (the
scripts/run_tests_by_file.sh crash family).

EPI_SOAK_N scales the number of NEW seeds per family (default 25). Seeds
start where the CI ranges end, so the soak only explores configurations
CI has never drawn. Every case asserts the same oracle/cross-backend
parity contracts as the CI fuzz — a failure here is a real numerics bug
(or an unmodeled conditioning regime) with a reproducible seed.
"""

import os

import pytest

if not os.environ.get("EPI_SOAK"):
    pytest.skip("soak suite: set EPI_SOAK=1 to run", allow_module_level=True)

from tests import test_backend_fuzz as BF
from tests import test_ekf_fuzz as F

N = int(os.environ.get("EPI_SOAK_N", "25"))


@pytest.mark.parametrize("seed", range(8, 8 + 8 * N))
def test_soak_ekf_vs_oracle(seed):
    F.test_ekf_fuzz_matches_oracle(seed)


@pytest.mark.parametrize("seed", range(3, 3 + N))
def test_soak_time_varying_Q_vbar(seed):
    F.test_ekf_fuzz_time_varying_Q_and_vbar(seed)


@pytest.mark.parametrize("seed", range(4, 4 + 2 * N))
def test_soak_costate_vs_oracle(seed):
    F.test_costate_fuzz_matches_oracle(seed)


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("seed", range(3, 3 + N))
def test_soak_rt_ekf_vs_pregeneric_oracle(seed, order):
    F.test_rt_ekf_fuzz_matches_pregeneric_oracle(seed, order)


@pytest.mark.parametrize("seed", range(3, 3 + N))
def test_soak_backward_vs_oracle(seed):
    F.test_backward_fuzz_matches_oracle(seed)


@pytest.mark.parametrize("seed", range(2, 2 + N))
def test_soak_totalcases_interior_nans(seed):
    F.test_ekf_fuzz_totalcases_interior_nans(seed)


# Cross-backend (vmap / lanes / pallas-interpret) agreement on freshly
# drawn pathological region batches — seeds disjoint from CI's {3,11,29}.
_BF_SEEDS = [s for s in range(100, 100 + 2 * N)]


@pytest.mark.parametrize("seed", _BF_SEEDS)
def test_soak_backends_agree(seed, tmp_path):
    BF.test_backends_agree_on_pathological_data(seed, tmp_path)
