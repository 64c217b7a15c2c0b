"""Cross-precision validation: the pipeline's prescriptions must be stable
between float64 (CPU reference numerics) and float32 (TPU deployment
numerics).

The reference runs MATLAB double everywhere; our TPU deployment runs f32.
This guards the gap: trained regression coefficients, Pareto sweep costs and
the discrete bang-bang prescriptions from an identical tiny pipeline run must
agree across dtypes — coefficients and costs to f32-accumulation tolerance,
prescriptions near-exactly (rare single-day flips at cost ties are allowed).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.data import synthetic_oxford_frame, NPI_MAXES_DEFAULT
from epidemicmodeling_tpu.pipelines import PipelineConfig, train_predict_prescribe
from epidemicmodeling_tpu.control import epsilon_grid


@pytest.fixture(scope="module")
def dual_precision_runs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prec")
    df, pops, truth = synthetic_oxford_frame(n_regions=2, n_days=160, seed=3)
    data_file = tmp / "oxford.csv"
    pop_file = tmp / "populations.csv"
    geo_file = tmp / "geos.csv"
    df.to_csv(data_file, index=False)
    pops.to_csv(pop_file, index=False)
    pops[["CountryName", "RegionName"]].to_csv(geo_file, index=False)

    P = 12
    kwargs = dict(
        npi_weights=np.ones(P),
        epsilon_values=np.asarray(epsilon_grid(8)),
        start_train_date="2020-03-01",
        end_train_date="2020-07-09",    # 130 days of training
        start_regression_date="2020-03-01",
        end_predict_date="2020-08-08",  # 30-day horizon
        data_file=data_file,
        geo_file=geo_file,
        populations_file=pop_file,
        npi_mins=np.zeros(P),
        npi_maxes=NPI_MAXES_DEFAULT,
        cfg=PipelineConfig(num_monte_carlo=10, pareto_chunk=8),
        key=jax.random.PRNGKey(0),
    )
    r64 = train_predict_prescribe(dtype=jnp.float64, **kwargs)
    r32 = train_predict_prescribe(dtype=jnp.float32, **kwargs)
    return r64, r32


def test_trained_coefficients_agree(dual_precision_runs):
    r64, r32 = dual_precision_runs
    for field in ("a1", "b1", "a2", "b2"):
        v64 = np.asarray(getattr(r64.trained, field), np.float64)
        v32 = np.asarray(getattr(r32.trained, field), np.float64)
        scale = np.max(np.abs(v64)) + 1e-12
        assert np.max(np.abs(v64 - v32)) / scale < 5e-3, field


def test_pareto_costs_agree(dual_precision_runs):
    r64, r32 = dual_precision_runs
    for key in ("J0", "J1"):
        v64 = np.asarray(r64.pareto[key], np.float64)
        v32 = np.asarray(r32.pareto[key], np.float64)
        rel = np.abs(v64 - v32) / (np.abs(v64) + 1e-9)
        assert np.median(rel) < 1e-3, key
        assert np.max(rel) < 5e-2, key


def test_prescriptions_agree(dual_precision_runs):
    """Discrete bang-bang prescriptions: f32 and f64 must pick the same NPI
    level on (nearly) every region-day-NPI cell; the switching-time jitter
    from precision must stay under 1%% of cells."""
    r64, r32 = dual_precision_runs
    u64 = np.asarray(r64.pareto["u_prescribed"])
    u32 = np.asarray(r32.pareto["u_prescribed"])
    assert u64.shape == u32.shape
    frac_diff = np.mean(u64 != u32)
    assert frac_diff < 0.01, f"{frac_diff:.4%} of prescription cells differ"
