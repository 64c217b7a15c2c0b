"""Native C++ EKF/EKS vs the JAX implementation: must agree to ~1e-9."""

import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.models import SIAlphaParams

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="g++ not available")


def build_case(T=120, T_hist=90, seed=0, epsilon=0.3):
    rng = np.random.default_rng(seed)
    P = 12
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    obs = np.abs(rng.normal(1e-4, 2e-5, T))
    obs[T_hist:] = np.nan
    u = rng.integers(0, 3, (T, P)).astype(float)
    u[T_hist:] = np.nan
    params = SIAlphaParams(dt=1.0, beta=0.2, gamma=1 / 7,
                           a=0.004 * rng.random(P), b=0.05,
                           u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
                           i_min=1e-6, alpha_min=1e-8, alpha_max=100.0,
                           epsilon=epsilon, w=np.ones(P), sigma=1e6)
    s_init = np.array([0.999, 1e-4, 0.3, 0, 0, 0.0])
    Ps_init = np.diag([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])
    s_final = np.array([np.nan, np.nan, np.nan, 0, 0, 0.0])
    Ps_final = np.full((6, 6), np.nan)
    Ps_final[3, 3] = Ps_final[4, 4] = Ps_final[5, 5] = 1e-8
    Q = np.diag([1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8])
    R_v = np.full(T, 4e-10)
    return u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v


@pytest.mark.parametrize("epsilon", [0.05, 0.5])
def test_native_matches_jax(epsilon):
    from epidemicmodeling_tpu.deploy import newcase_ekf_optimal_npi_native
    from epidemicmodeling_tpu.pipelines.prescribe import \
        new_case_ekf_optimal_npi

    u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v = build_case(
        epsilon=epsilon)

    native = newcase_ekf_optimal_npi_native(
        u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v)

    res = new_case_ekf_optimal_npi(
        jnp.asarray(u), jnp.asarray(obs), params, jnp.asarray(s_init),
        jnp.asarray(Ps_init), jnp.asarray(s_final), jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.asarray(R_v), gamma=0.995)

    np.testing.assert_allclose(native["S_PLUS"], np.asarray(res.s_plus),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(native["S_SMOOTH"], np.asarray(res.s_smooth),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(native["U_OPT_SMOOTH"],
                               np.asarray(res.u_opt_smooth),
                               rtol=1e-9, atol=1e-9)


def test_native_adaptive_R_runs():
    from epidemicmodeling_tpu.deploy import newcase_ekf_optimal_npi_native
    u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v = build_case()
    out = newcase_ekf_optimal_npi_native(
        u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v,
        beta_ekf=0.9)
    assert np.isfinite(out["S_SMOOTH"]).all()
