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


def test_native_adaptive_R_matches_jax():
    """The deployment artifact's HEADLINE config: the reference's deployed
    estimator adapts R on every valid step
    (Tools/NewCaseEKFEstimatorWithOptimalNPI.m:103-110), so beta_ekf=0.9 is
    the one config that must carry a cross-implementation pin, not just a
    finiteness smoke test."""
    from epidemicmodeling_tpu.deploy import newcase_ekf_optimal_npi_native
    from epidemicmodeling_tpu.pipelines.prescribe import \
        new_case_ekf_optimal_npi

    u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v = build_case()
    native = newcase_ekf_optimal_npi_native(
        u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v,
        beta_ekf=0.9)
    assert np.isfinite(native["S_SMOOTH"]).all()

    res = new_case_ekf_optimal_npi(
        jnp.asarray(u), jnp.asarray(obs), params, jnp.asarray(s_init),
        jnp.asarray(Ps_init), jnp.asarray(s_final), jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.asarray(R_v), beta=0.9, gamma=0.995)

    np.testing.assert_allclose(native["S_PLUS"], np.asarray(res.s_plus),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(native["S_SMOOTH"], np.asarray(res.s_smooth),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(native["U_OPT_SMOOTH"],
                               np.asarray(res.u_opt_smooth),
                               rtol=1e-9, atol=1e-9)
    # the adaptation must actually bite: beta=1 and beta=0.9 runs differ
    fixed = newcase_ekf_optimal_npi_native(
        u, obs, params, s_init, Ps_init, s_final, Ps_final, Q, R_v)
    assert np.abs(native["S_SMOOTH"] - fixed["S_SMOOTH"]).max() > 0


def test_native_pareto_sweep_matches_single_eps_calls():
    """The threaded sweep must equal looping the single-epsilon native entry
    plus the NumPy re-simulation/cost — and be independent of thread count."""
    from epidemicmodeling_tpu.deploy import (
        newcase_ekf_optimal_npi_native, newcase_ekf_pareto_sweep_native)

    rng = np.random.default_rng(3)
    P = 12
    T_hist, H = 40, 30
    T = T_hist + H
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    a = 0.01 * rng.random(P)
    pr = dict(dt=1.0, beta=0.2, gamma=1 / 7, b=0.05, epsilon=np.nan,
              sigma=1e4, alpha_min=0.0, alpha_max=1.0,
              a=a, u_min=np.zeros(P), u_max=u_max, w=np.ones(P))

    # historic rollout (noise-free SIalpha_Controlled semantics)
    s, i, al = np.empty(T_hist), np.empty(T_hist), np.empty(T_hist)
    sc, ic, alc = 1 - 1e-4, 1e-4, 0.5
    for t in range(T_hist):
        s1 = min(1.0, max(0.0, sc - alc * sc * ic))
        i1 = min(1.0, max(0.0, ic + (alc * sc * ic - pr["beta"] * ic)))
        a1 = min(1.0, max(0.0, alc + (-alc / 7 + 0.05 / 7
                                      + (a @ u_max) / 7)))
        sc, ic, alc = s1, i1, a1
        s[t], i[t], al[t] = sc, ic, alc
    sia_hist = np.stack([s, i, al], axis=1)
    x = np.concatenate([s * i * al,
                        s[-1] * i[-1] * al[-1] * np.ones(H)])
    u = np.zeros((T, P))
    u[T_hist:] = np.nan

    s_init = np.array([1 - 1e-4, 1e-4, 0.5, 1.0, 1.0, 1.0])
    Ps_init = 100.0 * np.diag([1e-4, 1e-4, 1e-2, 10, 10, 10]) ** 2
    s_final = np.array([np.nan] * 3 + [0.0, 0.0, 0.0])
    Ps_final = np.zeros((6, 6))
    Ps_final[:3, :3] = np.nan
    for j in (3, 4, 5):
        Ps_final[j, j] = 1e-3
    Q = np.diag([1e-3, 3e-3, 1e-2, 10, 10, 10]) ** 2
    R_v = np.zeros(T)

    eps = np.array([1e-9, 1e-4, 1e-2, 0.5])
    sweep = newcase_ekf_pareto_sweep_native(
        u, x, T_hist, pr, eps, s_init, Ps_init, s_final, Ps_final, Q, R_v,
        sia_hist, beta_ekf=0.9, n_threads=4)

    for ll, e in enumerate(eps):
        p1 = dict(pr)
        p1["epsilon"] = e
        one = newcase_ekf_optimal_npi_native(
            u, x, p1, s_init, Ps_init, s_final, Ps_final, Q, R_v,
            beta_ekf=0.9)
        np.testing.assert_array_equal(sweep["U_OPT_SMOOTH"][ll],
                                      one["U_OPT_SMOOTH"])
        # replicate the rollout + NPICost in NumPy
        u_opt = one["U_OPT_SMOOTH"]
        sc, ic, alc = s[-1], i[-1], al[-1]
        cases = list(s * i * al)
        for t in range(H):
            drive = a @ (u_max - u_opt[T_hist + t])
            s1 = min(1.0, max(0.0, sc - alc * sc * ic))
            i1 = min(1.0, max(0.0, ic + (alc * sc * ic - pr["beta"] * ic)))
            a1 = min(1.0, max(0.0, alc + (-alc / 7 + 0.05 / 7 + drive / 7)))
            sc, ic, alc = s1, i1, a1
            cases.append(sc * ic * alc)
        J0 = np.mean(cases)
        J1 = np.mean(np.ones(P)[None, :] * u_opt)
        np.testing.assert_allclose(sweep["J0"][ll], J0, rtol=1e-12)
        np.testing.assert_allclose(sweep["J1"][ll], J1, rtol=1e-12)

    # determinism across thread counts
    sweep1 = newcase_ekf_pareto_sweep_native(
        u, x, T_hist, pr, eps, s_init, Ps_init, s_final, Ps_final, Q, R_v,
        sia_hist, beta_ekf=0.9, n_threads=1)
    np.testing.assert_array_equal(sweep["U_OPT_SMOOTH"],
                                  sweep1["U_OPT_SMOOTH"])
    np.testing.assert_array_equal(sweep["J0"], sweep1["J0"])
    # prescriptions vary across the sweep (control is live)
    fut = sweep["U_OPT_SMOOTH"][:, T_hist:-1, :]
    assert fut[0].mean() != fut[-1].mean()
