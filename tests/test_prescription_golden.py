"""Prescription goldens from the reference's MATLAB-trained checkpoint.

Mirrors testScripts/testPrescribeXPRIZE01.m end to end on CPU float64:
load prescription_trained_params_nonnegls.mat (the file consumed at
testPrescribeXPRIZE01.m:62), simulate 30 historic + 120 zero-control days
from each region's trained (a2, b2) coefficients (:99-119), run the
6-state opt-controlled EKF/EKS per epsilon with the script's exact
hyperparameters (:123-198: lambda0=1, q_lambda=10, q_alpha=1e-2,
beta_ekf=0.9 adaptive R, gamma_ekf=0.995, sigma=1e4, R_v=var(scalar)=0,
alpha in [0, 1]), re-simulate under the prescribed NPIs and score with
NPICost (:223-240).

J0/J1/u_opt_smooth are pinned against a committed golden (1e-9 rel) so a
silent regression in the EKF/control numerics fails here instead of
passing shape-only tests. Regenerate after an INTENDED numeric change:
    GOLDEN_REGEN=1 python -m pytest tests/test_prescription_golden.py -q
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

REF_MAT = ("/root/reference/xprize-sample-data/"
           "prescription_trained_params_nonnegls.mat")
GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "prescription_xprize01.npz")
REGIONS = ["Afghanistan ", "France ", "United States New York"]
# subset of the script's logspace(-9, 0, 1000) sweep (:160-164)
EPS_GRID = np.array([1e-9, 1e-6, 1e-4, 1e-2, 0.1, 0.9])

pytestmark = pytest.mark.skipif(not os.path.exists(REF_MAT),
                                reason="reference sample data not mounted")


def _prescribe_region(a, b, N_population):
    """The testPrescribeXPRIZE01.m per-region flow with zero sim noise."""
    from epidemicmodeling_tpu.models import (si_alpha_controlled_rollout,
                                             si_alpha_costate_ekf_system,
                                             SIAlphaParams)
    from epidemicmodeling_tpu.ops import ekf_smoother
    from epidemicmodeling_tpu.control import npi_cost

    P = 12
    ip_maxes = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    dt, I0 = 1.0, 10.0
    alpha_min, alpha_max = 0.0, 1.0
    gamma = 1.0 / 7.0
    beta = -np.log(0.01) / 21.0              # :51-53
    alpha0 = beta + np.log(2.5)              # :54-55, R0 = 2.5
    T_hist, H = 30, 120                      # :56-57
    T = T_hist + H
    i0 = I0 / N_population
    s0 = (N_population - I0) / N_population

    # historic (u=0) + zero-control scenario, deterministic (noise -> 0)
    u_zero = np.zeros((T, P))
    s_z, i_z, al_z = si_alpha_controlled_rollout(
        jnp.asarray(u_zero), s0, i0, alpha0, ip_maxes, alpha_min, alpha_max,
        gamma, a, b, beta, 0.0, 0.0, 0.0, K=T, dt=dt)
    s_z, i_z, al_z = (np.asarray(v, float) for v in (s_z, i_z, al_z))
    new_cases = s_z * i_z * al_z             # :172 NewCases, full series

    params = SIAlphaParams(
        dt=dt, beta=beta, gamma=gamma, a=a, b=b,
        u_min=np.zeros(P), u_max=ip_maxes, s_min=0.0, i_min=0.0,
        alpha_min=alpha_min, alpha_max=alpha_max, w=np.ones(P), sigma=1e4,
        epsilon=0.5)
    u_ctl = np.zeros((T, P))
    u_ctl[T_hist:] = np.nan                  # :126 NaN future = prescribe

    q_alpha, lambda0, q_lambda = 1e-2, 1.0, 10.0    # :151-153
    Q = np.diag(np.array([10 * i0, 30 * i0, q_alpha,
                          q_lambda, q_lambda, q_lambda]) ** 2)  # :155
    s_init = np.array([s0, i0, alpha0, lambda0, lambda0, lambda0])  # :179
    Ps_init = 100.0 * np.diag(np.array([i0, i0, q_alpha, q_lambda,
                                        q_lambda, q_lambda]) ** 2)  # :180
    s_final = np.array([np.nan, np.nan, np.nan, 0.0, 0.0, 0.0])
    Ps_final = np.zeros((6, 6))
    Ps_final[:3, :3] = np.nan
    for j in (3, 4, 5):
        Ps_final[j, j] = 1e-3                # :193-195
    # :158 R_v = var(5e3/N) — MATLAB var of a scalar is EXACTLY 0, and it is
    # passed as a SCALAR, so GEKF treats it as a fixed prior and the
    # beta_ekf=0.9 adaptive-R update engages (GEKF.m:180-185)
    R_v = 0.0

    J0s, J1s, u_all = [], [], []
    for eps in EPS_GRID:
        p = dict(params)
        p["epsilon"] = jnp.asarray(eps, jnp.result_type(float))
        res = ekf_smoother(
            si_alpha_costate_ekf_system("NEWCASES"),
            jnp.asarray(u_ctl), jnp.asarray(new_cases)[:, None], p,
            jnp.asarray(s_init), jnp.asarray(Ps_init),
            jnp.asarray(s_final), jnp.asarray(Ps_final),
            Q=jnp.asarray(Q), R=jnp.asarray(R_v),
            beta=0.9, gamma_discount=0.995, inv_monitor_len=21, order=1)
        u_opt = np.asarray(res.u_opt_smooth, float)
        # re-simulate the last H days under the prescription (:223-227)
        s_o, i_o, al_o = si_alpha_controlled_rollout(
            jnp.asarray(u_opt[T_hist:]), s_z[T_hist - 1], i_z[T_hist - 1],
            al_z[T_hist - 1], ip_maxes, alpha_min, alpha_max,
            gamma, a, b, beta, 0.0, 0.0, 0.0, K=H, dt=dt)
        s_full = np.concatenate([s_z[:T_hist], np.asarray(s_o)])
        i_full = np.concatenate([i_z[:T_hist], np.asarray(i_o)])
        al_full = np.concatenate([al_z[:T_hist], np.asarray(al_o)])
        J0, J1 = npi_cost(s_full * i_full * al_full, u_opt.T,
                          np.ones((P, T)))   # :240
        J0s.append(float(J0) * N_population)
        J1s.append(float(J1))
        u_all.append(u_opt)
    return np.array(J0s), np.array(J1s), np.stack(u_all)


def _compute_all():
    from epidemicmodeling_tpu.pipelines import load_trained_params_mat
    t = load_trained_params_mat(REF_MAT)
    out = {}
    for name in REGIONS:
        k = t.names.index(name)
        J0, J1, u = _prescribe_region(np.asarray(t.a2[k], float),
                                      float(t.b2[k]),
                                      float(t.population[k]))
        key = name.strip().replace(" ", "_")
        out[f"J0_{key}"] = J0
        out[f"J1_{key}"] = J1
        out[f"u_{key}"] = u
    return out


@pytest.fixture(scope="module")
def computed():
    return _compute_all()


def test_prescriptions_vary_with_epsilon(computed):
    """Low epsilon (human cost dominant) must prescribe strictly more NPI
    than high epsilon for at least one region — guards against the control
    path silently degenerating to all-u_min."""
    spans = []
    for name in REGIONS:
        key = name.strip().replace(" ", "_")
        u = computed[f"u_{key}"]             # (E, T, P)
        fut = u[:, 30:-1, :]                 # last sample stays zero
        spans.append(fut[0].mean() - fut[-1].mean())
    assert max(spans) > 0.1, f"prescriptions flat across epsilon: {spans}"


def test_prescription_golden(computed):
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, eps=EPS_GRID, **computed)
        if os.environ.get("GOLDEN_REGEN") != "1":
            pytest.skip("golden written; commit tests/goldens/ and rerun")
    g = np.load(GOLDEN)
    np.testing.assert_allclose(g["eps"], EPS_GRID, rtol=0)
    for k, v in computed.items():
        np.testing.assert_allclose(
            v, g[k], rtol=1e-9, atol=1e-12,
            err_msg=f"{k} drifted from the committed golden")
