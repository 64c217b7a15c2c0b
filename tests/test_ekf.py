"""EKF/EKS core tests: golden parity against the NumPy oracle (a from-the-spec
transcription of Tools/GenericExtendedKalmanFilter.m semantics), round-trip
state recovery, NaN-mask forecasting, terminal conditions, adaptive-R, and the
6-state bang-bang optimal-control system."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.models import (
    si_alpha_controlled_rollout,
    si_alpha_ekf_system,
    si_alpha_costate_ekf_system,
    SIAlphaParams,
)
from epidemicmodeling_tpu.ops import ekf_smoother, batched_ekf_smoother
from tests import oracle_ekf


U_MAX = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
P_NPI = 12


def make_setup(T=120, seed=0, obs_nan_tail=0):
    """Build a synthetic SI-alpha scenario: simulate, observe new cases."""
    rng = np.random.default_rng(seed)
    u = rng.integers(0, 3, size=(T, P_NPI)).astype(float)
    a_true = 0.004 * rng.random(P_NPI)
    pr = dict(dt=1.0, beta=0.15, gamma=1.0 / 7.0, a=a_true, b=0.05,
              u_min=np.zeros(P_NPI), u_max=U_MAX, s_min=1e-6, i_min=1e-6,
              alpha_min=1e-8, alpha_max=100.0)
    s, i, al = si_alpha_controlled_rollout(
        u, 0.999, 1e-4, 0.25, U_MAX, pr["alpha_min"], pr["alpha_max"],
        pr["gamma"], a_true, pr["b"], pr["beta"], 0.0, 0.0, 0.0, T, 1.0)
    obs = np.array(s * i * al)
    obs += 0.05 * obs.std() * rng.standard_normal(T)
    obs = np.maximum(obs, 0.0)
    if obs_nan_tail:
        obs[-obs_nan_tail:] = np.nan
    params = SIAlphaParams(**pr)
    s_init = np.array([0.999, 1e-4, 0.25])
    Ps_init = np.diag([1e-4, 1e-6, 0.1])
    Q = np.diag([1e-8, 1e-8, 1e-4])
    R_v = np.full(T, (0.1 * np.nanstd(obs)) ** 2)
    return u, obs, params, pr, s_init, Ps_init, Q, R_v


def run_both(u, obs, params, pr, s_init, Ps_init, Q, R_v, beta=1.0,
             gamma=0.995, L=21, s_final=None, Ps_final=None):
    """Run the JAX filter and the NumPy oracle on identical inputs."""
    res = ekf_smoother(
        si_alpha_ekf_system("NEWCASES"), jnp.asarray(u), jnp.asarray(obs),
        params, jnp.asarray(s_init), jnp.asarray(Ps_init),
        None if s_final is None else jnp.asarray(s_final),
        None if Ps_final is None else jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.asarray(R_v), beta=beta,
        gamma_discount=gamma, inv_monitor_len=L)

    handles = oracle_ekf.si_alpha_handles("NEWCASES")
    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.generic_ekf(
        u.T, obs.reshape(1, -1), handles, pr_np, s_init, Ps_init,
        np.full(3, np.nan) if s_final is None else s_final,
        np.full((3, 3), np.nan) if Ps_final is None else Ps_final,
        np.zeros(3), np.zeros(1), Q, R_v, beta, gamma, L, 1)
    return res, ref


def assert_parity(res, ref, rtol=1e-9, atol=1e-12):
    (u_opt, u_opt_smooth, S_MINUS, S_PLUS, S_SMOOTH, P_MINUS, P_PLUS,
     P_SMOOTH, K_GAIN, innovations, rho) = ref
    np.testing.assert_allclose(np.asarray(res.s_minus), S_MINUS.T, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.s_plus), S_PLUS.T, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.s_smooth), S_SMOOTH.T, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.P_minus),
                               np.moveaxis(P_MINUS, 2, 0), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.P_plus),
                               np.moveaxis(P_PLUS, 2, 0), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.P_smooth),
                               np.moveaxis(P_SMOOTH, 2, 0), rtol=rtol, atol=atol)
    # Gain elements below rtol*||K_k|| are numerically zero at that
    # step's scale: K = P- H' / S runs through cancellations whose f64
    # residue rides the STEP's gain magnitude, not the element's own
    # (soak seed 3348: one 1.3e-4 element inside an O(150) column at
    # abs err 3.9e-12 = 2.5e-14 of the step scale, all 329 others exact
    # at 1e-9 — same grading family as the seed-365 P_smooth floor).
    K_impl, K_ref = np.asarray(res.K_gain), np.moveaxis(K_GAIN, 2, 0)
    step_scale = np.abs(K_ref).max(axis=(1, 2), keepdims=True)
    K_tol = atol + rtol * np.maximum(np.abs(K_ref), step_scale)
    K_err = np.abs(K_impl - K_ref)
    assert (K_err <= K_tol).all(), (
        f"K_gain err {K_err.max():.3e} above the step-scale floor "
        f"(worst step scale {step_scale.max():.3e})")
    np.testing.assert_allclose(np.asarray(res.innovations),
                               innovations.T, rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        np.asarray(res.rho).reshape(-1), np.moveaxis(rho, -1, 0).reshape(-1),
        rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.u_opt), u_opt.T, rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(res.u_opt_smooth), u_opt_smooth.T,
                               rtol=rtol, atol=atol)


def test_ekf_matches_oracle_basic():
    setup = make_setup(T=120, seed=0)
    res, ref = run_both(*setup)
    assert_parity(res, ref)


def test_ekf_matches_oracle_with_nan_forecast_tail():
    """NaN observations at the tail = forecasting mode (GEKF.m:122-135)."""
    setup = make_setup(T=150, seed=1, obs_nan_tail=30)
    res, ref = run_both(*setup)
    assert_parity(res, ref)


def test_ekf_matches_oracle_adaptive_R():
    """beta != 1 with fixed scalar R activates the adaptive-R update."""
    u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=100, seed=2)
    R_fixed = np.array([[float(R_v[0])]])
    res, ref = run_both(u, obs, params, pr, s_init, Ps_init, Q, R_fixed,
                        beta=0.9)
    assert_parity(res, ref)


def test_ekf_matches_oracle_terminal_conditions():
    u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=80, seed=3)
    s_final = np.array([np.nan, np.nan, 0.2])
    Ps_final = np.full((3, 3), np.nan)
    Ps_final[2, 2] = 1e-8
    res, ref = run_both(u, obs, params, pr, s_init, Ps_init, Q, R_v,
                        s_final=s_final, Ps_final=Ps_final)
    assert_parity(res, ref)
    np.testing.assert_allclose(float(res.s_smooth[-1, 2]), 0.2)


def test_ekf_round_trip_recovers_alpha():
    """sim -> EKF/EKS round trip: smoothed alpha must track the true alpha
    (the reference's implicit correctness oracle, SURVEY.md §4 #7)."""
    T = 300
    rng = np.random.default_rng(7)
    u = rng.integers(0, 3, size=(T, P_NPI)).astype(float)
    a_true = 0.004 * rng.random(P_NPI)
    pr = dict(dt=1.0, beta=0.15, gamma=1.0 / 7.0, a=a_true, b=0.05,
              u_min=np.zeros(P_NPI), u_max=U_MAX, s_min=1e-6, i_min=1e-6,
              alpha_min=1e-8, alpha_max=100.0)
    s, i, al = si_alpha_controlled_rollout(
        u, 0.995, 1e-3, 0.3, U_MAX, pr["alpha_min"], pr["alpha_max"],
        pr["gamma"], a_true, pr["b"], pr["beta"], 0.0, 0.0, 0.0, T, 1.0)
    obs = np.asarray(s * i * al)
    params = SIAlphaParams(**pr)
    res = ekf_smoother(
        si_alpha_ekf_system("NEWCASES"), jnp.asarray(u), jnp.asarray(obs),
        params, jnp.array([0.995, 1e-3, 0.3]), jnp.diag(jnp.array([1e-4, 1e-6, 0.1])),
        Q=jnp.diag(jnp.array([1e-10, 1e-10, 1e-5])), R=jnp.full(T, 1e-14),
        gamma_discount=1.0)
    alpha_err = np.abs(np.asarray(res.s_smooth[:, 2]) - np.asarray(al))
    # after burn-in the smoothed contact rate tracks truth closely
    assert np.median(alpha_err[50:]) < 0.02


def test_costate_system_matches_oracle_bang_bang():
    """6-state opt-controlled system with NaN future inputs: JAX vs oracle."""
    T, T_hist = 100, 70
    u, obs, params3, pr, s_init3, Ps_init3, Q3, R_v = make_setup(T=T, seed=4)
    obs = obs.copy()
    obs[T_hist:] = np.nan
    u = u.copy()
    u[T_hist:] = np.nan

    pr6 = dict(pr)
    pr6["epsilon"] = 0.35
    pr6["w"] = np.ones(P_NPI)
    pr6["sigma"] = 1e6
    params6 = SIAlphaParams(**pr6)

    s_init = np.concatenate([s_init3, np.zeros(3)])
    Ps_init = np.zeros((6, 6))
    Ps_init[:3, :3] = Ps_init3
    q_l = 1e-4
    np.fill_diagonal(Ps_init[3:, 3:], 10.0 * q_l ** 2)
    Q = np.zeros((6, 6))
    Q[:3, :3] = Q3
    np.fill_diagonal(Q[3:, 3:], q_l ** 2)
    s_final = np.array([np.nan, np.nan, np.nan, 0.0, 0.0, 0.0])
    Ps_final = np.zeros((6, 6))
    Ps_final[:3, :3] = np.nan
    np.fill_diagonal(Ps_final[3:, 3:], 1e-8)

    res = ekf_smoother(
        si_alpha_costate_ekf_system("NEWCASES"), jnp.asarray(u),
        jnp.asarray(obs), params6, jnp.asarray(s_init), jnp.asarray(Ps_init),
        jnp.asarray(s_final), jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.asarray(R_v), gamma_discount=0.995)

    handles = oracle_ekf.si_alpha_costate_handles("NEWCASES")
    pr_np = {k: np.asarray(v, float) for k, v in pr6.items()}
    ref = oracle_ekf.generic_ekf(
        u.T, obs.reshape(1, -1), handles, pr_np, s_init, Ps_init,
        s_final, Ps_final, np.zeros(6), np.zeros(1), Q, R_v,
        1.0, 0.995, 21, 1)
    # costates cross zero and are chaotic at the ULP level: XLA vs NumPy
    # summation order gives ~1e-9 absolute divergence over 100 steps, which is
    # large *relative* error only on near-zero costate entries.
    assert_parity(res, ref, rtol=1e-4, atol=1e-8)

    # the prescribed future inputs are bang-bang: every NaN slot was replaced
    # by either u_min or u_max
    u_sm = np.asarray(res.u_opt_smooth)[T_hist:-1]
    at_bounds = (u_sm == 0.0) | (u_sm == U_MAX[None, :])
    assert at_bounds.all()


def test_batched_ekf_vmaps_over_regions():
    B, T = 4, 60
    us, xs, sis, Pis, Qs, Rs = [], [], [], [], [], []
    params_list = []
    for b in range(B):
        u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=T, seed=10 + b)
        us.append(u); xs.append(obs.reshape(T, 1)); sis.append(s_init)
        Pis.append(Ps_init); Qs.append(Q); Rs.append(R_v.reshape(T, 1, 1))
        params_list.append(params)
    stack = lambda lst: jnp.stack([jnp.asarray(v) for v in lst])
    params_b = jax.tree.map(lambda *l: jnp.stack(l), *params_list)
    res = batched_ekf_smoother(
        si_alpha_ekf_system("NEWCASES"), stack(us), stack(xs), params_b,
        stack(sis), stack(Pis), Q=stack(Qs), R=stack(Rs),
        gamma_discount=0.995)
    assert res.s_smooth.shape == (B, T, 3)
    # lane 0 must equal the unbatched run exactly
    u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=T, seed=10)
    single = ekf_smoother(
        si_alpha_ekf_system("NEWCASES"), jnp.asarray(u), jnp.asarray(obs),
        params, jnp.asarray(s_init), jnp.asarray(Ps_init),
        Q=jnp.asarray(Q), R=jnp.asarray(R_v), gamma_discount=0.995)
    np.testing.assert_allclose(np.asarray(res.s_smooth[0]),
                               np.asarray(single.s_smooth), rtol=1e-12)


def test_ekf_matches_oracle_totalcases():
    """TOTALCASES observation model (x = 1 - s) parity vs the oracle."""
    T = 100
    rng = np.random.default_rng(11)
    u = rng.integers(0, 3, size=(T, P_NPI)).astype(float)
    a_true = 0.004 * rng.random(P_NPI)
    pr = dict(dt=1.0, beta=0.15, gamma=1.0 / 7.0, a=a_true, b=0.05,
              u_min=np.zeros(P_NPI), u_max=U_MAX, s_min=1e-6, i_min=1e-6,
              alpha_min=1e-8, alpha_max=100.0)
    s, i, al = si_alpha_controlled_rollout(
        u, 0.999, 1e-4, 0.25, U_MAX, pr["alpha_min"], pr["alpha_max"],
        pr["gamma"], a_true, pr["b"], pr["beta"], 0.0, 0.0, 0.0, T, 1.0)
    obs = 1.0 - np.asarray(s) + 1e-5 * rng.standard_normal(T)
    params = SIAlphaParams(**pr)
    s_init = np.array([0.999, 1e-4, 0.25])
    Ps_init = np.diag([1e-4, 1e-6, 0.1])
    Q = np.diag([1e-8, 1e-8, 1e-4])
    R_v = np.full(T, 1e-10)

    res = ekf_smoother(
        si_alpha_ekf_system("TOTALCASES"), jnp.asarray(u), jnp.asarray(obs),
        params, jnp.asarray(s_init), jnp.asarray(Ps_init),
        Q=jnp.asarray(Q), R=jnp.asarray(R_v), gamma_discount=0.995)

    handles = oracle_ekf.si_alpha_handles("TOTALCASES")
    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.generic_ekf(
        u.T, obs.reshape(1, -1), handles, pr_np, s_init, Ps_init,
        np.full(3, np.nan), np.full((3, 3), np.nan), np.zeros(3),
        np.zeros(1), Q, R_v, 1.0, 0.995, 21, 1)
    assert_parity(res, ref)
