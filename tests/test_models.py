"""Dynamics-kernel tests: analytic cross-checks mirroring the reference's
validation style (SURVEY.md §4 #2-#3) plus NumPy-loop golden comparisons."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.models import (
    sir_rollout,
    seirp_rollout,
    seirp_saturated_rollout,
    si_controlled_rollout,
    si_alpha_controlled_rollout,
)
from epidemicmodeling_tpu.models.seirp import seirp_linearized_matrices


def numpy_seirp(alpha_e, alpha_i, kappa, rho, beta, mu, gamma,
                s0, e0, i0, r0, p0, T, dt):
    K = int(round(T / dt))
    s, e, i, r, p = (np.zeros(K) for _ in range(5))
    s[0], e[0], i[0], r[0], p[0] = s0, e0, i0, r0, p0
    for t in range(K - 1):
        s[t + 1] = (-alpha_e[t] * s[t] * e[t] - alpha_i[t] * s[t] * i[t]
                    + gamma[t] * r[t]) * dt + s[t]
        e[t + 1] = (alpha_e[t] * s[t] * e[t] + alpha_i[t] * s[t] * i[t]
                    - kappa[t] * e[t] - rho[t] * e[t]) * dt + e[t]
        i[t + 1] = (kappa[t] * e[t] - beta[t] * i[t] - mu[t] * i[t]) * dt + i[t]
        r[t + 1] = (beta[t] * i[t] + rho[t] * e[t] - gamma[t] * r[t]) * dt + r[t]
        p[t + 1] = (mu[t] * i[t]) * dt + p[t]
    return s, e, i, r, p


def test_seirp_matches_numpy_loop():
    T, dt = 100.0, 0.1
    K = int(round(T / dt))
    rng = np.random.default_rng(0)
    rates = [0.3 + 0.1 * rng.random(K) for _ in range(7)]
    init = (0.99, 0.005, 0.005, 0.0, 0.0)
    ref = numpy_seirp(*rates, *init, T, dt)
    got = seirp_rollout(*rates, *init, T, dt)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-12, atol=1e-14)


def test_seirp_mass_conservation():
    # d(s+e+i+r+p)/dt = 0 for the SEIRP equations — Euler preserves the sum.
    K = 1000
    rates = [np.full(K, v) for v in (0.6, 0.4, 0.2, 0.05, 0.1, 0.02, 0.01)]
    s, e, i, r, p = seirp_rollout(*rates, 0.95, 0.03, 0.02, 0.0, 0.0, 100.0, 0.1)
    total = np.asarray(s + e + i + r + p)
    np.testing.assert_allclose(total, 1.0, rtol=1e-9)


def test_seirp_early_phase_linearization():
    """Early phase (s ~= 1): the nonlinear solution should track the linearized
    system exp(A t) x0 — the analytic cross-check of testSEIRP01.m:106-122."""
    import scipy.linalg as sla

    ae, ai, ka, ro, be, mu, ga = 0.4, 0.3, 0.2, 0.05, 0.1, 0.01, 0.0
    dt, T = 0.01, 5.0
    K = int(round(T / dt))
    rates = [np.full(K, v) for v in (ae, ai, ka, ro, be, mu, ga)]
    e0, i0 = 1e-6, 1e-6
    s, e, i, r, p = seirp_rollout(*rates, 1.0 - e0 - i0, e0, i0, 0.0, 0.0, T, dt)
    A = np.asarray(seirp_linearized_matrices(ae, ai, ka, ro, be, mu, ga))
    # linear sub-system for (e, i): rows/cols 1,2 of A
    A_ei = A[1:3, 1:3]
    x0 = np.array([e0, i0])
    t_end = (K - 1) * dt
    x_lin = sla.expm(A_ei * t_end) @ x0
    np.testing.assert_allclose(
        np.array([np.asarray(e)[-1], np.asarray(i)[-1]]), x_lin, rtol=2e-2)


def test_seirp_saturated_reduces_to_plain_when_rates_equal():
    K = 500
    rates5 = [np.full(K, v) for v in (0.5, 0.3, 0.2, 0.05, 0.01)]
    beta0, mu0 = 0.1, 0.02
    s1, e1, i1, r1, p1 = seirp_saturated_rollout(
        *rates5, 0.99, 0.005, 0.005, 0.0, 0.0, 50.0, 0.1,
        beta0, beta0, mu0, mu0, 0.01, 0.1)
    rates7 = [rates5[0], rates5[1], rates5[2], rates5[3],
              np.full(K, beta0), np.full(K, mu0), rates5[4]]
    s2, e2, i2, r2, p2 = seirp_rollout(
        *rates7, 0.99, 0.005, 0.005, 0.0, 0.0, 50.0, 0.1)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-12)


def test_seirp_saturated_breakdown_increases_deaths():
    """Above the saturation threshold, mortality mu_s > mu_0 must produce more
    cumulative deaths than the unsaturated system (testSEIRP03.m behavior)."""
    K = 2000
    rates5 = [np.full(K, v) for v in (0.9, 0.5, 0.3, 0.0, 0.0)]
    common = dict(s0=0.99, e0=0.005, i0=0.005, r0=0.0, p0=0.0, T=200.0, dt=0.1)
    _, _, _, _, p_sat = seirp_saturated_rollout(
        *rates5, *common.values(), 0.1, 0.05, 0.02, 0.2, 0.01, 0.05)
    _, _, _, _, p_nom = seirp_saturated_rollout(
        *rates5, *common.values(), 0.1, 0.1, 0.02, 0.02, 0.01, 0.05)
    assert float(p_sat[-1]) > float(p_nom[-1])


def test_sir_rollout_shapes_and_mass():
    s, i, r = sir_rollout(0.99, 0.01, 0.0, 0.5, 0.2, 0.0, 100.0, 0.1)
    assert s.shape == (1000,)
    np.testing.assert_allclose(np.asarray(s + i + r), 1.0, rtol=1e-9)
    assert float(i.max()) > 0.01  # epidemic takes off for alpha > beta


def test_si_controlled_matches_numpy():
    K, dt, beta = 300, 1.0, 0.1
    rng = np.random.default_rng(1)
    alpha = 0.05 + 0.2 * rng.random(K)
    s_ref = np.zeros(K); i_ref = np.zeros(K)
    s_ref[0], i_ref[0] = 0.999, 0.001
    for t in range(K - 1):
        s_ref[t + 1] = max(0.0, min(1.0, s_ref[t] - dt * alpha[t] * s_ref[t] * i_ref[t]))
        i_ref[t + 1] = max(0.0, min(1.0, i_ref[t] + dt * (
            alpha[t] * s_ref[t] * i_ref[t] - beta * i_ref[t])))
    s, i = si_controlled_rollout(alpha, beta, 0.999, 0.001, K, dt)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(i), i_ref, rtol=1e-12)


def test_si_alpha_controlled_noise_free_matches_numpy():
    """Golden comparison with a direct NumPy loop of
    Tools/SIalpha_Controlled.m semantics (noise-free)."""
    K, dt = 200, 1.0
    p = 12
    rng = np.random.default_rng(2)
    u = rng.integers(0, 4, size=(p, K)).astype(float)
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    a = 0.01 * rng.random(p)
    b, beta, gamma = 0.05, 0.1, 1.0 / 7.0
    alpha_min, alpha_max = 1e-8, 100.0
    s0, i0, alpha0 = 0.999, 0.001, 0.3

    s_ref = np.zeros(K + 1); i_ref = np.zeros(K + 1); al_ref = np.zeros(K + 1)
    s_ref[0], i_ref[0], al_ref[0] = s0, i0, alpha0
    for t in range(K):
        s_ref[t + 1] = max(0.0, min(1.0, s_ref[t] - dt * al_ref[t] * s_ref[t] * i_ref[t]))
        i_ref[t + 1] = max(0.0, min(1.0, i_ref[t] + dt * (
            al_ref[t] * s_ref[t] * i_ref[t] - beta * i_ref[t])))
        al_ref[t + 1] = max(alpha_min, min(alpha_max, al_ref[t] + dt * (
            -gamma * al_ref[t] + gamma * b + gamma * a @ (u_max - u[:, t]))))

    s, i, al = si_alpha_controlled_rollout(
        u, s0, i0, alpha0, u_max, alpha_min, alpha_max, gamma, a, b, beta,
        0.0, 0.0, 0.0, K, dt)
    np.testing.assert_allclose(np.asarray(s), s_ref[1:], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(i), i_ref[1:], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(al), al_ref[1:], rtol=1e-12)


def test_si_alpha_vmaps_over_scenarios():
    K, p = 50, 12
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    us = jax.vmap(lambda k: jax.random.randint(k, (K, p), 0, 4).astype(float))(keys)

    def run(u):
        return si_alpha_controlled_rollout(
            u, 0.999, 0.001, 0.3, u_max, 1e-8, 100.0, 1 / 7, 0.01 * np.ones(p),
            0.05, 0.1, 0.0, 0.0, 0.0, K, 1.0)

    s, i, al = jax.vmap(run)(us)
    assert s.shape == (B, K)
    assert bool(jnp.all(jnp.isfinite(s)))
