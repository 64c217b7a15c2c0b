"""SEIRP 5-compartment model (S, E, I, R, P=passed/deceased), Euler-discretized.

Reference behavior:
- Tools/SEIRP.m:26-32 — all seven rates (alpha_e, alpha_i, kappa, rho, beta,
  mu, gamma) are time series, enabling NPI scheduling.
- Tools/SEIRPSaturatedResource.m:27-35 — beta and mu interpolate between
  normal (beta_0, mu_0) and saturated (beta_s, mu_s) values through
  h = (tanh((i - i_0)/sigma) + 1)/2, modeling healthcare-system breakdown
  above the infection threshold i_0.

TPU-first shape: one pure step function + lax.scan; rates are (K,) arrays
scanned alongside the state, so the whole rollout is a single fused XLA loop
that vmaps over scenario batches (testSEIRP01.m scenarios A-E become one
batched call).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def seirp_step(state, rates, dt):
    """One Euler step. state: (5,) [s,e,i,r,p]; rates: (7,)
    [alpha_e, alpha_i, kappa, rho, beta, mu, gamma]."""
    s, e, i, r, p = state[0], state[1], state[2], state[3], state[4]
    ae, ai, ka, ro, be, mu, ga = (rates[j] for j in range(7))
    ds = -ae * s * e - ai * s * i + ga * r
    de = ae * s * e + ai * s * i - ka * e - ro * e
    di = ka * e - be * i - mu * i
    dr = be * i + ro * e - ga * r
    dp = mu * i
    return state + dt * jnp.stack([ds, de, di, dr, dp])


def seirp_rollout(alpha_e, alpha_i, kappa, rho, beta, mu, gamma,
                  s0, e0, i0, r0, p0, T, dt):
    """Roll SEIRP for K = round(T/dt) samples (first sample = initial state).

    All rate arguments are (>= K-1,) time series (scalars are broadcast).
    Returns (s, e, i, r, p), each (K,).
    """
    K = int(round(T / dt))
    fdtype = jnp.result_type(float)
    rates = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(a, fdtype), (K,)) for a in
         (alpha_e, alpha_i, kappa, rho, beta, mu, gamma)], axis=-1)  # (K, 7)
    x0 = jnp.stack([jnp.asarray(v, fdtype) for v in (s0, e0, i0, r0, p0)])

    def body(carry, r_t):
        nxt = seirp_step(carry, r_t, dt)
        return nxt, carry

    _, traj = jax.lax.scan(body, x0, rates[: K], length=K)
    return tuple(traj[:, j] for j in range(5))


def seirp_saturated_step(state, rates, dt, beta_0, beta_s, mu_0, mu_s, sigma, i_0):
    """One Euler step of SEIRP with resource saturation. rates: (5,)
    [alpha_e, alpha_i, kappa, rho, gamma]; beta/mu derived from i via tanh ramp."""
    s, e, i, r, p = state[0], state[1], state[2], state[3], state[4]
    ae, ai, ka, ro, ga = (rates[j] for j in range(5))
    h = (jnp.tanh((i - i_0) / sigma) + 1.0) / 2.0
    be = (beta_s - beta_0) * h + beta_0
    mu = (mu_s - mu_0) * h + mu_0
    ds = -ae * s * e - ai * s * i + ga * r
    de = ae * s * e + ai * s * i - ka * e - ro * e
    di = ka * e - be * i - mu * i
    dr = be * i + ro * e - ga * r
    dp = mu * i
    return state + dt * jnp.stack([ds, de, di, dr, dp])


def seirp_saturated_rollout(alpha_e, alpha_i, kappa, rho, gamma,
                            s0, e0, i0, r0, p0, T, dt,
                            beta_0, beta_s, mu_0, mu_s, sigma, i_0):
    """Saturated-resource SEIRP rollout; see seirp_rollout for conventions."""
    K = int(round(T / dt))
    fdtype = jnp.result_type(float)
    rates = jnp.stack(
        [jnp.broadcast_to(jnp.asarray(a, fdtype), (K,)) for a in
         (alpha_e, alpha_i, kappa, rho, gamma)], axis=-1)  # (K, 5)
    x0 = jnp.stack([jnp.asarray(v, fdtype) for v in (s0, e0, i0, r0, p0)])

    def body(carry, r_t):
        nxt = seirp_saturated_step(carry, r_t, dt, beta_0, beta_s, mu_0, mu_s,
                                   sigma, i_0)
        return nxt, carry

    _, traj = jax.lax.scan(body, x0, rates[: K], length=K)
    return tuple(traj[:, j] for j in range(5))


def seirp_linearized_matrices(alpha_e, alpha_i, kappa, rho, beta, mu, gamma):
    """Early-phase linearization around (s=1, e=i=r=p=0): continuous-time
    state matrix of the SEIRP model used for the analytic cross-checks in
    testScripts/testSEIRP01.m:106-122 (eigenanalysis / closed-form early phase).
    Returns the 5x5 A matrix of d/dt [s,e,i,r,p]."""
    z = jnp.zeros(())
    A = jnp.array([
        [z, -alpha_e, -alpha_i, gamma, z],
        [z, alpha_e - kappa - rho, alpha_i, z, z],
        [z, kappa, -beta - mu, z, z],
        [z, rho, beta, -gamma, z],
        [z, z, mu, z, z],
    ])
    return A
