"""SIR compartmental model (Euler discretization).

Reference behavior: testScripts/testSIR01.m:32-36 — 3-compartment Euler loop
with time-invariant contact rate alpha, recovery rate beta and immunity-loss
rate gamma, step dt. Here the loop is a ``lax.scan`` over a pure step function,
so it jits, differentiates, and vmaps over parameter/scenario batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sir_step(state, params, _t=None):
    """One Euler step of ds/dt = -a s i + g r ; di/dt = a s i - b i ; dr/dt = b i - g r.

    state: (3,) [s, i, r]; params: dict with alpha, beta, gamma, dt (scalars).
    """
    s, i, r = state[0], state[1], state[2]
    a, b, g, dt = params["alpha"], params["beta"], params["gamma"], params["dt"]
    ds = -a * s * i + g * r
    di = a * s * i - b * i
    dr = b * i - g * r
    return jnp.stack([s + dt * ds, i + dt * di, r + dt * dr])


def sir_rollout(s0, i0, r0, alpha, beta, gamma, T, dt):
    """Roll the SIR model for K = round(T/dt) steps; returns (s, i, r) each (K,).

    Matches testScripts/testSIR01.m: trajectories include the initial condition
    as the first sample (K samples total, K-1 Euler updates).
    """
    K = int(round(T / dt))
    params = {"alpha": alpha, "beta": beta, "gamma": gamma, "dt": dt}
    x0 = jnp.stack([jnp.asarray(s0, jnp.result_type(float)),
                    jnp.asarray(i0, jnp.result_type(float)),
                    jnp.asarray(r0, jnp.result_type(float))])

    def body(carry, _):
        nxt = sir_step(carry, params)
        return nxt, carry

    _, traj = jax.lax.scan(body, x0, None, length=K)
    return traj[:, 0], traj[:, 1], traj[:, 2]
