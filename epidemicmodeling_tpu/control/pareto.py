"""Pareto-front utilities for the epsilon sweep.

Reference behavior:
- epsilon grid: 250-point log + linear mixture
  (testScripts/testPrescribeXPRIZE02.m:49-53).
- Pareto-front membership: a point (J0_i, J1_i) is on the front iff no other
  point strictly dominates it in both objectives
  (Tools/TrainPredictPrescribeNPI.m:624-628).
- Monte-Carlo baseline: 500 random NPI schedules, half constant over time,
  half random per day (Tools/TrainPredictPrescribeNPI.m:496-522).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def epsilon_grid(n_points: int = 250, dtype=None):
    """The XPRIZE epsilon grid (testPrescribeXPRIZE02.m:49-53): half the
    points logarithmic, logspace(-12, -eps, n/2) ~ [1e-12, 1], then half
    linear, linspace(eps, 1-eps, n/2). epsilon=0 neglects the NPI cost;
    epsilon=1 neglects the human cost."""
    fdtype = dtype or jnp.result_type(float)
    n_log = n_points // 2
    n_lin = n_points - n_log
    meps = float(jnp.finfo(jnp.float64).eps)
    log_part = jnp.logspace(-12.0, -meps, n_log, dtype=fdtype)
    lin_part = jnp.linspace(meps, 1.0 - meps, n_lin, dtype=fdtype)
    return jnp.concatenate([log_part, lin_part])


def pareto_front_mask(J0, J1):
    """Boolean mask of Pareto-efficient points: True where no other point has
    strictly smaller J0 AND strictly smaller J1 (both minimized)
    (Tools/TrainPredictPrescribeNPI.m:624-628).
    J0, J1: (N,). O(N^2) pairwise — N <= 2000, one fused kernel."""
    J0 = jnp.asarray(J0)
    J1 = jnp.asarray(J1)
    dominated = (J0[None, :] < J0[:, None]) & (J1[None, :] < J1[:, None])
    return ~jnp.any(dominated, axis=1)


@jax.jit
def pareto_front_mask_batched(J0, J1):
    """Vectorized per-region front membership: J0, J1 (E, R) -> (E, R).
    Jitted: the (E, E, R) dominance cube is one fused device kernel and a
    (E, R) bool fetch instead of several eager dispatches (~27 ms -> ~2 ms
    at 250x235 through the TPU tunnel)."""
    J0 = jnp.asarray(J0)
    J1 = jnp.asarray(J1)
    dominated = ((J0[None, :, :] < J0[:, None, :])
                 & (J1[None, :, :] < J1[:, None, :]))   # (E, E, R)
    return ~jnp.any(dominated, axis=1)


def random_npi_schedules(key, n_scenarios, npi_mins, npi_maxes, T):
    """Draw the Monte-Carlo baseline NPI schedules: scenario s < N/2 uses one
    random level per NPI held constant over time; the rest re-draw per day
    (Tools/TrainPredictPrescribeNPI.m:500-510). Integer levels are inclusive
    of both bounds like MATLAB randi.

    Returns (N, T, P) float array.
    """
    lo = jnp.asarray(npi_mins, jnp.int32).reshape(-1)
    hi = jnp.asarray(npi_maxes, jnp.int32).reshape(-1)
    P = lo.shape[0]
    k1, k2 = jax.random.split(key)
    const_draw = jax.random.randint(k1, (n_scenarios, 1, P), lo, hi + 1)
    daily_draw = jax.random.randint(k2, (n_scenarios, T, P), lo, hi + 1)
    const_full = jnp.broadcast_to(const_draw, (n_scenarios, T, P))
    is_const = (jnp.arange(n_scenarios) < n_scenarios // 2)[:, None, None]
    return jnp.where(is_const, const_full, daily_draw).astype(
        jnp.result_type(float))
