"""Country-level comparative statistics.

Reference behavior: testScripts/testCountryStatistics01-04.m — mortality
ratios, active-case curves (confirmed - deaths - recovered), and the R0
estimate via generation ratios R0(t) = (I(t)/I(t-p))^(1/p)
(testCountryStatistics03.m), optionally on Tikhonov-smoothed series.
"""

from __future__ import annotations

import jax.numpy as jnp


def mortality_rate(confirmed_deaths, confirmed_cases):
    """Deaths / cases with NaN (0/0) mapped to 0
    (TrainNPIPrescriptor.m:264-266)."""
    r = jnp.asarray(confirmed_deaths) / jnp.asarray(confirmed_cases)
    return jnp.where(jnp.isfinite(r), r, 0.0)


def active_cases(total, deceased, recovered):
    """Infected = cases - deaths - recovered (Tools/ReadCOVID19Data.m:29)."""
    return (jnp.asarray(total) - jnp.asarray(deceased)
            - jnp.asarray(recovered))


def r0_generation_ratio(infected, generation_period: int):
    """R0(t) = (I(t) / I(t - p))^(1/p); first p samples are 1
    (testCountryStatistics03.m)."""
    x = jnp.asarray(infected).reshape(-1)
    p = generation_period
    ratio = (x[p:] / x[:-p]) ** (1.0 / p)
    return jnp.concatenate([jnp.ones(p, x.dtype), ratio])
