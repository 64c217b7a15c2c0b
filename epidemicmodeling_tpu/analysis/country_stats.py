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


def causal_moving_average(x, wlen: int = 7, clip_negative: bool = True):
    """MATLAB ``filter(ones(1, wlen), wlen, x')'`` over the trailing time
    axis with negatives then clamped to 0 (testCountryStatistics04.m:25-30).
    Thin wrapper adding the clamp to the shared FIR implementation
    (utils.math.causal_moving_average)."""
    from ..utils.math import causal_moving_average as _ma
    y = _ma(jnp.asarray(x, jnp.result_type(float)), wlen)
    return jnp.maximum(y, 0.0) if clip_negative else y


def lagged_case_rate(total_cases, infected, lag: int = 0,
                     smoothed: bool = False, wlen: int = 7):
    """``Rate = NewCases(:, 1+lag:end) ./ Infected(:, 1:end-1-lag)`` with
    negatives clamped to 0 (testCountryStatistics04.m:24-34): the lagged
    new-cases-per-active-infection curve family. With ``smoothed=True`` both
    series first pass the 7-day causal MA (the commented variant at :32).

    total_cases, infected: (..., T). Returns (..., T-1-lag)."""
    total = jnp.asarray(total_cases)
    inf = jnp.asarray(infected)
    new_cases = jnp.diff(total, axis=-1)
    if smoothed:
        new_cases = causal_moving_average(new_cases, wlen)
        inf = causal_moving_average(inf, wlen)
    T1 = new_cases.shape[-1]
    rate = new_cases[..., lag:] / inf[..., : T1 - lag]
    return jnp.maximum(rate, 0.0)
