"""Filter-health diagnostics (the framework's failure-detection layer).

The reference's only online health metric is the innovation-whiteness
monitor rho (GenericExtendedKalmanFilter.m:171-179, plotted per region at
TrainPredictPrescribeNPI.m:708-713) plus NaN/Inf covariance guards
(GEKF.m:211-216). Here those signals become a structured per-region report
suitable for automated gating of batch runs (SURVEY.md §5: the reference has
no system-level failure detection; this is the TPU-native equivalent).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class FilterHealth(NamedTuple):
    """Per-region filter-health report (NaN/explosion/whiteness checks)."""
    nan_states: np.ndarray        # (R,) bool: any non-finite state estimate
    rho_mean: np.ndarray          # (R,) innovation-whiteness mean (tail)
    rho_consistent: np.ndarray    # (R,) bool: rho in [lo, hi] (filter tuned)
    state_explosion: np.ndarray   # (R,) bool: |state| exceeded bound
    healthy: np.ndarray           # (R,) bool: all checks pass


def filter_health(s_smooth, rho=None, rho_band=(0.1, 10.0),
                  state_bound: float = 1e6, tail_fraction: float = 0.5
                  ) -> FilterHealth:
    """Assess a batch of filter runs.

    s_smooth: (R, T, m) smoothed states; rho: optional (R, T) whiteness
    monitor. A consistent (well-tuned) filter has rho near 1: rho >> 1 means
    the observation noise is underestimated, rho << 1 overestimated
    (the reference plots exactly this signal per region).
    """
    S = np.asarray(s_smooth)
    R, T, m = S.shape
    nan_states = ~np.isfinite(S).all(axis=(1, 2))
    explosion = (np.abs(np.nan_to_num(S)) > state_bound).any(axis=(1, 2))
    if rho is not None:
        rho = np.asarray(rho)
        t0 = int(T * (1 - tail_fraction))
        rho_mean = np.nanmean(rho[:, t0:], axis=1)
        consistent = ((rho_mean >= rho_band[0])
                      & (rho_mean <= rho_band[1])
                      & np.isfinite(rho_mean))
    else:
        rho_mean = np.full(R, np.nan)
        consistent = np.ones(R, bool)
    healthy = (~nan_states) & (~explosion) & consistent
    return FilterHealth(nan_states, rho_mean, consistent, explosion, healthy)


def summarize_health(health: FilterHealth, names=None) -> str:
    """One-line-per-problem summary for logs."""
    lines = [f"{int(health.healthy.sum())}/{len(health.healthy)} regions "
             f"healthy"]
    for r in np.flatnonzero(~health.healthy):
        name = names[r] if names is not None else f"region {r}"
        issues = []
        if health.nan_states[r]:
            issues.append("non-finite states")
        if health.state_explosion[r]:
            issues.append("state explosion")
        if not health.rho_consistent[r]:
            issues.append(f"rho={health.rho_mean[r]:.2f} (inconsistent)")
        lines.append(f"  {name}: " + ", ".join(issues))
    return "\n".join(lines)
