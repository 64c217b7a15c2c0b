"""Publication-style figures mirroring the reference's visual QC
(SURVEY.md §4 #1):

- per-state estimate curves with sigma envelopes
  (Tools/TrainPredictPrescribeNPI.m:534-583)
- new-case scenario comparison on a log axis (:635-694)
- the Pareto cloud: blue random / black fixed / red optimal front
  (:848-866, README.md:22-24)
- backtest error-vs-horizon curves (Tools/ForecastQualityAssessment.m:423-429)

All functions take arrays, draw on a provided/created matplotlib Axes, and
return the figure — headless-safe (Agg).
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def select_optimal_index(J0, J1):
    """The reference's showcased tradeoff point: the epsilon index minimizing
    (J0/max(J0))^2 + (J1/max(J1))^2 (TrainPredictPrescribeNPI.m:633).
    J0, J1: (E,). Returns int index."""
    J0 = np.asarray(J0, float)
    J1 = np.asarray(J1, float)
    n0 = np.max(J0) if np.max(J0) > 0 else 1.0
    n1 = np.max(J1) if np.max(J1) > 0 else 1.0
    return int(np.argmin((J0 / n0) ** 2 + (J1 / n1) ** 2))


def plot_state_estimates(s_minus=None, s_plus=None, s_smooth=None,
                         P_minus=None, P_plus=None, P_smooth=None,
                         state_names=("s", "i", r"$\alpha$"), title=None,
                         path=None):
    """Per-state errorbar-style curves (estimate +- sqrt(P_ii) envelope).
    Arrays: (T, m) states and optional (T, m, m) covariances."""
    plt = _plt()
    ref = next(a for a in (s_smooth, s_plus, s_minus) if a is not None)
    m = np.asarray(ref).shape[1]
    fig, axes = plt.subplots(m, 1, figsize=(9, 2.4 * m), sharex=True)
    axes = np.atleast_1d(axes)
    series = [("minus", s_minus, P_minus), ("plus", s_plus, P_plus),
              ("smooth", s_smooth, P_smooth)]
    for k in range(m):
        ax = axes[k]
        for label, S, P in series:
            if S is None:
                continue
            S = np.asarray(S)
            ax.plot(S[:, k], label=label, lw=1.2)
            if P is not None:
                P = np.asarray(P)
                sd = np.sqrt(np.maximum(P[:, k, k], 0.0))
                ax.fill_between(np.arange(S.shape[0]), S[:, k] - sd,
                                S[:, k] + sd, alpha=0.2)
        ax.set_ylabel(state_names[k] if k < len(state_names) else f"x{k}")
        ax.grid(True, alpha=0.3)
    axes[0].legend(loc="best", fontsize=8)
    if title:
        axes[0].set_title(title)
    axes[-1].set_xlabel("days")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig


def plot_scenarios(cases_by_scenario: dict, population: float = 1.0,
                   ground_truth=None, title=None, path=None):
    """New-case curves for the NPI scenarios on a log axis
    (the reference's headline figure, :635-660).
    cases_by_scenario: {label: (T,) normalized new-case series}."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(9, 5))
    if ground_truth is not None:
        ax.plot(np.asarray(ground_truth), "k", lw=2.5, label="Ground truth")
    for label, series in cases_by_scenario.items():
        ax.plot(population * np.asarray(series), lw=1.6, label=label)
    ax.set_yscale("log")
    ax.set_ylim(bottom=1)
    ax.set_xlabel("days")
    ax.set_ylabel("daily new cases")
    ax.grid(True, alpha=0.3)
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig


def plot_pareto_cloud(J0_random, J1_random, J0_opt, J1_opt, front_mask=None,
                      J0_fixed=None, J1_fixed=None, population: float = 1.0,
                      title=None, path=None):
    """The Pareto figure: blue random cloud, red optimal front, black 'x'
    fixed-NPI point (TrainPredictPrescribeNPI.m:848-866)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(population * np.asarray(J0_random), np.asarray(J1_random), "bo",
            ms=4, alpha=0.5, label="random NPI")
    J0_opt = np.asarray(J0_opt)
    J1_opt = np.asarray(J1_opt)
    if front_mask is not None:
        fm = np.asarray(front_mask, bool)
        ax.plot(population * J0_opt[fm], J1_opt[fm], "ro", ms=5,
                label="optimal (Pareto front)")
    else:
        ax.plot(population * J0_opt, J1_opt, "ro", ms=5, label="optimal")
    if J0_fixed is not None:
        ax.plot(population * np.asarray(J0_fixed), np.asarray(J1_fixed),
                "kx", ms=14, mew=3, label="fixed NPI")
    ax.set_xlabel("Human factor")
    ax.set_ylabel("NPI cost")
    ax.grid(True, alpha=0.3)
    ax.legend()
    ax.set_box_aspect(1)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig


def plot_backtest_curves(est_error, title=None, path=None):
    """Error-vs-horizon curves: per-start-day grey traces + mean/median
    overlays (ForecastQualityAssessment.m:423-429). est_error: (S, H)."""
    plt = _plt()
    E = np.asarray(est_error)
    H = E.shape[1]
    fig, ax = plt.subplots(figsize=(9, 5))
    hx = np.arange(1, H + 1)
    ax.plot(hx, E.T, color="0.6", lw=0.5, alpha=0.6)
    ax.plot(hx, np.mean(E, axis=0), "b", lw=3, label="mean")
    ax.plot(hx, np.median(E, axis=0), "k", lw=3, label="median")
    ax.set_xlabel("look-ahead horizon (days)")
    ax.set_ylabel("% error")
    ax.grid(True, alpha=0.3)
    ax.legend()
    if title:
        ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
