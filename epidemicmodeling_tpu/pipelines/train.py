"""Training-only pipeline + mortality/recovery-rate estimation.

Reference behavior: Tools/TrainNPIPrescriptor.m — the two-round EKF +
regression training front-end (:137-245, shared with the flagship via
pipelines/core.train_regions), plus the death-based epidemiological
parameter estimates (:264-273):
- MortalityRate = smoothed deaths / smoothed cases, NaNs -> 0; median and
  recent-quartile median
- CumInfections = cumsum(N * i_smooth)
- BetaEstimate = (deaths / CumInfections) / MedRecentMortalityRate, with the
  recent-quartile median as the headline estimate
Saves the same TrainedModelParams product (:451-454 -> checkpoint.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from .config import PipelineConfig
from .core import train_regions, TrainOutputs


class MortalityEstimates(NamedTuple):
    """Per-region mortality and beta estimates from the deaths series
    (TrainNPIPrescriptor.m:264-273)."""
    mortality_rate: np.ndarray          # (R, T)
    med_mortality: np.ndarray           # (R,)
    med_recent_mortality: np.ndarray    # (R,)
    beta_estimate: np.ndarray           # (R, T)
    med_recent_beta: np.ndarray         # (R,)


def estimate_mortality_beta(batch, deaths_smoothed, confirmed_deaths,
                            train_out: TrainOutputs) -> MortalityEstimates:
    """Death-based mortality + recovery-rate estimates
    (TrainNPIPrescriptor.m:264-273).

    batch: training RegionBatch; deaths_smoothed: (R, T) smoothed daily
    deaths; confirmed_deaths: (R, T) cumulative deaths.
    """
    R, T = batch.observations.shape
    # numpy upfront: these fields may be replicated jax arrays under a
    # mesh (parallel.mesh.REGION_BATCH_ARRAY_FIELDS); host math below
    pop = np.asarray(batch.population)
    cases_smoothed = np.asarray(batch.new_cases_norm) * pop[:, None]
    conf_smoothed = np.cumsum(cases_smoothed, axis=1)
    dead_smoothed_cum = np.cumsum(np.asarray(deaths_smoothed), axis=1)

    mr = dead_smoothed_cum / conf_smoothed
    mr[~np.isfinite(mr)] = 0.0
    med = np.median(mr, axis=1)
    q = (3 * T) // 4
    med_recent = np.median(mr[:, q:], axis=1)

    i_smooth = np.asarray(train_out.s_smooth_round2[:, :, 1])
    cum_inf = np.cumsum(pop[:, None] * i_smooth, axis=1)
    beta_est = np.asarray(confirmed_deaths) / cum_inf
    beta_est = beta_est / np.where(med_recent[:, None] > 0,
                                   med_recent[:, None], np.nan)
    med_recent_beta = np.nanmedian(beta_est[:, q:], axis=1)
    return MortalityEstimates(mr, med, med_recent, beta_est, med_recent_beta)


def train_npi_prescriptor(batch, npi_mins, npi_maxes, num_regression_days,
                          deaths_smoothed="from_batch",
                          confirmed_deaths="from_batch",
                          trained_params_file: Optional[str] = None,
                          cfg: PipelineConfig = PipelineConfig(),
                          dtype=None):
    """Training-only entry point (Tools/TrainNPIPrescriptor.m:1): two-round
    EKF + regression over all regions, optional mortality/beta estimation,
    checkpoint save. Returns (TrainOutputs, MortalityEstimates | None)."""
    train_out = train_regions(batch, npi_mins, npi_maxes,
                              num_regression_days, cfg, dtype)
    if isinstance(deaths_smoothed, str):
        deaths_smoothed = batch.deaths_smoothed
    if isinstance(confirmed_deaths, str):
        confirmed_deaths = batch.confirmed_deaths
    mort = None
    if deaths_smoothed is not None and confirmed_deaths is not None:
        mort = estimate_mortality_beta(batch, deaths_smoothed,
                                       confirmed_deaths, train_out)
    if trained_params_file:
        from .checkpoint import save_trained_params
        save_trained_params(trained_params_file, train_out.trained)
    return train_out, mort
