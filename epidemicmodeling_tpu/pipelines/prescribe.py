"""Standalone NPI prescriptor (prescribe from trained parameters).

Reference behavior: Tools/PrescribeNPI.m (the older standalone prescriptor)
and testScripts/testPrescribeXPRIZE01.m (prescribe from a saved checkpoint
without retraining):
- AR(ar_order) forecasting of the contact rate alpha from its training tail
  (PrescribeNPI.m:202-214): fit, then roll a noise-driven forecast
- random-input Monte-Carlo scenarios scored with SI rollouts on the
  AR-predicted alpha modulated by the NPI influence model (:222-256)
- finite-horizon optimal control with the pre-generic 6-state estimator
  (NewCaseEKFEstimatorWithOptimalNPI — the generic core with joseph=False,
  no symmetrization, solve-gain smoother, always-adaptive R) (:265-287)
- testPrescribeXPRIZE01 sweeps up to 2000 epsilon values per region from
  saved (a, b) coefficients (:160-198)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import si_alpha_costate_ekf_system
from ..models.si_alpha import si_controlled_rollout
from ..ops import ekf_smoother
from ..ops.ar import ar_fit, ar_forecast
from ..control import npi_cost
from .config import PipelineConfig
from .core import pareto_prescribe, monte_carlo_baseline, \
    TrainedRegionParams, RegionInit


def new_case_ekf_optimal_npi(u, x, params, s_init, Ps_init, s_final=None,
                             Ps_final=None, w_bar=None, v_bar=None, Q=1.0,
                             R=1.0, beta=1.0, gamma=1.0, inv_monitor_len=21,
                             order=1, obs_type="NEWCASES"):
    """Drop-in for Tools/NewCaseEKFEstimatorWithOptimalNPI.m: the 6-state
    optimal-NPI EKF/EKS with the pre-generic numerics (no Joseph form, no
    covariance symmetrization, mrdivide smoother gain, R adapted on every
    valid step). This is also the deployment-codegen target of the
    reference's MatlabCodeGenerator (SURVEY.md §2.9); see deploy/ for the
    native C++ twin.

    Known immaterial deviation: for a PARTIALLY-NaN Ps_final the MATLAB
    writes the terminal smoothed covariance as a rectangular cross-product
    (`P_SMOOTH(row, col, T) = Ps_final(row, col)`,
    NewCaseEKFEstimatorWithOptimalNPI.m:125-127 — ind2sub vectors index a
    submatrix), which would splat NaN entries into P_SMOOTH; we keep the
    generic element-wise semantics (GEKF.m:198-202). Every ACTIVE call
    site in the reference passes Ps_final = nan(6) (PrescribeNPI.m:152,
    testSIModelOptimalControl04EKS.m:167 — the partial patterns are
    commented out), where both readings are identical no-ops."""
    return ekf_smoother(
        si_alpha_costate_ekf_system(obs_type), u, x, params, s_init, Ps_init,
        s_final, Ps_final, w_bar, v_bar, Q, R, beta=beta,
        gamma_discount=gamma, inv_monitor_len=inv_monitor_len, order=order,
        joseph=False, symmetrize_covs=False, smoother_gain="solve",
        adaptive_R_always=True)


class ARPrescriptionResult(NamedTuple):
    """AR-forecast prescription outputs (PrescribeNPI.m:202-256)."""
    alpha_forecast: jnp.ndarray     # (H,) AR-forecast alpha (zero-noise)
    J0_random: jnp.ndarray          # (N_mc,) random-scenario human costs
    J1_random: jnp.ndarray          # (N_mc,)
    s_scenarios: jnp.ndarray        # (N_mc, T_hist_tail + H)
    i_scenarios: jnp.ndarray


def ar_alpha_prescription(alpha_train, a_coef, b_coef, beta_model,
                          gamma_model, npi_mins, npi_maxes, npi_weights,
                          s0, i0, n_ahead: int, ar_order: int = 24,
                          ar_learning_history: int = 90,
                          n_monte_carlo: int = 10, key=None):
    """AR-forecast alpha and score random NPI scenarios with SI rollouts
    (PrescribeNPI.m:202-256).

    alpha_train: (T,) smoothed alpha from training. For each scenario the
    future alpha is the AR forecast plus gamma*(a.u' + b) NPI modulation,
    clipped at 0; the SI model then rolls (s, i) and costs are scored.
    """
    alpha_train = jnp.asarray(alpha_train).reshape(-1)
    tail = alpha_train[-ar_learning_history:]
    a_ar, nv = ar_fit(tail, ar_order)
    if key is None:
        key = jax.random.PRNGKey(0)
    k_ar, k_mc = jax.random.split(key)
    y_pred = ar_forecast(tail, a_ar, nv, n_ahead, key=k_ar)

    P = len(npi_maxes)
    lo = jnp.asarray(npi_mins, jnp.int32)
    hi = jnp.asarray(npi_maxes, jnp.int32)
    u_draw = jax.random.randint(k_mc, (n_monte_carlo, n_ahead, P), lo, hi + 1
                                ).astype(alpha_train.dtype)
    w_daywise = jnp.asarray(npi_weights)[None, :] * jnp.ones(
        (ar_learning_history + n_ahead, P))

    def scenario(u_s):
        alpha_mod = y_pred + gamma_model * (u_s @ jnp.asarray(a_coef)
                                            + b_coef)
        alpha_full = jnp.concatenate([tail, alpha_mod])
        alpha_full = jnp.maximum(alpha_full, 0.0)  # (:215 clip at zero)
        s, i = si_controlled_rollout(alpha_full, beta_model, s0, i0,
                                     alpha_full.shape[0], 1.0)
        u_full = jnp.concatenate(
            [jnp.zeros((ar_learning_history, P), u_s.dtype), u_s])
        J0, J1 = npi_cost(s * i * alpha_full, u_full.T, w_daywise.T)
        return J0, J1, s, i

    J0, J1, s_all, i_all = jax.vmap(scenario)(u_draw)
    return ARPrescriptionResult(y_pred, J0, J1, s_all, i_all)


def prescribe_from_checkpoint(trained: TrainedRegionParams, batch_full,
                              s_hist, init: RegionInit, epsilon_values,
                              npi_weights, npi_mins, npi_maxes, T_hist,
                              cfg: PipelineConfig = PipelineConfig(),
                              key=None, dtype=None):
    """testPrescribeXPRIZE01-style prescription from saved parameters: the
    full epsilon sweep + Monte-Carlo baseline, no retraining."""
    par = pareto_prescribe(batch_full, trained, init, s_hist,
                           epsilon_values, npi_weights, npi_mins, npi_maxes,
                           T_hist, cfg, key=key, dtype=dtype)
    mc = monte_carlo_baseline(batch_full, trained, init, s_hist, npi_weights,
                              npi_mins, npi_maxes, T_hist, cfg, key=key,
                              dtype=dtype)
    return par, mc
