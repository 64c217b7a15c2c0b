"""Forecast-quality backtest: look-ahead error vs horizon.

Reference behavior: Tools/ForecastQualityAssessment.m —
- train front-end identical to the flagship (two EKF rounds + regression)
- then for each holdout start day, NaN-mask the last ``start`` observations,
  rerun the 3-state EKF/EKS with the ACTUAL historic NPIs, and record the
  percent error of the reconstructed new-case curve at look-ahead horizons
  1..MaxLookAheadDays (:374-416)
- aggregate mean/median error-vs-horizon curves over start days (:423-429)

This is the paper's headline quantitative evaluation
(testScripts/testIEEEJSTSP2021ArticleResults.m). The reference reruns a full
EKF per holdout day per region serially; here the holdout-start axis is a
second vmapped batch dimension — all (region, start) filters run in one
fused kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ekf_smoother
from ..models import si_alpha_ekf_system
from .config import PipelineConfig
from .core import train_regions, _base_params, _pallas_mesh


class BacktestResult(NamedTuple):
    """Look-ahead backtest error curves (ForecastQualityAssessment.m:374-429);
    aggregates mask non-finite per-day entries (zero-truth days)."""
    est_error_plus: jnp.ndarray     # (R, S, H) % error of filtered estimate
    est_error_smooth: jnp.ndarray   # (R, S, H) % error of smoothed estimate
    mean_error_smooth: jnp.ndarray  # (R, H) mean over valid start days
    median_error_smooth: jnp.ndarray  # (R, H)
    trained: object


def forecast_quality_assessment(batch, npi_mins, npi_maxes,
                                num_regression_days: int,
                                num_forecast_days: int,
                                max_look_ahead_days: int = 60,
                                cfg: PipelineConfig = PipelineConfig(),
                                dtype=None, mesh=None) -> BacktestResult:
    """Run the look-ahead backtest over all regions.

    batch: RegionBatch over the ENTIRE window (training + evaluation tail);
    the last ``num_forecast_days`` days serve as holdout starts. Training
    uses the window up to T - num_forecast_days.

    mesh: optional ("dp", "ep") device mesh — the paper's headline
    evaluation scales the same way the flagship does: region inputs
    replicate (parallel.mesh.shard_region_batch), and the (region, start)
    lane grid (the product's largest, R x S lanes) spreads over every
    mesh device; lanes via XLA auto-SPMD, pallas via shard_map around the
    fused kernel.
    """
    import contextlib
    if mesh is not None:
        from ..parallel.mesh import shard_region_batch
        if batch.observations.shape[0] % mesh.shape["dp"]:
            raise ValueError(
                f"{batch.observations.shape[0]} regions not divisible by "
                f"mesh dp={mesh.shape['dp']}")
        batch = shard_region_batch(mesh, batch)
        ctx = mesh
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        return _forecast_quality_body(
            batch, npi_mins, npi_maxes, num_regression_days,
            num_forecast_days, max_look_ahead_days, cfg, dtype, mesh)


def _forecast_quality_body(batch, npi_mins, npi_maxes, num_regression_days,
                           num_forecast_days, max_look_ahead_days, cfg,
                           dtype, mesh) -> BacktestResult:
    fdtype = dtype or jnp.result_type(float)
    R, T = batch.observations.shape
    P = batch.npis.shape[-1]
    S = num_forecast_days
    H = max_look_ahead_days
    T_train = T - num_forecast_days
    if not (1 <= S and T_train >= 2):
        raise ValueError(
            f"num_forecast_days={S} leaves {T_train} training days of the "
            f"{T}-day series — need at least 2 (the holdout starts are the "
            "LAST num_forecast_days days)")

    # train on the head window (same front-end as the flagship)
    train_batch = batch._replace(
        observations=batch.observations[:, :T_train],
        new_cases_norm=batch.new_cases_norm[:, :T_train],
        confirmed_norm=batch.confirmed_norm[:, :T_train],
        npis=batch.npis[:, :T_train],
        obs_noise_var=batch.obs_noise_var[:, :T_train])
    train_out = train_regions(train_batch, npi_mins, npi_maxes,
                              num_regression_days, cfg, dtype, mesh=mesh)
    init = train_out.init

    obs_full = jnp.asarray(batch.observations, fdtype)       # (R, T)
    npis_full = jnp.asarray(batch.npis, fdtype)              # (R, T, P)
    R_v = jnp.asarray(batch.obs_noise_var, fdtype)

    params = _base_params(cfg, npi_mins, npi_maxes, R, fdtype)
    params["s_min"] = jnp.asarray(cfg.min_cases / batch.population, fdtype)
    params["i_min"] = jnp.asarray(cfg.min_cases / batch.population, fdtype)
    params["a"] = train_out.trained.a2
    params["b"] = train_out.trained.b2

    pop = jnp.asarray(batch.population, fdtype)

    # ground-truth absolute smoothed new cases (R, T)
    truth_cases = jnp.asarray(batch.new_cases_norm, fdtype) * pop[:, None]

    from ..ops.pallas import should_interpret
    interp = should_interpret()
    if cfg.backend in ("lanes", "pallas") and cfg.order == 1:
        # TPU fast path: every (region, start) pair is an independent lane
        # of the batch-last core — B = R*S filters in one scan instead of a
        # lane-major vmap nest (which pays the 28x covariance-padding tax
        # and compiles a separate program per nest level). NOTE the fast
        # paths always use the Cholesky solve smoother gain (their defining
        # numerics); cfg.smoother_gain applies to the vmap backend only.
        err_plus, err_smooth = _run_all_lanes(
            obs_full, npis_full, params, init.s_init, init.Ps_init, init.Q,
            R_v, truth_cases, pop, cfg=cfg, S=S, H=H, interp=interp,
            mesh=_pallas_mesh(cfg, mesh))
    else:
        err_plus, err_smooth = _run_all_vmap(
            obs_full, npis_full, params, init.s_init, init.Ps_init, init.Q,
            R_v, truth_cases, pop, cfg=cfg, H=H, S=S)

    # aggregate over start days with a full look-ahead window
    # (the reference averages over rows MaxLookAheadDays..end, :423-429).
    # Per-day errors stay faithful to ForecastQualityAssessment.m:390-391
    # (divide-by-zero -> inf on zero-truth days) but the aggregates mask
    # non-finite entries: on real series with reporting gaps a single
    # zero-case day would otherwise poison the whole mean/median curve.
    # All-masked (region, horizon) cells aggregate to NaN.
    sel = slice(H - 1, None) if S >= H else slice(0, None)
    e = err_smooth[:, sel, :]
    finite = jnp.isfinite(e)
    n_ok = jnp.sum(finite, axis=1)
    mean_sm = jnp.where(
        n_ok > 0,
        jnp.sum(jnp.where(finite, e, 0.0), axis=1) / jnp.maximum(n_ok, 1),
        jnp.nan)
    med_sm = jnp.nanmedian(jnp.where(finite, e, jnp.nan), axis=1)
    return BacktestResult(err_plus, err_smooth, mean_sm, med_sm,
                          train_out.trained)


def _errors_from_states(s_plus, s_smooth, truth_r, pop_r, start, T, H):
    """Percent-error curves at horizons 1..H for one lane.
    s_plus/s_smooth: (T, 3); truth_r: (T,)."""
    est_plus = s_plus[:, 0] * s_plus[:, 1] * s_plus[:, 2] * pop_r
    est_smooth = s_smooth[:, 0] * s_smooth[:, 1] * s_smooth[:, 2] * pop_r
    err_plus = 100.0 * jnp.abs(truth_r - est_plus) / truth_r
    err_smooth = 100.0 * jnp.abs(truth_r - est_smooth) / truth_r
    # horizon h (1-based) maps to absolute day T - start + h - 1
    days = T - start + jnp.arange(H)
    valid = days < T
    days_c = jnp.clip(days, 0, T - 1)
    return (jnp.where(valid, err_plus[days_c], 0.0),
            jnp.where(valid, err_smooth[days_c], 0.0))


@functools.partial(jax.jit, static_argnames=("cfg", "S", "H", "interp",
                                             "mesh"))
def _run_all_lanes(obs_full, npis_full, params, s_init, Ps_init, Q, R_v,
                   truth_cases, pop, *, cfg, S, H, interp, mesh=None):
    """Module-level jitted fast path (a per-call jitted closure silently
    recompiles every invocation — CLAUDE.md perf rule 3)."""
    from ..models.batch_last import si_alpha_ekf_system_bl
    from ..ops.ekf_bl import ekf_smoother_bl

    R, T = obs_full.shape
    fdtype = obs_full.dtype
    B = R * S
    t_idx = jnp.arange(T)
    starts = jnp.arange(1, S + 1)
    use_pallas = (cfg.backend == "pallas"
                  and cfg.observation_type in ("NEWCASES", "TOTALCASES"))

    # (R, S, T) masked observations -> lanes-last (T, B)
    obs_m = jnp.where(t_idx[None, None, :] >= T - starts[None, :, None],
                      jnp.nan, obs_full[:, None, :])
    obs_bl = obs_m.reshape(B, T).T
    tile = lambda a: jnp.repeat(jnp.moveaxis(jnp.asarray(a, fdtype),
                                             0, -1), S, axis=-1)
    u_bl = tile(npis_full)                      # (T, P, B)
    params_bl = {k: tile(v) for k, v in params.items()}
    if use_pallas:
        from ..ops.pallas.ekf3_kernel import ekf3_pallas_lanes
        f32 = jnp.float32
        ssm_p, sp_p, _ = ekf3_pallas_lanes(
            u_bl, obs_bl, tile(R_v), params_bl, tile(Q),
            tile(s_init).astype(f32), tile(Ps_init).astype(f32),
            gamma_discount=cfg.gamma_ekf, obs_type=cfg.observation_type,
            interpret=interp, mesh=mesh)
        sp_bl = sp_p.astype(fdtype)
        ss_bl = ssm_p.astype(fdtype)
    else:
        res = ekf_smoother_bl(
            si_alpha_ekf_system_bl(cfg.observation_type), u_bl, obs_bl,
            params_bl, tile(s_init), tile(Ps_init),
            Q=tile(Q), R=tile(R_v), gamma_discount=cfg.gamma_ekf,
            joseph=True, unroll=cfg.scan_unroll)
        sp_bl, ss_bl = res.s_plus, res.s_smooth
    # back to (R, S, T, 3) and score per lane
    sp = jnp.moveaxis(sp_bl, -1, 0).reshape(R, S, T, 3)
    ss = jnp.moveaxis(ss_bl, -1, 0).reshape(R, S, T, 3)

    def per_region(sp_r, ss_r, truth_r, pop_r):
        return jax.vmap(
            lambda sp_s, ss_s, st: _errors_from_states(
                sp_s, ss_s, truth_r, pop_r, st, T, H)
        )(sp_r, ss_r, starts)

    return jax.vmap(per_region)(sp, ss, truth_cases, pop)


@functools.partial(jax.jit, static_argnames=("cfg", "S", "H"))
def _run_all_vmap(obs_full, npis_full, params, s_init, Ps_init, Q, R_v,
                  truth_cases, pop, *, cfg, S, H):
    """Module-level jitted generic path (same jit-caching rationale as
    _run_all_lanes); the system is rebuilt from the static cfg."""
    T = obs_full.shape[1]
    t_idx = jnp.arange(T)
    starts = jnp.arange(1, S + 1)
    system = si_alpha_ekf_system(cfg.observation_type)

    def per_region(obs_r, npis_r, p_r, si, Pi, Q_r, Rv_r, truth_r):
        def per_start(start):
            obs_masked = jnp.where(t_idx >= T - start, jnp.nan, obs_r)
            res = ekf_smoother(
                system, npis_r, obs_masked[:, None], p_r, si, Pi,
                Q=Q_r, R=Rv_r, beta=cfg.beta_ekf,
                gamma_discount=cfg.gamma_ekf,
                inv_monitor_len=cfg.inv_monitor_len, order=cfg.order,
                smoother_gain=cfg.smoother_gain, outputs="light")
            return _errors_from_states(res.s_plus[:, :3],
                                       res.s_smooth[:, :3], truth_r,
                                       pop_r, start, T, H)

        pop_r = jnp.squeeze(p_r.pop("population"))
        return jax.vmap(per_start)(starts)

    params_r = dict(params)
    params_r["population"] = pop
    return jax.vmap(per_region)(
        obs_full, npis_full, params_r, s_init, Ps_init, Q, R_v,
        truth_cases)
