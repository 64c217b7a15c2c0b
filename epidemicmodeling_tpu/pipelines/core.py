"""Batched pipeline stages: two-round training, forecast scenarios, the
Pareto prescription sweep, and the Monte-Carlo baseline.

This is the TPU-native redesign of the reference's flagship per-region loop
(Tools/TrainPredictPrescribeNPI.m:93-522): instead of iterating regions in
Python, every stage is a vmapped kernel over an (R,)-batched RegionBatch;
the Pareto sweep adds a second (E,) epsilon axis processed in fixed-size
chunks so the 6-state EKS fits in HBM at E x R lane counts.
"""

from __future__ import annotations

import functools as _functools

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import (
    si_alpha_ekf_system,
    si_alpha_costate_ekf_system,
)
from ..models.si_alpha import si_alpha_step_fields
from ..ops import ekf_smoother
from ..regression import nnls_with_intercept, lasso_cv, \
    robust_affine_fit_elementwise
from ..control import npi_cost, random_npi_schedules
from .config import PipelineConfig


class RegionInit(NamedTuple):
    """Per-region derived EKF initialization (R,)-batched."""
    I0: jnp.ndarray           # (R,) initial case estimate
    s_init: jnp.ndarray       # (R, 3)
    Ps_init: jnp.ndarray      # (R, 3, 3)
    Q: jnp.ndarray            # (R, 3, 3)
    s_noise_std: jnp.ndarray  # (R,)
    i_noise_std: jnp.ndarray  # (R,)


class TrainedRegionParams(NamedTuple):
    """The persisted training product (TrainPredictPrescribeNPI.m:910):
    {CountryName, RegionName, N_population, reg_coef_b, reg_coef_a,
     reg_coef_b2, reg_coef_a2} as (R,)-batched arrays."""
    names: tuple
    population: np.ndarray    # (R,)
    a1: jnp.ndarray           # (R, P) round-1 NPI influence weights
    b1: jnp.ndarray           # (R,)
    a2: jnp.ndarray           # (R, P) round-2 (refined)
    b2: jnp.ndarray           # (R,)


class TrainOutputs(NamedTuple):
    """Two-round training results: coefficients, per-region init, smoothed
    states and the rho whiteness monitor for both EKF rounds
    (TrainPredictPrescribeNPI.m:199-354)."""
    trained: TrainedRegionParams
    init: RegionInit
    s_smooth_round1: jnp.ndarray   # (R, T, 3)
    s_smooth_round2: jnp.ndarray   # (R, T, 3)
    rho_round1: jnp.ndarray        # (R, T)
    rho_round2: jnp.ndarray        # (R, T)


def region_init(batch, cfg: PipelineConfig) -> RegionInit:
    """Derive per-region I0 and EKF initialization
    (TrainPredictPrescribeNPI.m:200-237). Host-side numpy (data-dependent
    first-positive search), done once per dataset."""
    R, T = batch.observations.shape
    # force numpy upfront: these fields may be replicated jax arrays under
    # a mesh (parallel.mesh.REGION_BATCH_ARRAY_FIELDS) and the search
    # below is host logic — one bulk fetch beats R eager device ops
    N = np.asarray(batch.population)
    nc_smooth = np.asarray(batch.new_cases_norm) * N[:, None]  # abs cases
    I0 = np.zeros(R)
    for r in range(R):
        x = nc_smooth[r]
        pos = x[np.isfinite(x) & (x > 0)][: cfg.first_num_days_for_case_estimation]
        I0[r] = max(cfg.min_cases, float(pos.mean()) if pos.size else 0.0)
    s_noise = cfg.s_noise_factor * I0 / N
    i_noise = cfg.i_noise_factor * I0 / N
    a_noise = np.full(R, cfg.alpha_noise_std)
    dt2 = cfg.dt ** 2
    Q = dt2 * np.stack([np.diag(v) for v in
                        np.stack([s_noise, i_noise, a_noise], -1) ** 2])
    Ps = dt2 * np.stack([np.diag(v) for v in
                         (cfg.init_cov_factor
                          * np.stack([s_noise, i_noise, a_noise], -1)) ** 2])
    s_init = np.stack([(N - I0) / N, I0 / N, np.full(R, cfg.alpha0)], -1)
    return RegionInit(jnp.asarray(I0), jnp.asarray(s_init), jnp.asarray(Ps),
                      jnp.asarray(Q), jnp.asarray(s_noise),
                      jnp.asarray(i_noise))


def _hcast(x, fd):
    """Upload-side cast: host array in -> numpy ``fd`` array out, so the
    cast happens once on host and the tunnel carries half the bytes vs
    f64. An array already on device with the right dtype passes through
    UNTOUCHED — this is what makes device_batch() effective: repeated
    stage calls reuse the resident copy instead of re-uploading per stage
    (a traced warm bench run spent ~45% of wall-clock on exactly these
    per-stage casts/uploads/dispatch syncs: 306 ms device vs 535 ms wall).
    """
    if isinstance(x, jax.Array) and x.dtype == fd:
        return x
    return np.asarray(x, fd)


def device_batch(batch, dtype=None):
    """Pre-upload a RegionBatch's hot array fields (observations, npis,
    obs_noise_var) to the device in the compute dtype (f32 on TPU).

    Every stage wrapper routes batch fields through _hcast, so a
    device-resident batch flows straight into the jitted stages with no
    per-stage host cast + tunnel upload (the (R, T, P) NPI tensor alone is
    ~6 MB at bench scale and was uploaded by four separate stages).
    Fields consumed by host-side logic (new_cases_norm and population:
    region_init's data-dependent first-positive search) stay numpy.
    """
    fd = np.dtype(dtype or jnp.result_type(float))
    # _hcast passes already-resident fields through untouched, so calling
    # device_batch on an already-uploaded batch (every warm run_pipeline
    # call re-enters here) is free instead of a device->host->device trip.
    return batch._replace(
        observations=jnp.asarray(_hcast(batch.observations, fd)),
        npis=jnp.asarray(_hcast(batch.npis, fd)),
        obs_noise_var=jnp.asarray(_hcast(batch.obs_noise_var, fd)))


def _base_params(cfg: PipelineConfig, npi_mins, npi_maxes, R, dtype):
    """Region-batched SI-alpha params dict with zero NPI influence."""
    P = len(npi_maxes)
    z = jnp.zeros((R,), dtype)
    return {
        "dt": z + cfg.dt,
        "beta": z + cfg.beta_model,
        "gamma": z + cfg.gamma_model,
        "a": jnp.zeros((R, P), dtype),
        "b": z,
        "u_min": jnp.broadcast_to(jnp.asarray(npi_mins, dtype), (R, P)),
        "u_max": jnp.broadcast_to(jnp.asarray(npi_maxes, dtype), (R, P)),
        "s_min": z,  # filled per region below
        "i_min": z,
        "alpha_min": z + cfg.alpha_min,
        "alpha_max": z + cfg.alpha_max,
        "epsilon": z + jnp.nan,
        "w": jnp.full((R, P), jnp.nan, dtype),
        "sigma": z + cfg.sigma,
    }


def _pallas_mesh(cfg: PipelineConfig, mesh):
    """Gate a mesh down to the pallas backend's shard_map wiring: the other
    backends partition via XLA auto-SPMD and must see None so their jit
    cache keys stay stable (single source of truth for the condition)."""
    return (mesh if (cfg.backend == "pallas" and mesh is not None
                     and mesh.devices.size > 1) else None)


def _run_ekf3(cfg, u, x, params, init, s_final=None, Ps_final=None,
              mesh=None):
    """3-state EKF/EKS over the region axis: vmapped generic core, or the
    batch-last fast path when the configuration allows it (order 1, no
    adaptive R). mesh: multi-device mesh for the pallas backend only (the
    kernel is shard_mapped over it; the other backends partition via XLA
    auto-SPMD and ignore it)."""
    R = x.shape[0]
    m = 3
    params = dict(params)
    R_v = params.pop("R_v")
    sf = (jnp.full((R, m), jnp.nan, x.dtype) if s_final is None else s_final)
    Pf = (jnp.full((R, m, m), jnp.nan, x.dtype) if Ps_final is None
          else Ps_final)

    # NOTE beta_ekf does not gate the fast paths: the pipeline's R_v is a
    # per-day schedule, and the generic filter only adapts R when it is a
    # FIXED prior (GEKF.m:180 checks fixed_R), so beta_ekf != 1 is a no-op
    # in every backend here. The fused kernels and the lanes core do
    # support fixed-R adaptation (beta=...) for direct callers.
    if (cfg.backend == "pallas" and cfg.order == 1
            and cfg.observation_type in ("NEWCASES", "TOTALCASES")):
        return _run_ekf3_pallas(cfg, u, x, params, R_v, init, sf, Pf,
                                mesh=mesh)

    if cfg.backend in ("lanes", "pallas") and cfg.order == 1:
        from ..models.batch_last import si_alpha_ekf_system_bl
        from ..ops.ekf_bl import ekf_smoother_bl
        fdt = x.dtype
        bl = lambda a: jnp.moveaxis(jnp.asarray(a, fdt), 0, -1)
        res = ekf_smoother_bl(
            si_alpha_ekf_system_bl(cfg.observation_type),
            bl(u), jnp.asarray(x)[..., 0].T, jax.tree.map(bl, params),
            bl(init.s_init), bl(init.Ps_init), bl(sf), bl(Pf),
            Q=bl(init.Q), R=jnp.asarray(R_v, fdt).T,
            gamma_discount=cfg.gamma_ekf, joseph=True,
            inv_monitor_len=cfg.inv_monitor_len, unroll=cfg.scan_unroll)
        unbl = lambda a: jnp.moveaxis(a, -1, 0)
        from ..ops.ekf import EKFResult
        return EKFResult(
            u_opt=unbl(res.u_opt), u_opt_smooth=unbl(res.u_opt_smooth),
            s_minus=unbl(res.s_minus), s_plus=unbl(res.s_plus),
            s_smooth=unbl(res.s_smooth), P_minus=None, P_plus=None,
            P_smooth=None, K_gain=None, innovations=None,
            rho=unbl(res.rho)[..., None, None])

    system = si_alpha_ekf_system(cfg.observation_type)

    def one(u_, x_, p_, si, Pi, sf_, Pf_, Q_, R_):
        return ekf_smoother(system, u_, x_, p_, si, Pi, sf_, Pf_,
                            Q=Q_, R=R_, beta=cfg.beta_ekf,
                            gamma_discount=cfg.gamma_ekf,
                            inv_monitor_len=cfg.inv_monitor_len,
                            order=cfg.order,
                            smoother_gain=cfg.smoother_gain)

    return jax.vmap(one)(u, x, params, init.s_init, init.Ps_init, sf, Pf,
                         init.Q, R_v)


@_functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _run_ekf3_pallas(cfg, u, x, params, R_v, init, sf, Pf, mesh=None):
    """3-state EKF/EKS via the fused Pallas kernel (ops/pallas/ekf3_kernel).
    Lane axis = regions, padded to a multiple of 128; rho recomputed
    post-hoc from the stored priors. mesh: shard_map the kernel's region
    lanes over a multi-device mesh (see ekf3_pallas_lanes)."""
    from ..ops.pallas.ekf3_kernel import ekf3_pallas_lanes, rho_from_priors
    from ..ops.ekf import EKFResult
    fdt = x.dtype
    bl = lambda a: jnp.moveaxis(jnp.asarray(a, fdt), 0, -1)
    from ..ops.pallas import should_interpret
    interp = should_interpret()
    x_bl = jnp.asarray(x, fdt)[..., 0].T
    Rv_bl = jnp.asarray(R_v, fdt).T
    ssm, sp, sm = ekf3_pallas_lanes(
        bl(u), x_bl, Rv_bl, {k: bl(v) for k, v in params.items()},
        bl(init.Q), bl(init.s_init), bl(init.Ps_init), bl(sf), bl(Pf),
        gamma_discount=cfg.gamma_ekf, obs_type=cfg.observation_type,
        interpret=interp, mesh=mesh)
    rho = rho_from_priors(sm, x_bl, Rv_bl, cfg.inv_monitor_len,
                          obs_type=cfg.observation_type)

    unbl = lambda a: jnp.moveaxis(a, -1, 0).astype(fdt)
    # 3-state systems return the input unchanged as u_opt; the smoother's
    # re-run leaves the last sample unwritten (zeros) like the reference
    u_opt_smooth = jnp.asarray(u, fdt).at[:, -1, :].set(0.0)
    return EKFResult(
        u_opt=jnp.asarray(u, fdt), u_opt_smooth=u_opt_smooth,
        s_minus=unbl(sm), s_plus=unbl(sp), s_smooth=unbl(ssm),
        P_minus=None, P_plus=None, P_smooth=None, K_gain=None,
        innovations=None, rho=unbl(rho)[..., None, None])


def _regress(cfg: PipelineConfig, x_data, y_data):
    """Regression dispatch over one region: x_data (n, P), y_data (n,).
    Returns (a (P,), b scalar)."""
    if cfg.regression_type == "NONNEGATIVELS":
        return nnls_with_intercept(x_data, y_data,
                                   iterations=cfg.nonneg_iterations)
    if cfg.regression_type == "LASSO":
        # fold randomization mirrors MATLAB's cvpartition when a seed is
        # configured (TrainPredictPrescribeNPI.m:255 lasso(...,'CV',50));
        # default stays the deterministic interleave for reproducibility
        key = (jax.random.PRNGKey(cfg.lasso_cv_shuffle_seed)
               if cfg.lasso_cv_shuffle_seed >= 0 else None)
        coef, intercept, _ = lasso_cv(x_data, y_data,
                                      n_folds=cfg.lasso_cv_folds, key=key)
        return coef, intercept
    if cfg.regression_type == "NONNEGATIVELS-ELEMENT-WISE":
        return robust_affine_fit_elementwise(x_data, y_data)
    raise ValueError(f"unknown regression_type {cfg.regression_type!r}")


@_functools.partial(jax.jit, static_argnames=("cfg", "num_regression_days",
                                               "fdtype", "mesh"))
def _train_impl(obs, npis, npi_mins, npi_maxes, population, obs_noise_var,
                init, *, cfg, num_regression_days, fdtype, mesh=None):
    """Module-level jitted training body: both EKF rounds, both regressions
    and every dtype cast run as ONE executable. The previous eager body cost
    ~40 per-primitive dispatches x ~4ms tunnel latency per pipeline call."""
    R, T = obs.shape
    P = npis.shape[-1]
    obs = jnp.asarray(obs, fdtype)
    npis = jnp.asarray(npis, fdtype)

    params = _base_params(cfg, npi_mins, npi_maxes, R, fdtype)
    params["s_min"] = jnp.asarray(cfg.min_cases / population, fdtype)
    params["i_min"] = jnp.asarray(cfg.min_cases / population, fdtype)
    params["R_v"] = jnp.asarray(obs_noise_var, fdtype)

    # ROUND 1: zero control input, zero NPI influence (:199-248)
    u_zero = jnp.zeros((R, T, P), fdtype)
    res1 = _run_ekf3(cfg, u_zero, obs[..., None], dict(params), init,
                     mesh=mesh)

    # regression 1: alpha ~ (NPI_MAX - NPI) over the last regression window
    x_data = (jnp.asarray(npi_maxes, fdtype)[None, None, :] - npis)
    x_win = x_data[:, T - num_regression_days:, :]
    y1 = res1.s_smooth[:, T - num_regression_days:, 2]
    a1, b1 = jax.vmap(lambda xd, yd: _regress(cfg, xd, yd))(x_win, y1)

    # ROUND 2: historic NPIs + learned influence (:295-307)
    params2 = dict(params)
    params2["a"] = a1
    params2["b"] = b1
    res2 = _run_ekf3(cfg, npis, obs[..., None], params2, init, mesh=mesh)

    y2 = res2.s_smooth[:, T - num_regression_days:, 2]
    a2, b2 = jax.vmap(lambda xd, yd: _regress(cfg, xd, yd))(x_win, y2)

    return (a1, b1, a2, b2, res1.s_smooth, res2.s_smooth,
            res1.rho[..., 0, 0], res2.rho[..., 0, 0])


def train_regions(batch, npi_mins, npi_maxes, num_regression_days,
                  cfg: PipelineConfig = PipelineConfig(),
                  dtype=None, mesh=None) -> TrainOutputs:
    """Two-round EKF + regression training over all regions at once
    (TrainPredictPrescribeNPI.m:199-354).

    batch: RegionBatch over the TRAINING window (no forecast horizon).
    mesh: multi-device mesh, needed by the pallas backend only (shard_map
    over the region lanes; other backends shard via XLA auto-SPMD).
    """
    fdtype = dtype or jnp.result_type(float)
    init = region_init(batch, cfg)
    fd = np.dtype(fdtype)   # cast on host: halves the device upload vs f64
    a1, b1, a2, b2, s_sm1, s_sm2, rho1, rho2 = _train_impl(
        _hcast(batch.observations, fd), _hcast(batch.npis, fd),
        np.asarray(npi_mins, fd), np.asarray(npi_maxes, fd),
        np.asarray(batch.population, fd),
        _hcast(batch.obs_noise_var, fd),
        init, cfg=cfg, num_regression_days=int(num_regression_days),
        fdtype=fd, mesh=_pallas_mesh(cfg, mesh))

    trained = TrainedRegionParams(
        names=batch.names, population=np.asarray(batch.population),
        a1=a1, b1=b1, a2=a2, b2=b2)
    return TrainOutputs(trained, init, s_sm1, s_sm2, rho1, rho2)


class ScenarioResult(NamedTuple):
    """One forecast scenario's trajectories, applied schedule and (J0, J1)
    costs (the actual/fixed/zero/max scenarios of
    TrainPredictPrescribeNPI.m:367-412)."""
    s: jnp.ndarray        # (R, T_full) susceptible trajectory
    i: jnp.ndarray        # (R, T_full)
    alpha: jnp.ndarray    # (R, T_full)
    u: jnp.ndarray        # (R, T_full, P) applied NPI schedule
    J0: jnp.ndarray       # (R,)
    J1: jnp.ndarray       # (R,)


def _rollout_from(cfg, init, params, s0, u_future, key=None):
    """Stochastic/deterministic SI-alpha rollout from the end-of-history state
    (Tools/SIalpha_Controlled.m semantics, batched over regions).

    s0: (R, 3); u_future: (R, H, P). Returns (R, H, 3) trajectories (initial
    condition excluded).

    The scan carries three (R,) field arrays rather than a stacked (R, 3)
    state: the trailing 3-wide axis would pad to the 128-lane TPU tile on
    every scan step (43x HBM traffic; dominant when an outer vmap multiplies
    the batch, e.g. the 500-scenario Monte-Carlo baseline)."""
    R, H, P = u_future.shape
    fdt = s0.dtype

    if key is None or not cfg.stochastic_forecast:
        noise = jnp.zeros((R, H, 3), fdt)
    else:
        noise = jax.random.normal(key, (R, H, 3), fdt)
    p_batched = {
        "dt": params["dt"], "beta": params["beta"], "gamma": params["gamma"],
        "a": params["a"], "b": params["b"], "u_max": params["u_max"],
        "alpha_min": params["alpha_min"], "alpha_max": params["alpha_max"],
        "s_noise_std": init.s_noise_std, "i_noise_std": init.i_noise_std,
        "alpha_noise_std": jnp.full_like(init.s_noise_std,
                                         cfg.alpha_noise_std),
    }
    p_batched = {k: jnp.asarray(v, fdt) for k, v in p_batched.items()}

    def body(carry, inp):
        s, i, al = carry
        u_t, n_t = inp                       # (R, P), (R, 3)
        s1, i1, a1 = si_alpha_step_fields(
            s, i, al, u_t, n_t[..., 0], n_t[..., 1], n_t[..., 2], p_batched)
        return (s1, i1, a1), (s1, i1, a1)

    _, (ss, ii, aa) = jax.lax.scan(
        body, (s0[..., 0], s0[..., 1], s0[..., 2]),
        (jnp.moveaxis(u_future, 1, 0), jnp.moveaxis(noise, 1, 0)))
    return jnp.moveaxis(jnp.stack([ss, ii, aa], axis=-1), 0, 1)


def _region_weights(npi_weights, R, P, fdtype):
    """NPI cost weights: accept a shared (P,) vector (fixed_equal_costs.csv)
    or per-region (R, P) weights (uniform_random_costs.csv) — the reference
    reads one weight row per geo (Tools/TrainPredictPrescribeNPI.m:109-127).
    Returns (R, P)."""
    w = jnp.asarray(npi_weights, fdtype)
    if w.ndim == 1:
        if w.shape[0] != P:
            # check before broadcast_to, whose own error is an opaque
            # "incompatible shapes" deep inside a jitted prep
            raise ValueError(
                f"npi_weights has length {w.shape[0]}, expected {P} "
                f"(one weight per NPI) or per-region ({R}, {P})")
        w = jnp.broadcast_to(w[None, :], (R, P))
    if w.shape != (R, P):
        raise ValueError(
            f"npi_weights must be (P,)=(({P},)) or (R,P)=({R},{P}); "
            f"got {w.shape}")
    return w


def forecast_scenarios(batch_full, trained: TrainedRegionParams,
                       init: RegionInit, npi_weights, npi_mins, npi_maxes,
                       T_hist: int, cfg: PipelineConfig = PipelineConfig(),
                       actual_npis=None, key=None, dtype=None, mesh=None):
    """Fixed / zero / max (+ optional actual) NPI forecast scenarios
    (TrainPredictPrescribeNPI.m:367-412).

    batch_full: RegionBatch over T_full = T_hist + horizon with NaN
    observations in the horizon. Returns dict of ScenarioResult plus the
    historic smoothed state trajectory (R, T_hist, 3).
    mesh: multi-device mesh for the pallas backend (see train_regions).
    """
    fdtype = dtype or jnp.result_type(float)
    fd = np.dtype(fdtype)
    fixed, zero, full, act, s_hist = _scenarios_prep_impl(
        _hcast(batch_full.observations, fd),
        _hcast(batch_full.npis, fd),
        np.asarray(batch_full.population, fd),
        _hcast(batch_full.obs_noise_var, fd), trained.a2, trained.b2,
        np.asarray(npi_mins, fd), np.asarray(npi_maxes, fd),
        np.asarray(npi_weights, fd), init,
        None if actual_npis is None else np.asarray(actual_npis, fd),
        key if cfg.stochastic_forecast else None,
        cfg=cfg, T_hist=T_hist, fdtype=fd, mesh=_pallas_mesh(cfg, mesh))
    out = {"fixed": fixed, "zero": zero, "max": full}
    if act is not None:
        out["actual"] = act
    return out, s_hist


@_functools.partial(jax.jit, static_argnames=("cfg", "T_hist", "fdtype",
                                               "mesh"))
def _scenarios_prep_impl(obs, npis, population, obs_noise_var, a2, b2,
                         npi_mins, npi_maxes, npi_weights, init,
                         actual_npis, key, *, cfg, T_hist, fdtype,
                         mesh=None):
    """Jitted scenario-stage prep + run: schedule construction, casts, the
    EKS and all rollouts as one executable (eager prep dispatches cost ~4ms
    each through the axon tunnel)."""
    R, T_full = obs.shape
    P = npis.shape[-1]
    H = T_full - T_hist
    obs = jnp.asarray(obs, fdtype)
    npis = jnp.asarray(npis, fdtype)

    params = _base_params(cfg, npi_mins, npi_maxes, R, fdtype)
    params["s_min"] = jnp.asarray(cfg.min_cases / population, fdtype)
    params["i_min"] = jnp.asarray(cfg.min_cases / population, fdtype)
    params["R_v"] = jnp.asarray(obs_noise_var, fdtype)
    params["a"] = jnp.asarray(a2, fdtype)
    params["b"] = jnp.asarray(b2, fdtype)

    w_daywise = jnp.broadcast_to(
        _region_weights(npi_weights, R, P, fdtype)[:, None, :],
        (R, T_full, P))

    ip_hist = npis[:, :T_hist, :]
    ip_last = ip_hist[:, -1:, :]

    # A) fixed-input scenario first: its smoothed states define the shared
    # historic trajectory s_historic used by ALL scenario rollouts
    # (TrainPredictPrescribeNPI.m:380-382,398,408,481).
    u_fixed = jnp.concatenate(
        [ip_hist[:, :-1, :], jnp.broadcast_to(ip_last, (R, H + 1, P))], axis=1)
    u_zero = jnp.concatenate(
        [ip_hist[:, :-1, :],
         jnp.broadcast_to(jnp.asarray(npi_mins, fdtype)[None, None, :],
                          (R, H + 1, P))], axis=1)
    u_max_sched = jnp.concatenate(
        [ip_hist[:, :-1, :],
         jnp.broadcast_to(jnp.asarray(npi_maxes, fdtype)[None, None, :],
                          (R, H + 1, P))], axis=1)
    fixed, zero, full, s_hist = _scenarios_impl(
        u_fixed, u_zero, u_max_sched, obs, params, init, w_daywise,
        key, cfg=cfg, T_hist=T_hist, mesh=mesh)

    act = None
    if actual_npis is not None:
        # Z) actual ground-truth NPIs (:367-370) — estimator validation; uses
        # its own EKS trajectory rather than a rollout.
        res_act = _run_ekf3(cfg, jnp.asarray(actual_npis, fdtype),
                            obs[..., None], params, init, mesh=mesh)
        s = res_act.s_smooth[..., 0]
        i = res_act.s_smooth[..., 1]
        al = res_act.s_smooth[..., 2]
        u_act = jnp.asarray(actual_npis, fdtype)
        J0, J1 = npi_cost(s * i * al, jnp.swapaxes(u_act, 1, 2),
                          jnp.swapaxes(w_daywise, 1, 2))
        act = ScenarioResult(s, i, al, u_act, J0, J1)
    return fixed, zero, full, act, s_hist


@_functools.partial(jax.jit, static_argnames=("cfg", "T_hist", "mesh"))
def _scenarios_impl(u_fixed, u_zero, u_max_sched, obs, params, init,
                    w_daywise, key, *, cfg, T_hist, mesh=None):
    """Module-level jitted scenario stage: fixed-input EKS defines s_hist,
    then the three rollouts + costs (compilation caches across calls)."""
    res_fixed = _run_ekf3(cfg, u_fixed, obs[..., None], dict(params), init,
                          mesh=mesh)
    s_hist = res_fixed.s_smooth[:, :T_hist, :]

    def scenario(u_full):
        traj = _rollout_from(cfg, init, params, s_hist[:, -1, :],
                             u_full[:, T_hist:, :], key)
        s = jnp.concatenate([s_hist[..., 0], traj[..., 0]], axis=1)
        i = jnp.concatenate([s_hist[..., 1], traj[..., 1]], axis=1)
        al = jnp.concatenate([s_hist[..., 2], traj[..., 2]], axis=1)
        J0, J1 = npi_cost(s * i * al, jnp.swapaxes(u_full, 1, 2),
                          jnp.swapaxes(w_daywise, 1, 2))
        return ScenarioResult(s, i, al, u_full, J0, J1)

    return (scenario(u_fixed), scenario(u_zero), scenario(u_max_sched),
            s_hist)


@_functools.partial(jax.jit, static_argnames=("cfg", "T_hist"))
def _sweep_chunk_vmap_impl(eps_chunk, key_chunk, u_in, obs, R_v, params,
                           QQ, PPs, ss_init, s_final, Ps_final, s_hist,
                           w_daywise, init, *, cfg, T_hist):
    """Module-level jitted generic-core (vmap) Pareto chunk — the parity
    path, hoisted for the same compile-caching reason as the lanes impl."""
    system6 = si_alpha_costate_ekf_system(cfg.observation_type)
    R = obs.shape[0]
    fdtype = obs.dtype

    def finish_eps(res_u_opt_smooth, k_eps):
        u_presc = res_u_opt_smooth[:, T_hist:, :]          # (R, H, P)
        traj = _rollout_from(cfg, init, params, s_hist[:, -1, :],
                             u_presc, k_eps)
        s = jnp.concatenate([s_hist[..., 0], traj[..., 0]], axis=1)
        i = jnp.concatenate([s_hist[..., 1], traj[..., 1]], axis=1)
        al = jnp.concatenate([s_hist[..., 2], traj[..., 2]], axis=1)
        J0, J1 = npi_cost(s * i * al, jnp.swapaxes(res_u_opt_smooth, 1, 2),
                          jnp.swapaxes(w_daywise, 1, 2))
        return J0, J1, s, i, al, u_presc

    def per_eps(eps, k_eps):
        p_eps = dict(params)
        p_eps["epsilon"] = jnp.full((R,), eps, fdtype)

        def one_region(u_, x_, p_, si, Pi, sf, Pfm, Q_, Rv_):
            return ekf_smoother(system6, u_, x_, p_, si, Pi, sf, Pfm,
                                Q=Q_, R=Rv_, beta=cfg.beta_ekf,
                                gamma_discount=cfg.gamma_ekf,
                                inv_monitor_len=cfg.inv_monitor_len,
                                order=cfg.order, outputs="light",
                                smoother_gain=cfg.smoother_gain)

        res = jax.vmap(one_region)(u_in, obs[..., None], p_eps, ss_init,
                                   PPs, s_final, Ps_final, QQ, R_v)
        return finish_eps(res.u_opt_smooth, k_eps)

    return jax.vmap(per_eps)(eps_chunk, key_chunk)


def _sweep_chunk_lanes_body(eps_chunk, key_chunk, u_in, obs, R_v, params,
                            QQ, PPs, ss_init, s_final, Ps_final, s_hist,
                            w_vec, s_noise_std, i_noise_std, *, cfg, T_hist,
                            Ec, mesh=None):
    """One batch-last / Pallas Pareto chunk — traced once as the lax.scan
    body of _sweep_all_lanes_impl (all chunks in ONE executable) and also
    jitted standalone as _sweep_chunk_lanes_impl for the vmap-backend-style
    per-chunk path."""
    from ..models.batch_last import si_alpha_costate_ekf_system_bl, _dot_p
    from ..ops.ekf_bl import ekf_smoother_bl
    from ..utils.math import clip_lo_hi

    fdtype = obs.dtype
    R = obs.shape[0]
    T_full = obs.shape[1]
    P = u_in.shape[-1]
    H = T_full - T_hist
    Bl = Ec * R

    def tile_lanes(arr):
        a = jnp.asarray(arr, fdtype)
        a = jnp.moveaxis(a, 0, -1)
        a = jnp.broadcast_to(a[..., None, :], a.shape[:-1] + (Ec, R))
        return a.reshape(a.shape[:-2] + (Bl,))

    params_bl = {k: tile_lanes(v) for k, v in params.items()}
    params_bl["epsilon"] = jnp.broadcast_to(
        eps_chunk[:, None], (Ec, R)).reshape(Bl)

    if cfg.backend == "pallas":
        from ..ops.pallas.ekf6_kernel import (ekf6_pallas,
                                              pack_params_for_kernel)
        from ..ops.pallas.shard import (pad_for_mesh, pad_lanes,
                                        shard_map_lanes)
        # pad lanes to the kernel tile; under a mesh the pad is per-DEVICE
        # (each shard of the lane axis must itself be a tile multiple)
        n_dev, pad = pad_for_mesh(Bl, mesh)
        padl = pad_lanes(pad)
        params_p = {k: padl(v) for k, v in params_bl.items()}
        scal, vecs = pack_params_for_kernel(params_p, padl(tile_lanes(QQ)))
        from ..ops.pallas import should_interpret
        interp = should_interpret()
        kernel_args = (
            padl(tile_lanes(u_in)), padl(tile_lanes(obs)),
            padl(tile_lanes(R_v)), scal, vecs,
            padl(tile_lanes(ss_init)),
            padl(tile_lanes(PPs)).reshape(36, Bl + pad),
            padl(tile_lanes(s_final)),
            padl(tile_lanes(Ps_final)).reshape(36, Bl + pad))
        run = _functools.partial(
            ekf6_pallas, gamma_discount=float(cfg.gamma_ekf),
            interpret=interp, obs_type=cfg.observation_type)
        if n_dev > 1:
            # each chip runs the fused kernel on its own lane shard
            # (ops/pallas/shard.py); the sweep lanes are eps-major (e*R+r)
            run, kernel_args = shard_map_lanes(
                run, mesh, kernel_args, ("ep", "dp"), n_out=3)
        _, u_sm_p, _ = run(*kernel_args)
        # keep the PADDED lane axis through the rollout and per-lane cost
        # reductions: slicing the (T, P, B) kernel output back to Bl lanes
        # copied ~150 MB per chunk (profiled at ~20% of the whole sweep);
        # the pad lanes compute throwaway values and are dropped only from
        # the small per-lane outputs at the end
        u_sm = u_sm_p.astype(fdtype)                       # (T, P, Bl+pad)
        rp = params_p
    else:
        res = ekf_smoother_bl(
            si_alpha_costate_ekf_system_bl(cfg.observation_type),
            tile_lanes(u_in), tile_lanes(obs), params_bl,
            tile_lanes(ss_init), tile_lanes(PPs),
            tile_lanes(s_final), tile_lanes(Ps_final),
            Q=tile_lanes(QQ), R=tile_lanes(R_v),
            gamma_discount=cfg.gamma_ekf, joseph=True,
            unroll=cfg.scan_unroll)
        u_sm = res.u_opt_smooth                            # (T, P, Bl)
        rp = params_bl
        padl = lambda a: a

    u_presc_bl = u_sm[T_hist:]                             # (H, P, B)
    s_hist_bl = padl(tile_lanes(s_hist))                   # (T_hist, 3, B)
    s0_bl = s_hist_bl[-1]
    if cfg.stochastic_forecast:
        # SAME per-epsilon keys and draw shapes as the vmap path
        # (per_eps -> _rollout_from draws normal(k_eps, (R, H, 3))), so the
        # backends agree bit-for-bit in stochastic mode too — one draw per
        # epsilon, laid out lane-last (pad lanes replicate lane 0's draws
        # and are discarded)
        noise_er = jax.vmap(
            lambda k: jax.random.normal(k, (R, H, 3), fdtype))(key_chunk)
        noise = padl(noise_er.transpose(2, 3, 0, 1).reshape(H, 3, Bl))
        noise_std = jnp.stack([
            padl(tile_lanes(s_noise_std)), padl(tile_lanes(i_noise_std)),
            jnp.full((u_sm.shape[-1],), cfg.alpha_noise_std, fdtype)])
    else:
        noise = jnp.zeros((H, 3, u_sm.shape[-1]), fdtype)
        noise_std = jnp.zeros((3, u_sm.shape[-1]), fdtype)

    def roll_step(sv, inp):
        u_t, n_t = inp
        s_, i_, al_ = sv[0], sv[1], sv[2]
        dt = rp["dt"]
        s1 = clip_lo_hi(s_ - dt * (al_ * s_ * i_
                                   + n_t[0] * noise_std[0]), 0.0, 1.0)
        i1 = clip_lo_hi(i_ + dt * (al_ * s_ * i_ - rp["beta"] * i_
                                   + n_t[1] * noise_std[1]), 0.0, 1.0)
        drive = (-rp["gamma"] * al_ + rp["gamma"] * rp["b"]
                 + rp["gamma"] * _dot_p(rp["a"], rp["u_max"] - u_t)
                 + n_t[2] * noise_std[2])
        a1 = clip_lo_hi(al_ + dt * drive, rp["alpha_min"], rp["alpha_max"])
        nxt = jnp.stack([s1, i1, a1])
        return nxt, nxt

    _, traj = jax.lax.scan(roll_step, s0_bl, (u_presc_bl, noise))
    full_states = jnp.concatenate([s_hist_bl, traj], axis=0)   # (T, 3, B)
    cases = full_states[:, 0] * full_states[:, 1] * full_states[:, 2]
    # per-lane reductions run on the padded lanes; only the small (Bl,)
    # results are sliced back (see the padded-lane note above)
    J0 = jnp.mean(cases, axis=0)[:Bl]
    J1 = jnp.mean(padl(tile_lanes(w_vec))[None] * u_sm, axis=(0, 1))[:Bl]

    u_out = jnp.transpose(
        u_presc_bl[..., :Bl].reshape(H, P, Ec, R), (2, 3, 0, 1))
    if not cfg.pareto_store_trajectories:
        # the caller drops the (E, R, T) trajectories in this mode — return
        # None so XLA dead-code-eliminates their transposes (~110 MB/chunk
        # of writes at saturation scale) instead of materializing them
        return (J0.reshape(Ec, R), J1.reshape(Ec, R), None, None, None,
                u_out)
    unb = lambda a: jnp.moveaxis(a[..., :Bl].reshape(a.shape[:-1] + (Ec, R)),
                                 (-2, -1), (0, 1))
    s_out = unb(full_states[:, 0])
    i_out = unb(full_states[:, 1])
    al_out = unb(full_states[:, 2])
    return (J0.reshape(Ec, R), J1.reshape(Ec, R), s_out, i_out, al_out,
            u_out)


@_functools.partial(jax.jit,
                    static_argnames=("cfg", "T_hist", "Ec", "mesh"))
def _sweep_chunk_lanes_impl(eps_chunk, key_chunk, u_in, obs, R_v, params,
                            QQ, PPs, ss_init, s_final, Ps_final, s_hist,
                            w_vec, s_noise_std, i_noise_std, *, cfg, T_hist,
                            Ec, mesh=None):
    """Single-chunk entry point (module-level jit so compilation caches
    across pipeline calls)."""
    return _sweep_chunk_lanes_body(
        eps_chunk, key_chunk, u_in, obs, R_v, params, QQ, PPs, ss_init,
        s_final, Ps_final, s_hist, w_vec, s_noise_std, i_noise_std,
        cfg=cfg, T_hist=T_hist, Ec=Ec, mesh=mesh)


@_functools.partial(jax.jit,
                    static_argnames=("cfg", "T_hist", "Ec", "mesh"))
def _sweep_all_lanes_impl(eps_all, keys_all, u_in, obs, R_v, params,
                          QQ, PPs, ss_init, s_final, Ps_final, s_hist,
                          w_vec, s_noise_std, i_noise_std, *, cfg, T_hist,
                          Ec, mesh=None):
    """The WHOLE epsilon sweep as one executable: lax.scan over epsilon
    chunks with the single-chunk body, so the E/pareto_chunk chunks run
    back-to-back on device with no per-chunk host dispatch, no donated
    write-back buffer, and no inter-chunk pipeline bubbles (the host loop
    cost ~0.4 s of a 1.3 s sweep at the 235x2000 saturation scale: ~4 ms
    of axon-tunnel latency per dispatch plus the buffer writes).
    eps_all: (n_chunks, Ec); keys_all: (n_chunks, Ec, 2) uint32.
    Returns the per-chunk outputs stacked on a leading n_chunks axis
    (trajectory slots are None when cfg.pareto_store_trajectories=False).
    Reference loop: Tools/TrainPredictPrescribeNPI.m:421-494."""
    def step(carry, eps_keys):
        eps_chunk, key_chunk = eps_keys
        out = _sweep_chunk_lanes_body(
            eps_chunk, key_chunk, u_in, obs, R_v, params, QQ, PPs, ss_init,
            s_final, Ps_final, s_hist, w_vec, s_noise_std, i_noise_std,
            cfg=cfg, T_hist=T_hist, Ec=Ec, mesh=mesh)
        return carry, out

    _, outs = jax.lax.scan(step, 0, (eps_all, keys_all))
    return outs


@_functools.partial(jax.jit, static_argnames=("cfg", "T_hist", "fdtype"))
def _pareto_prep_impl(obs, npis, population, obs_noise_var, a2, b2,
                      npi_mins, npi_maxes, npi_weights, init, s_hist, *,
                      cfg, T_hist, fdtype):
    """Jitted Pareto-sweep input prep: the 6-state augmentation, terminal
    conditions and weight layout run as one executable instead of ~25 eager
    dispatches per pipeline call (each an axon-tunnel round trip)."""
    R, T_full = obs.shape
    P = npis.shape[-1]
    H = T_full - T_hist
    obs = jnp.asarray(obs, fdtype)
    npis = jnp.asarray(npis, fdtype)

    params = _base_params(cfg, npi_mins, npi_maxes, R, fdtype)
    params["s_min"] = jnp.asarray(cfg.min_cases / population, fdtype)
    params["i_min"] = jnp.asarray(cfg.min_cases / population, fdtype)
    params["a"] = jnp.asarray(a2, fdtype)
    params["b"] = jnp.asarray(b2, fdtype)
    params["w"] = _region_weights(npi_weights, R, P, fdtype)
    R_v = jnp.asarray(obs_noise_var, fdtype)

    # 6-state augmentation (:425-457)
    q_l = cfg.q_lambda
    dt2 = cfg.dt ** 2
    QQ = jnp.zeros((R, 6, 6), fdtype)
    QQ = QQ.at[:, :3, :3].set(init.Q.astype(fdtype))
    QQ = QQ.at[:, 3, 3].set(dt2 * q_l ** 2)
    QQ = QQ.at[:, 4, 4].set(dt2 * q_l ** 2)
    QQ = QQ.at[:, 5, 5].set(dt2 * q_l ** 2)
    PPs = jnp.zeros((R, 6, 6), fdtype)
    PPs = PPs.at[:, :3, :3].set(init.Ps_init.astype(fdtype))
    PPs = PPs.at[:, 3, 3].set(10.0 * dt2 * q_l ** 2)
    PPs = PPs.at[:, 4, 4].set(10.0 * dt2 * q_l ** 2)
    PPs = PPs.at[:, 5, 5].set(10.0 * dt2 * q_l ** 2)
    ss_init = jnp.concatenate(
        [init.s_init.astype(fdtype),
         jnp.full((R, 3), cfg.lambda0, fdtype)], axis=1)
    # terminal conditions: zero costates, tiny costate covariance, state
    # covariances pinned (finial_conditions_setup == 1, :444-453)
    s_final = jnp.broadcast_to(
        jnp.array([jnp.nan, jnp.nan, jnp.nan, 0.0, 0.0, 0.0], fdtype),
        (R, 6))
    Pf = jnp.zeros((6, 6), fdtype)
    Pf = Pf.at[:3, :3].set(jnp.nan)
    Pf = Pf.at[3, 3].set(1e-8).at[4, 4].set(1e-8).at[5, 5].set(1e-8)
    Ps_final = jnp.broadcast_to(Pf, (R, 6, 6))

    # inputs: historic NPIs then NaN (optimal control requested) (:458)
    u_in = jnp.concatenate(
        [npis[:, :T_hist, :], jnp.full((R, H, P), jnp.nan, fdtype)], axis=1)

    w_rp = _region_weights(npi_weights, R, P, fdtype)
    w_daywise = jnp.broadcast_to(w_rp[:, None, :], (R, T_full, P))
    return (obs, R_v, params, QQ, PPs, ss_init, s_final, Ps_final, u_in,
            w_daywise, w_rp, jnp.asarray(s_hist, fdtype),
            init.s_noise_std.astype(fdtype), init.i_noise_std.astype(fdtype))


@_functools.partial(jax.jit, donate_argnums=0)
def _write_chunk_impl(buf, chunk, start):
    """In-place (donated) write of one epsilon-chunk into the preallocated
    prescription buffer — avoids both the device-side concatenate doubling
    and per-chunk host transfers at very large E."""
    zeros = (jnp.zeros((), start.dtype),) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, chunk, (start,) + zeros)


def pareto_prescribe(batch_full, trained: TrainedRegionParams,
                     init: RegionInit, s_hist, epsilon_values, npi_weights,
                     npi_mins, npi_maxes, T_hist: int,
                     cfg: PipelineConfig = PipelineConfig(), key=None,
                     dtype=None, mesh=None):
    """The Pareto sweep (TrainPredictPrescribeNPI.m:414-494): for every
    epsilon, run the 6-state optimal-control EKS with NaN future inputs and
    costate terminal conditions, re-simulate the prescribed schedule, and
    score (J0, J1).

    epsilon is a second vmapped axis, processed in chunks of
    ``cfg.pareto_chunk`` to bound HBM. Returns dict with J0/J1 (E, R),
    trajectories (E, R, T_full) and prescriptions (E, R, H, P).
    """
    fdtype = dtype or jnp.result_type(float)
    R, T_full = batch_full.observations.shape
    P = batch_full.npis.shape[-1]
    E = len(epsilon_values)
    if E == 0:
        raise ValueError("epsilon_values is empty — pass at least one "
                         "tradeoff point (control.epsilon_grid(n) builds "
                         "the reference's log+linear grid)")
    from ..parallel.mesh import validate_pareto_chunk
    validate_pareto_chunk(cfg.pareto_chunk, mesh)
    fd = np.dtype(fdtype)
    prep = _pareto_prep_impl(
        _hcast(batch_full.observations, fd),
        _hcast(batch_full.npis, fd),
        np.asarray(batch_full.population, fd),
        _hcast(batch_full.obs_noise_var, fd), trained.a2, trained.b2,
        np.asarray(npi_mins, fd), np.asarray(npi_maxes, fd),
        np.asarray(npi_weights, fd), init, s_hist,
        cfg=cfg, T_hist=T_hist, fdtype=fd)
    (obs, R_v, params, QQ, PPs, ss_init, s_final, Ps_final, u_in,
     w_daywise, w_rp, s_hist_f, s_nstd, i_nstd) = prep

    eps = np.asarray(epsilon_values, float)
    chunk = cfg.pareto_chunk
    E_pad = ((E + chunk - 1) // chunk) * chunk
    n_chunks = E_pad // chunk
    eps_padded = np.concatenate([eps, np.full(E_pad - E, eps[-1])])
    if key is None:
        keys = jnp.zeros((E_pad, 2), jnp.uint32)
    else:
        keys = jax.random.split(key, E_pad)

    # shard the epsilon ensemble axis over the 'ep' mesh axis so the
    # (E, R) lane grid occupies the full 2-D mesh (put_global handles
    # meshes spanning processes — the multi-host case); identity when no
    # mesh is given. Shared by both the one-executable lanes/pallas sweep
    # and the vmap chunk loop below.
    if mesh is not None:
        from jax.sharding import PartitionSpec as _PS
        from ..parallel.mesh import put_global

        def shard_ep(a, *spec):
            return put_global(a, mesh, _PS(*spec))
    else:
        def shard_ep(a, *spec):
            return a

    if cfg.backend in ("lanes", "pallas"):
        if cfg.backend == "pallas" and (
                cfg.observation_type not in ("NEWCASES", "TOTALCASES")
                or cfg.order != 1):
            raise ValueError(
                "backend='pallas' supports NEWCASES/TOTALCASES "
                "observations and order=1 only; use backend='vmap'")
        # the WHOLE sweep is one executable (lax.scan over chunks inside
        # _sweep_all_lanes_impl): no per-chunk host dispatches, no donated
        # write-back buffer — outputs come back stacked (n_chunks, Ec, ...)
        eps_all = shard_ep(jnp.asarray(eps_padded.reshape(n_chunks, chunk),
                                       fdtype), None, "ep")
        keys_all = shard_ep(keys.reshape(n_chunks, chunk, 2),
                            None, "ep", None)
        outs = _sweep_all_lanes_impl(
            eps_all, keys_all, u_in, obs, R_v, params, QQ, PPs, ss_init,
            s_final, Ps_final, s_hist_f, w_rp, s_nstd, i_nstd,
            cfg=cfg, T_hist=T_hist, Ec=chunk, mesh=_pallas_mesh(cfg, mesh))
        flat = lambda a: (None if a is None else
                          a.reshape((E_pad,) + a.shape[2:])[:E])
        return {
            "J0": flat(outs[0]), "J1": flat(outs[1]), "s": flat(outs[2]),
            "i": flat(outs[3]), "alpha": flat(outs[4]),
            "u_prescribed": flat(outs[5]),
            "epsilon": jnp.asarray(eps, fdtype),
        }

    def sweep_chunk(eps_chunk, key_chunk):
        return _sweep_chunk_vmap_impl(
            eps_chunk, key_chunk, u_in, obs, R_v, params, QQ, PPs, ss_init,
            s_final, Ps_final, s_hist_f, w_daywise, init,
            cfg=cfg, T_hist=T_hist)

    outs = []
    u_buf = None
    for c0 in range(0, E_pad, chunk):
        eps_chunk = shard_ep(jnp.asarray(eps_padded[c0:c0 + chunk], fdtype),
                             "ep")
        key_chunk = shard_ep(keys[c0:c0 + chunk], "ep", None)
        o = sweep_chunk(eps_chunk, key_chunk)
        if not cfg.pareto_store_trajectories:
            # keep only costs + prescriptions; prescriptions go into ONE
            # preallocated (donated, in-place) device buffer — the retained
            # per-chunk buffers plus a final concatenate would exhaust HBM
            # at very large E
            if u_buf is None:
                H_, P_ = o[5].shape[2], o[5].shape[3]
                u_buf = jnp.zeros((E_pad, R, H_, P_), o[5].dtype)
            u_buf = _write_chunk_impl(u_buf, o[5], jnp.int32(c0))
            o = (o[0], o[1], None, None, None, None)
        outs.append(o)
    cat = lambda idx: (None if outs[0][idx] is None else
                       jnp.concatenate([o[idx] for o in outs], axis=0)[:E])
    return {
        "J0": cat(0), "J1": cat(1), "s": cat(2), "i": cat(3),
        "alpha": cat(4),
        "u_prescribed": (u_buf[:E] if u_buf is not None else cat(5)),
        "epsilon": jnp.asarray(eps, fdtype),
    }


@_functools.partial(jax.jit, static_argnames=("cfg", "T_hist", "fdtype"))
def _schedule_scenario_impl(npis, u_future, a2, b2, npi_mins, npi_maxes,
                            npi_weights, init, s_hist, key, *, cfg, T_hist,
                            fdtype):
    """Jitted custom-schedule scenario: rollout + costs as one executable."""
    R, T_full, P = npis.shape
    npis = jnp.asarray(npis, fdtype)
    u_future = jnp.asarray(u_future, fdtype)
    s_hist = jnp.asarray(s_hist, fdtype)

    params = _base_params(cfg, npi_mins, npi_maxes, R, fdtype)
    params["a"] = jnp.asarray(a2, fdtype)
    params["b"] = jnp.asarray(b2, fdtype)

    traj = _rollout_from(cfg, init, params, s_hist[:, -1, :], u_future, key)
    sv = jnp.concatenate([s_hist[..., 0], traj[..., 0]], axis=1)
    iv = jnp.concatenate([s_hist[..., 1], traj[..., 1]], axis=1)
    al = jnp.concatenate([s_hist[..., 2], traj[..., 2]], axis=1)
    u_full = jnp.concatenate([npis[:, :T_hist, :], u_future], axis=1)
    w_daywise = jnp.broadcast_to(
        _region_weights(npi_weights, R, P, fdtype)[:, None, :],
        (R, T_full, P))
    J0, J1 = npi_cost(sv * iv * al, jnp.swapaxes(u_full, 1, 2),
                      jnp.swapaxes(w_daywise, 1, 2))
    return ScenarioResult(sv, iv, al, u_full, J0, J1)


def scenario_from_schedule(batch_full, trained: TrainedRegionParams,
                           init: RegionInit, s_hist, u_future, npi_weights,
                           npi_mins, npi_maxes, T_hist: int,
                           cfg: PipelineConfig = PipelineConfig(), key=None,
                           dtype=None) -> ScenarioResult:
    """Forecast under an externally supplied NPI plan (the XPRIZE
    `future_ip.csv` semantics: predict new cases conditioned on a given
    future intervention schedule; see data.read_future_ip).

    u_future: (R, H, P) plan over the forecast horizon."""
    fdtype = dtype or jnp.result_type(float)
    fd = np.dtype(fdtype)
    return _schedule_scenario_impl(
        _hcast(batch_full.npis, fd), np.asarray(u_future, fd),
        trained.a2, trained.b2, np.asarray(npi_mins, fd),
        np.asarray(npi_maxes, fd), np.asarray(npi_weights, fd), init,
        s_hist, key if cfg.stochastic_forecast else None,
        cfg=cfg, T_hist=T_hist, fdtype=fd)


def monte_carlo_baseline(batch_full, trained: TrainedRegionParams,
                         init: RegionInit, s_hist, npi_weights, npi_mins,
                         npi_maxes, T_hist: int,
                         cfg: PipelineConfig = PipelineConfig(),
                         key=None, dtype=None):
    """500 random-NPI rollouts per region (TrainPredictPrescribeNPI.m:496-522):
    half constant-over-time, half fully random; scored with npi_cost over the
    [historic NPIs, random future] schedule. Returns J0, J1 of shape (N, R)."""
    fdtype = dtype or jnp.result_type(float)
    if key is None:
        key = jax.random.PRNGKey(0)
    fd = np.dtype(fdtype)
    J0, J1, u_rand = _monte_carlo_prep_impl(
        _hcast(batch_full.npis, fd), trained.a2, trained.b2,
        np.asarray(npi_mins, fd), np.asarray(npi_maxes, fd),
        np.asarray(npi_weights, fd), init, s_hist, key,
        cfg=cfg, T_hist=T_hist, fdtype=fd)
    return {"J0": J0, "J1": J1, "u_random": u_rand}


@_functools.partial(jax.jit, static_argnames=("cfg", "T_hist", "fdtype"))
def _monte_carlo_prep_impl(npis, a2, b2, npi_mins, npi_maxes, npi_weights,
                           init, s_hist, key, *, cfg, T_hist, fdtype):
    """Jitted Monte-Carlo prep + scoring (one executable; see
    _train_impl for why eager prep dispatches are expensive here)."""
    R, T_full, P = npis.shape
    H = T_full - T_hist
    N = cfg.num_monte_carlo
    npis = jnp.asarray(npis, fdtype)
    ip_hist = npis[:, :T_hist, :]
    s_hist = jnp.asarray(s_hist, fdtype)

    params = _base_params(cfg, npi_mins, npi_maxes, R, fdtype)
    params["a"] = jnp.asarray(a2, fdtype)
    params["b"] = jnp.asarray(b2, fdtype)

    k_draw, k_noise = jax.random.split(key)
    u_rand = random_npi_schedules(k_draw, N, npi_mins, npi_maxes, H)  # (N,H,P)
    u_rand = u_rand.astype(fdtype)

    w_daywise = jnp.broadcast_to(
        _region_weights(npi_weights, R, P, fdtype)[:, None, :],
        (R, T_full, P))

    keys = jax.random.split(k_noise, N)
    J0, J1 = _monte_carlo_impl(u_rand, keys, ip_hist, s_hist, params,
                               init, w_daywise, cfg=cfg)
    return J0, J1, u_rand


@_functools.partial(jax.jit, static_argnames=("cfg",))
def _monte_carlo_impl(u_rand, keys, ip_hist, s_hist, params, init,
                      w_daywise, *, cfg):
    """Module-level jitted Monte-Carlo scoring (hoisted so compilation
    caches across pipeline invocations)."""
    N, H, P = u_rand.shape
    R = s_hist.shape[0]

    def per_scenario(u_s, k_s):
        traj = _rollout_from(cfg, init, params, s_hist[:, -1, :],
                             jnp.broadcast_to(u_s[None], (R, H, P)),
                             k_s if cfg.stochastic_forecast else None)
        s = jnp.concatenate([s_hist[..., 0], traj[..., 0]], axis=1)
        i = jnp.concatenate([s_hist[..., 1], traj[..., 1]], axis=1)
        al = jnp.concatenate([s_hist[..., 2], traj[..., 2]], axis=1)
        u_full = jnp.concatenate(
            [ip_hist, jnp.broadcast_to(u_s[None], (R, H, P))], axis=1)
        return npi_cost(s * i * al, jnp.swapaxes(u_full, 1, 2),
                        jnp.swapaxes(w_daywise, 1, 2))

    return jax.vmap(per_scenario)(u_rand, keys)
