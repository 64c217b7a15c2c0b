"""Batch-last EKF core parity: must match the generic vmapped core at f64."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.models import (si_alpha_ekf_system,
                                         si_alpha_costate_ekf_system,
                                         SIAlphaParams)
from epidemicmodeling_tpu.models.batch_last import (
    si_alpha_ekf_system_bl, si_alpha_costate_ekf_system_bl)
from epidemicmodeling_tpu.ops import ekf_smoother
from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl

U_MAX = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
P_NPI = 12


def build_lanes(B, T, nan_tail=0, with_costates=False, seed=0):
    rng = np.random.default_rng(seed)
    m = 6 if with_costates else 3
    u = rng.integers(0, 3, (B, T, P_NPI)).astype(float)
    obs = np.abs(rng.normal(1e-4, 3e-5, (B, T)))
    if nan_tail:
        obs[:, -nan_tail:] = np.nan
        if with_costates:
            u[:, -nan_tail:, :] = np.nan
    prs = []
    for b in range(B):
        kw = dict(dt=1.0, beta=0.2, gamma=1 / 7, a=0.004 * rng.random(P_NPI),
                  b=0.05 + 0.05 * rng.random(), u_min=np.zeros(P_NPI),
                  u_max=U_MAX, s_min=1e-6, i_min=1e-6, alpha_min=1e-8,
                  alpha_max=100.0)
        if with_costates:
            kw.update(epsilon=rng.random(), w=np.ones(P_NPI), sigma=1e6)
        prs.append(SIAlphaParams(**kw))
    params_b = jax.tree.map(lambda *l: jnp.stack(l), *prs)
    s_init = np.tile(np.array([0.999, 1e-4, 0.3, 0, 0, 0.0])[:m], (B, 1))
    Ps_init = np.tile(np.diag([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7][:m]),
                      (B, 1, 1))
    Q = np.tile(np.diag([1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8][:m]),
                (B, 1, 1))
    R = np.full((B, T), 4e-10)
    if with_costates:
        s_final = np.tile(np.array([np.nan, np.nan, np.nan, 0, 0, 0.0]),
                          (B, 1))
        Pf = np.full((6, 6), np.nan)
        Pf[3, 3] = Pf[4, 4] = Pf[5, 5] = 1e-8
        Ps_final = np.tile(Pf, (B, 1, 1))
    else:
        s_final = np.full((B, m), np.nan)
        Ps_final = np.full((B, m, m), np.nan)
    return u, obs, params_b, s_init, Ps_init, s_final, Ps_final, Q, R


def to_bl(a):
    """(B, ...) -> (..., B)"""
    a = jnp.asarray(a)
    return jnp.moveaxis(a, 0, -1)


@pytest.mark.parametrize("with_costates,nan_tail", [(False, 0), (False, 25),
                                                    (True, 25)])
def test_bl_matches_generic(with_costates, nan_tail):
    B, T = 6, 90
    (u, obs, params_b, s_init, Ps_init, s_final, Ps_final, Q,
     R) = build_lanes(B, T, nan_tail, with_costates)

    system = (si_alpha_costate_ekf_system() if with_costates
              else si_alpha_ekf_system())

    def one(u_, x_, p_, si, Pi, sf, Pf, Q_, R_):
        return ekf_smoother(system, u_, x_, p_, si, Pi, sf, Pf, Q=Q_, R=R_,
                            gamma_discount=0.995, smoother_gain="solve")

    ref = jax.vmap(one)(jnp.asarray(u), jnp.asarray(obs)[..., None],
                        params_b, jnp.asarray(s_init), jnp.asarray(Ps_init),
                        jnp.asarray(s_final), jnp.asarray(Ps_final),
                        jnp.asarray(Q), jnp.asarray(R))

    system_bl = (si_alpha_costate_ekf_system_bl() if with_costates
                 else si_alpha_ekf_system_bl())
    params_bl = jax.tree.map(to_bl, params_b)
    res = ekf_smoother_bl(
        system_bl,
        jnp.moveaxis(jnp.asarray(u), 0, -1),        # (T, p, B)
        jnp.asarray(obs).T,                          # (T, B)
        params_bl,
        to_bl(s_init), to_bl(Ps_init), to_bl(s_final), to_bl(Ps_final),
        Q=to_bl(Q), R=jnp.asarray(R).T, gamma_discount=0.995)

    np.testing.assert_allclose(np.moveaxis(np.asarray(res.s_plus), -1, 0),
                               np.asarray(ref.s_plus), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.moveaxis(np.asarray(res.s_smooth), -1, 0),
                               np.asarray(ref.s_smooth), rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(res.u_opt_smooth), -1, 0),
        np.asarray(ref.u_opt_smooth), rtol=1e-7, atol=1e-9)


def test_pipeline_backends_agree():
    """train + scenarios + pareto must produce identical results on the
    generic (vmap) and batch-last (lanes) backends at f64."""
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe)
    from epidemicmodeling_tpu.control import epsilon_grid

    _, _, truth = synthetic_oxford_frame(n_regions=3, n_days=130, seed=5)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:110], None,
                                      tr["u"][:110], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=20)
    eps = np.asarray(epsilon_grid(6))
    out = {}
    for backend in ["vmap", "lanes"]:
        cfg = PipelineConfig(smoother_gain="solve", backend=backend,
                             pareto_chunk=3)
        to = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, 110, cfg)
        scen, s_hist = forecast_scenarios(
            bf, to.trained, to.init, np.ones(12), np.zeros(12),
            NPI_MAXES_DEFAULT, 110, cfg)
        par = pareto_prescribe(bf, to.trained, to.init, s_hist, eps,
                               np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT,
                               110, cfg)
        # stochastic_forecast leg: the lanes sweep must consume the SAME
        # per-epsilon keys as the vmap path (round-2 verdict weak #2)
        cfg_s = PipelineConfig(smoother_gain="solve", backend=backend,
                               pareto_chunk=3, stochastic_forecast=True)
        par_s = pareto_prescribe(bf, to.trained, to.init, s_hist, eps,
                                 np.ones(12), np.zeros(12),
                                 NPI_MAXES_DEFAULT, 110, cfg_s,
                                 key=jax.random.PRNGKey(7))
        out[backend] = (to, scen, par, par_s)
    np.testing.assert_allclose(np.asarray(out["vmap"][0].trained.a2),
                               np.asarray(out["lanes"][0].trained.a2),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["vmap"][0].rho_round2),
                               np.asarray(out["lanes"][0].rho_round2)
                               .reshape(np.asarray(out["vmap"][0].rho_round2).shape),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out["vmap"][1]["fixed"].J0),
                               np.asarray(out["lanes"][1]["fixed"].J0),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out["vmap"][2]["J0"]),
                               np.asarray(out["lanes"][2]["J0"]), rtol=1e-9)
    # stochastic-mode parity: same keys -> same noise -> same costs
    np.testing.assert_allclose(np.asarray(out["vmap"][3]["J0"]),
                               np.asarray(out["lanes"][3]["J0"]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out["vmap"][3]["J1"]),
                               np.asarray(out["lanes"][3]["J1"]), rtol=1e-9)
    # and the noise actually bites (stochastic differs from deterministic)
    assert np.abs(np.asarray(out["lanes"][3]["J0"])
                  - np.asarray(out["lanes"][2]["J0"])).max() > 0


def test_bl_adaptive_R_matches_generic():
    """Fixed-R adaptive update (beta=0.9, GEKF.m:180-185): the lanes core's
    in-scan innovation-window R adaptation must match the generic core,
    which only adapts when R is fixed — so the generic lanes get a SCALAR R
    prior while the lanes core takes row 0 of its (T, B) schedule."""
    B, T = 4, 90
    (u, obs, params_b, s_init, Ps_init, s_final, Ps_final, Q,
     R) = build_lanes(B, T, nan_tail=25, with_costates=True, seed=3)
    R_prior = 4e-10

    system = si_alpha_costate_ekf_system()

    def one(u_, x_, p_, si, Pi, sf, Pf, Q_):
        return ekf_smoother(system, u_, x_, p_, si, Pi, sf, Pf, Q=Q_,
                            R=jnp.asarray(R_prior), beta=0.9,
                            gamma_discount=0.995, inv_monitor_len=21,
                            smoother_gain="solve")

    ref = jax.vmap(one)(jnp.asarray(u), jnp.asarray(obs)[..., None],
                        params_b, jnp.asarray(s_init), jnp.asarray(Ps_init),
                        jnp.asarray(s_final), jnp.asarray(Ps_final),
                        jnp.asarray(Q))

    params_bl = jax.tree.map(to_bl, params_b)
    res = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(),
        jnp.moveaxis(jnp.asarray(u), 0, -1), jnp.asarray(obs).T, params_bl,
        to_bl(s_init), to_bl(Ps_init), to_bl(s_final), to_bl(Ps_final),
        Q=to_bl(Q), R=jnp.full((T, B), R_prior), gamma_discount=0.995,
        beta=0.9, inv_monitor_len=21)

    np.testing.assert_allclose(np.moveaxis(np.asarray(res.s_plus), -1, 0),
                               np.asarray(ref.s_plus), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.moveaxis(np.asarray(res.s_smooth), -1, 0),
                               np.asarray(ref.s_smooth), rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(res.u_opt_smooth), -1, 0),
        np.asarray(ref.u_opt_smooth), rtol=1e-7, atol=1e-9)
    # adaptation really engaged: rho exists and the result differs from
    # the non-adaptive run
    base = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(),
        jnp.moveaxis(jnp.asarray(u), 0, -1), jnp.asarray(obs).T, params_bl,
        to_bl(s_init), to_bl(Ps_init), to_bl(s_final), to_bl(Ps_final),
        Q=to_bl(Q), R=jnp.full((T, B), R_prior), gamma_discount=0.995,
        inv_monitor_len=21)
    assert np.abs(np.asarray(res.s_plus) - np.asarray(base.s_plus)).max() > 0


def test_bl_adaptive_requires_monitor_window():
    (u, obs, params_b, s_init, Ps_init, s_final, Ps_final, Q,
     R) = build_lanes(2, 30, with_costates=True)
    params_bl = jax.tree.map(to_bl, params_b)
    with pytest.raises(ValueError, match="inv_monitor_len"):
        ekf_smoother_bl(
            si_alpha_costate_ekf_system_bl(),
            jnp.moveaxis(jnp.asarray(u), 0, -1), jnp.asarray(obs).T,
            params_bl, to_bl(s_init), to_bl(Ps_init), to_bl(s_final),
            to_bl(Ps_final), Q=to_bl(Q), R=jnp.asarray(R).T, beta=0.9)
