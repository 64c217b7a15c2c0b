"""End-to-end pipeline tests on synthetic OxCGRT-schema data: the sim ->
train -> predict -> prescribe round trip, Pareto dominance over random
policies, and checkpoint save/load."""

import numpy as np
import jax
import pytest

from epidemicmodeling_tpu.data import synthetic_oxford_frame, NPI_MAXES_DEFAULT
from epidemicmodeling_tpu.data.oxford import load_oxford_data
from epidemicmodeling_tpu.pipelines import (
    PipelineConfig, train_predict_prescribe, save_trained_params,
    load_trained_params)
from epidemicmodeling_tpu.control import epsilon_grid


@pytest.fixture(scope="module")
def synth_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    df, pops, truth = synthetic_oxford_frame(n_regions=3, n_days=200, seed=0)
    data_file = tmp / "oxford.csv"
    pop_file = tmp / "populations.csv"
    geo_file = tmp / "geos.csv"
    df.to_csv(data_file, index=False)
    pops.to_csv(pop_file, index=False)
    pops[["CountryName", "RegionName"]].to_csv(geo_file, index=False)
    return dict(data=data_file, pops=pop_file, geos=geo_file, truth=truth,
                df=df)


@pytest.fixture(scope="module")
def pipeline_result(synth_files):
    P = 12
    eps = epsilon_grid(16)
    cfg = PipelineConfig(num_monte_carlo=50, pareto_chunk=8)
    return train_predict_prescribe(
        npi_weights=np.ones(P),
        epsilon_values=np.asarray(eps),
        start_train_date="2020-03-01",
        end_train_date="2020-08-17",   # 170 days of training
        start_regression_date="2020-03-01",
        end_predict_date="2020-09-16",  # 30-day horizon
        data_file=synth_files["data"],
        geo_file=synth_files["geos"],
        populations_file=synth_files["pops"],
        npi_mins=np.zeros(P),
        npi_maxes=NPI_MAXES_DEFAULT,
        cfg=cfg,
        key=jax.random.PRNGKey(0),
    )


def test_pipeline_shapes(pipeline_result):
    res = pipeline_result
    R = len(res.trained.names)
    assert R == 3
    E = res.pareto["J0"].shape[0]
    assert E == 16
    assert res.pareto["u_prescribed"].shape[1] == R
    assert res.monte_carlo["J0"].shape == (50, R)
    assert res.pareto_front.shape == (E, R)
    assert res.pareto_front.any(axis=0).all()  # every region has a front


def test_training_recovers_alpha_track(synth_files, pipeline_result):
    """The smoothed state estimates must (a) reproduce the observed new-case
    product s*i*alpha to sub-percent accuracy and (b) put alpha in the right
    range. The (i, alpha) split is only weakly identifiable from the product
    observation — the reference has the same trade-off — so alpha gets a
    scale-level bound, while the product gets a tight one."""
    res = pipeline_result
    truth = synth_files["truth"]
    obs = np.asarray(res.batch_train.observations)
    for r, name in enumerate(res.trained.names):
        al_true = truth[name]["alpha"][:170]
        sh = np.asarray(res.s_hist[r])
        T = min(len(al_true), sh.shape[0])
        prod_est = sh[:T, 0] * sh[:T, 1] * sh[:T, 2]
        prod_obs = obs[r, :T]
        rel = np.abs(prod_est[30:] - prod_obs[30:]) / np.maximum(
            prod_obs[30:], 1e-12)
        assert np.median(rel) < 0.05, f"{name}: product err {np.median(rel)}"
        err = np.abs(sh[T // 2: T, 2] - al_true[T // 2: T])
        assert np.median(err) < 0.35 * np.median(al_true)


def test_prescriptions_are_bang_bang(pipeline_result):
    res = pipeline_result
    u = np.asarray(res.pareto["u_prescribed"])  # (E, R, H, P)
    # the last forecast day is the smoother's unwritten zero sample; all
    # earlier days must sit at a bound
    u_active = u[:, :, :-1, :]
    at_bounds = (u_active == 0.0) | (
        u_active == NPI_MAXES_DEFAULT[None, None, None, :])
    assert at_bounds.all()


def test_epsilon_monotonicity(pipeline_result):
    """Larger epsilon weights NPI burden more => prescribed NPI usage (J1)
    must not increase (weakly decreasing along the epsilon grid)."""
    res = pipeline_result
    J1 = np.asarray(res.pareto["J1"])  # (E, R)
    eps = np.asarray(res.pareto["epsilon"])
    order = np.argsort(eps)
    J1s = J1[order]
    # compare low-epsilon third vs high-epsilon third
    lo = J1s[: len(eps) // 3].mean(axis=0)
    hi = J1s[-len(eps) // 3:].mean(axis=0)
    assert np.all(hi <= lo + 1e-9)


def test_pareto_dominance_over_random(pipeline_result):
    """The optimal prescriptions' Pareto front must not be dominated by any
    random policy (the reference's implicit correctness oracle for the
    control law, SURVEY.md §4 #5)."""
    res = pipeline_result
    J0_opt = np.asarray(res.pareto["J0"])
    J1_opt = np.asarray(res.pareto["J1"])
    J0_mc = np.asarray(res.monte_carlo["J0"])
    J1_mc = np.asarray(res.monte_carlo["J1"])
    R = J0_opt.shape[1]
    for r in range(R):
        front = res.pareto_front[:, r]
        f0, f1 = J0_opt[front, r], J1_opt[front, r]
        # a random policy dominates a front point if strictly better in both
        dom = (J0_mc[:, r][:, None] < f0[None, :] - 1e-12) & \
              (J1_mc[:, r][:, None] < f1[None, :] - 1e-12)
        frac_dominated = dom.any(axis=0).mean()
        assert frac_dominated < 0.34, (
            f"region {r}: {frac_dominated:.0%} of front dominated by random")


def test_checkpoint_roundtrip(tmp_path, pipeline_result):
    res = pipeline_result
    path = tmp_path / "params.npz"
    save_trained_params(path, res.trained)
    loaded = load_trained_params(path)
    assert loaded.names == res.trained.names
    np.testing.assert_allclose(loaded.a2, np.asarray(res.trained.a2))
    np.testing.assert_allclose(loaded.b2, np.asarray(res.trained.b2))


def test_regression_recovers_npi_influence(synth_files, pipeline_result):
    """Round-2 regression coefficients reconstruct the generating alpha from
    the NPIs reasonably: predicted alpha = b2 + a2.(umax - u)."""
    res = pipeline_result
    truth = synth_files["truth"]
    for r, name in enumerate(res.trained.names):
        tr = truth[name]
        a2 = np.asarray(res.trained.a2[r])
        b2 = float(res.trained.b2[r])
        u = tr["u"][:170]
        alpha_pred = b2 + (NPI_MAXES_DEFAULT[None, :] - u) @ a2
        alpha_true = tr["alpha"][:170]
        # relative RMS error of the reconstructed alpha over the stable tail
        t0 = 30
        rel = (np.sqrt(np.mean((alpha_pred[t0:] - alpha_true[t0:]) ** 2))
               / np.mean(alpha_true[t0:]))
        assert rel < 0.5


def test_train_npi_prescriptor_with_mortality(synth_files):
    """Training-only entry + death-based mortality/beta estimates
    (TrainNPIPrescriptor.m:264-273) using batch-carried death series."""
    import pandas as pd
    from epidemicmodeling_tpu.data.preprocess import (preprocess_region,
                                                      build_region_batch)
    from epidemicmodeling_tpu.pipelines.train import train_npi_prescriptor
    truth = synth_files["truth"]
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        deaths = np.cumsum(0.01 * nc)
        sers.append(preprocess_region(np.cumsum(nc)[:150], deaths[:150],
                                      tr["u"][:150], tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)
    out, mort = train_npi_prescriptor(batch, np.zeros(12),
                                      NPI_MAXES_DEFAULT, 150)
    assert mort is not None
    # generated mortality is 1% of cases; smoothed ratio converges near it
    assert np.all(np.abs(np.asarray(mort.med_recent_mortality) - 0.01)
                  < 0.005)
    assert np.isfinite(np.asarray(mort.med_recent_beta)).all()


@pytest.mark.parametrize("regression_type", ["LASSO",
                                             "NONNEGATIVELS-ELEMENT-WISE"])
def test_train_regions_alternative_regressors(synth_files, regression_type):
    """The LASSO / robust element-wise regression options must run vmapped
    over regions and produce finite coefficients
    (TrainPredictPrescribeNPI.m:21 REGRESSION_TYPE toggle)."""
    from epidemicmodeling_tpu.data.preprocess import (preprocess_region,
                                                      build_region_batch)
    from epidemicmodeling_tpu.pipelines.core import train_regions
    truth = synth_files["truth"]
    sers, names = [], []
    for name, tr in list(truth.items())[:2]:
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:120], None,
                                      tr["u"][:120], tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)
    cfg = PipelineConfig(regression_type=regression_type, lasso_cv_folds=5)
    out = train_regions(batch, np.zeros(12), NPI_MAXES_DEFAULT, 120, cfg)
    a2 = np.asarray(out.trained.a2)
    assert a2.shape == (2, 12)
    assert np.isfinite(a2).all()
    if regression_type == "NONNEGATIVELS-ELEMENT-WISE":
        assert (a2 >= 0).all()


def test_orbax_checkpoint_roundtrip(tmp_path, pipeline_result):
    from epidemicmodeling_tpu.pipelines.checkpoint import (
        save_trained_params_orbax, load_trained_params_orbax)
    res = pipeline_result
    d = save_trained_params_orbax(tmp_path / "ckpt", res.trained)
    loaded = load_trained_params_orbax(d)
    assert loaded.names == res.trained.names
    np.testing.assert_allclose(np.asarray(loaded.a2),
                               np.asarray(res.trained.a2))


def test_pareto_store_trajectories_knob(synth_files):
    """pareto_store_trajectories=False must return identical costs and
    prescriptions (trajectories None) via the donated-buffer path."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe)
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        build_batches_from_frames
    from epidemicmodeling_tpu.data.oxford import (load_oxford_data,
                                                  load_populations,
                                                  load_geo_list)

    df = load_oxford_data(synth_files["data"], None, "2020-03-01",
                          "2020-09-16")
    pops = load_populations(synth_files["pops"])
    geo_ids = load_geo_list(synth_files["geos"])
    bt, bf, _, T_hist, _ = build_batches_from_frames(
        df, pops, geo_ids, "2020-03-01", "2020-08-17", "2020-09-16")
    eps = np.asarray(epsilon_grid(6))
    out = {}
    for store in (True, False):
        cfg = PipelineConfig(backend="lanes", pareto_chunk=2,
                             pareto_store_trajectories=store)
        to = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, T_hist, cfg,
                           dtype=jnp.float32)
        _, s_hist = forecast_scenarios(bf, to.trained, to.init, np.ones(12),
                                       np.zeros(12), NPI_MAXES_DEFAULT,
                                       T_hist, cfg, dtype=jnp.float32)
        out[store] = pareto_prescribe(bf, to.trained, to.init, s_hist, eps,
                                      np.ones(12), np.zeros(12),
                                      NPI_MAXES_DEFAULT, T_hist, cfg,
                                      dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out[True]["J0"]),
                                  np.asarray(out[False]["J0"]))
    np.testing.assert_array_equal(np.asarray(out[True]["u_prescribed"]),
                                  np.asarray(out[False]["u_prescribed"]))
    assert out[False]["s"] is None and out[True]["s"] is not None
