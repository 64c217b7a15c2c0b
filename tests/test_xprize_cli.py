"""XPRIZE CLI driver + per-region NPI cost weights.

Covers testScripts/testPrescribeXPRIZE02.m (the Phase-II entry point: config
-> full pipeline -> prescription CSVs) and the per-geo weight rows of
Tools/TrainPredictPrescribeNPI.m:109-127 (uniform_random_costs.csv)."""

import json

import numpy as np
import pandas as pd
import pytest

from epidemicmodeling_tpu.data import (synthetic_oxford_frame,
                                       OXFORD_NPI_COLUMNS,
                                       NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.data.oxford import load_npi_costs


@pytest.fixture(scope="module")
def cli_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    df, pops, _ = synthetic_oxford_frame(n_regions=3, n_days=160, seed=5)
    df.to_csv(tmp / "oxford.csv", index=False)
    pops.to_csv(tmp / "populations.csv", index=False)
    pops[["CountryName", "RegionName"]].to_csv(tmp / "geos.csv", index=False)
    rng = np.random.default_rng(1)
    costs = pops[["CountryName", "RegionName"]].copy()
    for c in OXFORD_NPI_COLUMNS:
        costs[c] = rng.uniform(0.5, 2.0, len(costs)).round(3)
    costs.to_csv(tmp / "costs.csv", index=False)
    return tmp, costs


def test_load_npi_costs_alignment(cli_files):
    tmp, costs = cli_files
    geo_ids = [f"{c} " for c in costs["CountryName"]]
    w = load_npi_costs(tmp / "costs.csv", geo_ids)
    assert w.shape == (3, 12)
    np.testing.assert_allclose(
        w, costs[OXFORD_NPI_COLUMNS].to_numpy(float))
    # unknown geo falls back to equal weight 1
    w2 = load_npi_costs(tmp / "costs.csv", ["Nowhere "] + geo_ids)
    np.testing.assert_array_equal(w2[0], np.ones(12))
    np.testing.assert_allclose(w2[1:], w)


def test_cli_end_to_end(cli_files):
    tmp, _ = cli_files
    from epidemicmodeling_tpu.pipelines.xprize_cli import main
    rc = main([
        "--data", str(tmp / "oxford.csv"),
        "--geos", str(tmp / "geos.csv"),
        "--populations", str(tmp / "populations.csv"),
        "--costs", str(tmp / "costs.csv"),
        "--start-train", "2020-03-01", "--end-train", "2020-07-09",
        "--end-predict", "2020-08-08",
        "--num-epsilon", "8", "--num-prescriptions", "3",
        "--backend", "lanes", "--pareto-chunk", "8",
        "--prescriptions-out", str(tmp / "presc.csv"),
        "--predictions-out", str(tmp / "pred.csv"),
        "--trained-params-out", str(tmp / "trained.npz"),
        "--summary-out", str(tmp / "summary.json"),
    ])
    assert rc == 0

    presc = pd.read_csv(tmp / "presc.csv")
    assert list(presc.columns[:4]) == ["PrescriptionIndex", "CountryName",
                                       "RegionName", "Date"]
    assert list(presc.columns[4:]) == OXFORD_NPI_COLUMNS
    assert sorted(presc["PrescriptionIndex"].unique()) == [0, 1, 2]
    assert presc["Date"].min() == "2020-07-10"   # day after end-train
    u = presc[OXFORD_NPI_COLUMNS].to_numpy()
    assert (u >= 0).all() and (u <= NPI_MAXES_DEFAULT[None, :]).all()
    # bang-bang: every cell is at the min or max of its NPI
    assert np.all((u == 0) | (u == NPI_MAXES_DEFAULT[None, :]))

    pred = pd.read_csv(tmp / "pred.csv")
    assert (pred["PredictedDailyNewCases"] >= 0).all()

    summary = json.loads((tmp / "summary.json").read_text())
    assert len(summary["epsilon"]) == 8
    assert len(summary["pareto_front_sizes"]) == 3

    z = np.load(tmp / "trained.npz")
    assert z["a2"].shape == (3, 12)


def test_per_region_weights_match_shared_when_equal(cli_files):
    """(R, P) weights with identical rows must reproduce the (P,) result
    bit-for-bit through the Pareto sweep."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe)
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        build_batches_from_frames
    from epidemicmodeling_tpu.data.oxford import (load_oxford_data,
                                                  load_populations,
                                                  load_geo_list)
    from epidemicmodeling_tpu.control import epsilon_grid

    tmp, _ = cli_files
    df = load_oxford_data(tmp / "oxford.csv", None, "2020-03-01",
                          "2020-08-08")
    pops = load_populations(tmp / "populations.csv")
    geo_ids = load_geo_list(tmp / "geos.csv")
    bt, bf, _, T_hist, _ = build_batches_from_frames(
        df, pops, geo_ids, "2020-03-01", "2020-07-09", "2020-08-08")

    P, R = 12, 3
    w_shared = 1.3 * np.ones(P)
    w_perreg = np.tile(w_shared[None, :], (R, 1))
    eps = np.asarray(epsilon_grid(4))
    cfg = PipelineConfig(backend="lanes", pareto_chunk=4)
    to = train_regions(bt, np.zeros(P), NPI_MAXES_DEFAULT, T_hist, cfg,
                       dtype=jnp.float32)
    outs = {}
    for tag, w in [("shared", w_shared), ("perreg", w_perreg)]:
        _, s_hist = forecast_scenarios(bf, to.trained, to.init, w,
                                       np.zeros(P), NPI_MAXES_DEFAULT,
                                       T_hist, cfg, dtype=jnp.float32)
        outs[tag] = pareto_prescribe(bf, to.trained, to.init, s_hist, eps,
                                     w, np.zeros(P), NPI_MAXES_DEFAULT,
                                     T_hist, cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(outs["shared"]["u_prescribed"]),
        np.asarray(outs["perreg"]["u_prescribed"]))
    np.testing.assert_array_equal(np.asarray(outs["shared"]["J1"]),
                                  np.asarray(outs["perreg"]["J1"]))


def test_per_region_weights_shift_prescriptions(cli_files):
    """Making one region's NPIs 100x more expensive must reduce (or keep
    equal) its prescribed NPI burden at every epsilon, leaving the other
    regions' prescriptions unchanged."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, pareto_prescribe)
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        build_batches_from_frames
    from epidemicmodeling_tpu.data.oxford import (load_oxford_data,
                                                  load_populations,
                                                  load_geo_list)

    tmp, _ = cli_files
    df = load_oxford_data(tmp / "oxford.csv", None, "2020-03-01",
                          "2020-08-08")
    pops = load_populations(tmp / "populations.csv")
    geo_ids = load_geo_list(tmp / "geos.csv")
    bt, bf, _, T_hist, _ = build_batches_from_frames(
        df, pops, geo_ids, "2020-03-01", "2020-07-09", "2020-08-08")

    P, R = 12, 3
    # mid-range epsilons: the 100x price hike must push the switching
    # function epsilon*w - gamma*lambda3*a past zero for at least one of them
    eps = np.array([1e-4, 1e-3, 1e-2, 1e-1])
    cfg = PipelineConfig(backend="lanes", pareto_chunk=4)
    to = train_regions(bt, np.zeros(P), NPI_MAXES_DEFAULT, T_hist, cfg,
                       dtype=jnp.float32)

    w_base = np.ones((R, P))
    w_pricey = w_base.copy()
    w_pricey[1] *= 100.0
    outs = {}
    for tag, w in [("base", w_base), ("pricey", w_pricey)]:
        _, s_hist = forecast_scenarios(bf, to.trained, to.init, w,
                                       np.zeros(P), NPI_MAXES_DEFAULT,
                                       T_hist, cfg, dtype=jnp.float32)
        outs[tag] = pareto_prescribe(bf, to.trained, to.init, s_hist, eps,
                                     w, np.zeros(P), NPI_MAXES_DEFAULT,
                                     T_hist, cfg, dtype=jnp.float32)
    u_b = np.asarray(outs["base"]["u_prescribed"])    # (E, R, H, P)
    u_p = np.asarray(outs["pricey"]["u_prescribed"])
    # untouched regions identical
    np.testing.assert_array_equal(u_b[:, [0, 2]], u_p[:, [0, 2]])
    # pricey region: burden never increases, and strictly drops somewhere
    burden_b = u_b[:, 1].sum(axis=(1, 2))
    burden_p = u_p[:, 1].sum(axis=(1, 2))
    assert (burden_p <= burden_b).all()
    assert (burden_p < burden_b).any()


def test_cli_prescribe_from_checkpoint(cli_files):
    """--load-params must skip retraining and reproduce the trained run's
    prescriptions exactly (testPrescribeXPRIZE01.m: prescribe from .mat)."""
    import pandas as pd
    from epidemicmodeling_tpu.pipelines.xprize_cli import main
    tmp, _ = cli_files
    base = [
        "--data", str(tmp / "oxford.csv"),
        "--geos", str(tmp / "geos.csv"),
        "--populations", str(tmp / "populations.csv"),
        "--start-train", "2020-03-01", "--end-train", "2020-07-09",
        "--end-predict", "2020-08-08",
        "--num-epsilon", "4", "--num-prescriptions", "2",
        "--backend", "lanes", "--pareto-chunk", "4",
    ]
    assert main(base + ["--prescriptions-out", str(tmp / "p_train.csv"),
                        "--trained-params-out", str(tmp / "ck.npz")]) == 0
    assert main(base + ["--prescriptions-out", str(tmp / "p_ckpt.csv"),
                        "--load-params", str(tmp / "ck.npz")]) == 0
    a = pd.read_csv(tmp / "p_train.csv")
    b = pd.read_csv(tmp / "p_ckpt.csv")
    assert a.equals(b)


def test_run_pipeline_trained_reorders_and_validates(cli_files):
    """run_pipeline(trained=...) must re-align checkpoint rows to the
    batch's region order and reject checkpoints missing a region."""
    import pytest as _pytest
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import TrainedRegionParams
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import (
        build_batches_from_frames, run_pipeline)
    from epidemicmodeling_tpu.data.oxford import (load_oxford_data,
                                                  load_populations,
                                                  load_geo_list)

    tmp, _ = cli_files
    df = load_oxford_data(tmp / "oxford.csv", None, "2020-03-01",
                          "2020-08-08")
    pops = load_populations(tmp / "populations.csv")
    geo_ids = load_geo_list(tmp / "geos.csv")
    bt, bf, act, T_hist, _ = build_batches_from_frames(
        df, pops, geo_ids, "2020-03-01", "2020-07-09", "2020-08-08")

    cfg = PipelineConfig(backend="lanes", pareto_chunk=4)
    kw = dict(npi_weights=np.ones(12), epsilon_values=np.array([0.1, 0.5]),
              npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
              num_regression_days=T_hist, cfg=cfg)

    res = run_pipeline(bt, bf, act, T_hist, **kw)
    t = res.trained
    # reversed row order must give identical results after re-alignment
    rev = TrainedRegionParams(
        names=tuple(reversed(t.names)),
        population=np.asarray(t.population)[::-1],
        a1=np.asarray(t.a1)[::-1], b1=np.asarray(t.b1)[::-1],
        a2=np.asarray(t.a2)[::-1], b2=np.asarray(t.b2)[::-1])
    res2 = run_pipeline(bt, bf, act, T_hist, trained=rev, **kw)
    np.testing.assert_array_equal(
        np.asarray(res.pareto["u_prescribed"]),
        np.asarray(res2.pareto["u_prescribed"]))

    short = TrainedRegionParams(
        names=t.names[:-1], population=np.asarray(t.population)[:-1],
        a1=np.asarray(t.a1)[:-1], b1=np.asarray(t.b1)[:-1],
        a2=np.asarray(t.a2)[:-1], b2=np.asarray(t.b2)[:-1])
    with _pytest.raises(ValueError, match="missing trained parameters"):
        run_pipeline(bt, bf, act, T_hist, trained=short, **kw)


def test_read_future_ip_real_reference_file():
    """Parse the real XPRIZE future_ip.csv (read-only reference data)."""
    import os
    path = "/root/reference/xprize-sample-data/future_ip.csv"
    if not os.path.exists(path):
        pytest.skip("reference sample data not mounted")
    from epidemicmodeling_tpu.data import read_future_ip
    u = read_future_ip(path, ["India ", "Atlantis "],
                       "2020-08-01", "2020-08-10")
    assert u.shape == (2, 10, 12)
    assert u[0].max() > 0          # India has plan entries
    assert not u[1].any()          # unknown geo -> all-zero plan
    assert (u >= 0).all() and (u <= NPI_MAXES_DEFAULT[None, None, :]).all()


def test_scenario_from_schedule_monotone_in_npis(cli_files):
    """Forecast conditioned on a stricter plan must produce fewer future
    cases (predict-under-plan semantics of future_ip.csv)."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.core import (
        train_regions, forecast_scenarios, scenario_from_schedule)
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        build_batches_from_frames
    from epidemicmodeling_tpu.data.oxford import (load_oxford_data,
                                                  load_populations,
                                                  load_geo_list)

    tmp, _ = cli_files
    df = load_oxford_data(tmp / "oxford.csv", None, "2020-03-01",
                          "2020-08-08")
    pops = load_populations(tmp / "populations.csv")
    geo_ids = load_geo_list(tmp / "geos.csv")
    bt, bf, _, T_hist, _ = build_batches_from_frames(
        df, pops, geo_ids, "2020-03-01", "2020-07-09", "2020-08-08")

    P, R, H = 12, 3, bf.observations.shape[1] - T_hist
    cfg = PipelineConfig(backend="lanes", pareto_chunk=4)
    to = train_regions(bt, np.zeros(P), NPI_MAXES_DEFAULT, T_hist, cfg,
                       dtype=jnp.float32)
    _, s_hist = forecast_scenarios(bf, to.trained, to.init, np.ones(P),
                                   np.zeros(P), NPI_MAXES_DEFAULT, T_hist,
                                   cfg, dtype=jnp.float32)
    cases = {}
    for tag, level in [("none", 0.0), ("max", None)]:
        u_plan = (np.zeros((R, H, P)) if level == 0.0
                  else np.tile(NPI_MAXES_DEFAULT[None, None, :], (R, H, 1)))
        sc = scenario_from_schedule(bf, to.trained, to.init, s_hist, u_plan,
                                    np.ones(P), np.zeros(P),
                                    NPI_MAXES_DEFAULT, T_hist, cfg,
                                    dtype=jnp.float32)
        cases[tag] = np.asarray(sc.s * sc.i * sc.alpha)[:, T_hist:].sum(1)
    assert (cases["max"] <= cases["none"]).all()
    assert (cases["max"] < cases["none"]).any()


def test_load_trained_params_mat_real_reference_checkpoint():
    """Import the reference's own MATLAB-trained checkpoint (read-only)."""
    import os
    path = ("/root/reference/xprize-sample-data/"
            "prescription_trained_params_nonnegls.mat")
    if not os.path.exists(path):
        pytest.skip("reference sample data not mounted")
    from epidemicmodeling_tpu.pipelines import load_trained_params_mat
    t = load_trained_params_mat(path)
    assert len(t.names) == 235
    assert t.a2.shape == (235, 12) and t.a1.shape == (235, 12)
    assert (t.population > 0).all()
    # NNLS-trained coefficients are non-negative
    assert (t.a2 >= 0).all()
    assert np.isfinite(t.a2).all() and np.isfinite(t.b2).all()
    assert "Afghanistan " in t.names


@pytest.mark.parametrize("name,n_regions", [
    ("lasso", 235), ("train_and_prescribe", 1)])
def test_load_trained_params_mat_other_reference_checkpoints(name, n_regions):
    """The reference ships THREE trained-params .mat files; the LASSO one
    (coefficients may be any sign) and the single-region
    train_and_prescribe one must import too — a user migrating MATLAB
    training output should not depend on which solver produced it."""
    import os
    path = ("/root/reference/xprize-sample-data/"
            f"prescription_trained_params_{name}.mat")
    if not os.path.exists(path):
        pytest.skip("reference sample data not mounted")
    from epidemicmodeling_tpu.pipelines import load_trained_params_mat
    t = load_trained_params_mat(path)
    assert len(t.names) == n_regions
    assert t.a2.shape == (n_regions, 12)
    assert np.isfinite(np.asarray(t.a2)).all()
    assert np.isfinite(np.asarray(t.b2)).all()
    assert (np.asarray(t.population) > 0).all()


def test_mat_checkpoint_roundtrip(tmp_path):
    """save_trained_params_mat -> load_trained_params_mat is lossless, and
    the real reference checkpoint survives a round trip."""
    import os
    from epidemicmodeling_tpu.pipelines import (load_trained_params_mat,
                                                save_trained_params_mat)
    path = ("/root/reference/xprize-sample-data/"
            "prescription_trained_params_nonnegls.mat")
    if not os.path.exists(path):
        pytest.skip("reference sample data not mounted")
    t = load_trained_params_mat(path)
    out = save_trained_params_mat(tmp_path / "rt.mat", t)
    t2 = load_trained_params_mat(out)
    assert t2.names == t.names
    np.testing.assert_allclose(t2.population, t.population)
    np.testing.assert_allclose(t2.a1, t.a1)
    np.testing.assert_allclose(t2.b1, t.b1)
    np.testing.assert_allclose(t2.a2, t.a2)
    np.testing.assert_allclose(t2.b2, t.b2)


def test_cli_config_toggles(cli_files):
    """--observation-type/--num-monte-carlo/--stochastic-forecast reach the
    PipelineConfig and produce a complete run (TOTALCASES observation model
    + stochastic rollouts; SIAlphaModelEKF.m:51-58, SIalpha_Controlled.m)."""
    tmp, _ = cli_files
    from epidemicmodeling_tpu.pipelines.xprize_cli import main
    rc = main([
        "--data", str(tmp / "oxford.csv"),
        "--geos", str(tmp / "geos.csv"),
        "--populations", str(tmp / "populations.csv"),
        "--start-train", "2020-03-01", "--end-train", "2020-06-15",
        "--end-predict", "2020-07-05",
        "--num-epsilon", "4", "--pareto-chunk", "2",
        "--backend", "lanes", "--float64",
        "--observation-type", "TOTALCASES",
        "--num-monte-carlo", "8", "--stochastic-forecast",
        "--prescriptions-out", str(tmp / "p.csv"),
        "--summary-out", str(tmp / "s.json"),
    ])
    assert rc == 0
    s = json.loads((tmp / "s.json").read_text())
    assert len(s["epsilon"]) == 4
    assert all(np.isfinite(v) for v in s["J0_mean_per_eps"])
