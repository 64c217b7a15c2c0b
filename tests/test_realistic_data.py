"""Real-artifact data fixture: the pipeline end-to-end on jointly-composed
real-data pathologies (round-2 verdict missing #1).

Every reference driver consumes the real OxCGRT download, whose case
histories carry negative revisions, reporting gaps, weekend dips, NaN holes
and late-starting regions IN COMBINATION — exactly what the cleaning layer
(Tools/TrainPredictPrescribeNPI.m:121-170) exists for, and previously only
exercised one-at-a-time. data.realistic_oxford_frame composes them all on a
known generating epidemic; this test drives CSV -> loader -> cleaning ->
full train-predict-prescribe, then pins the trained coefficients and costs
against a committed golden so the failure mode is "real data broke the
cleaning", not "shapes were wrong". Regenerate after an INTENDED change:
    GOLDEN_REGEN=1 python -m pytest tests/test_realistic_data.py -q
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "realistic_pipeline.npz")


@pytest.fixture(scope="module")
def pipeline_result(tmp_path_factory):
    import jax
    from epidemicmodeling_tpu.data import realistic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import NPI_MAXES_DEFAULT
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        train_predict_prescribe
    from epidemicmodeling_tpu.control import epsilon_grid

    tmp = tmp_path_factory.mktemp("realdata")
    df, pops, truth = realistic_oxford_frame(n_regions=4, n_days=200, seed=7)
    df.to_csv(tmp / "oxford.csv", index=False)
    pops.to_csv(tmp / "populations.csv", index=False)
    pops[["CountryName", "RegionName"]].to_csv(tmp / "geos.csv", index=False)

    res = train_predict_prescribe(
        npi_weights=np.ones(12),
        epsilon_values=np.asarray(epsilon_grid(6)),
        start_train_date="2020-03-01", end_train_date="2020-08-17",
        start_regression_date="2020-03-01", end_predict_date="2020-09-16",
        data_file=str(tmp / "oxford.csv"), geo_file=str(tmp / "geos.csv"),
        populations_file=str(tmp / "populations.csv"),
        npi_maxes=NPI_MAXES_DEFAULT,
        cfg=PipelineConfig(backend="lanes", smoother_gain="solve",
                           pareto_chunk=3, num_monte_carlo=16),
        key=jax.random.PRNGKey(0))
    return res, truth


def test_pathological_data_survives_cleaning(pipeline_result):
    """All four regions (incl. the late starter) flow through: finite
    trained coefficients, finite costs, and a nonempty Pareto front."""
    res, truth = pipeline_result
    assert len(res.trained.names) == 4        # nobody silently dropped
    a2 = np.asarray(res.trained.a2)
    assert np.isfinite(a2).all() and (a2 >= 0).all()   # NNLS
    for k in ("J0", "J1"):
        v = np.asarray(res.pareto[k])
        assert np.isfinite(v).all(), f"pareto {k} not finite"
    assert np.asarray(res.pareto_front).sum(axis=0).min() >= 1
    sc = res.scenarios["fixed"]
    assert np.isfinite(np.asarray(sc.s * sc.i * sc.alpha)).all()


def test_cleaning_recovers_generating_epidemic(pipeline_result):
    """The artifacts perturb reporting, not the epidemic: the cleaned,
    smoothed case curve must stay close to the clean generating curve
    (weekly totals are conserved by the weekend/gap artifacts; revisions
    and NaN holes cost a bounded fraction)."""
    res, truth = pipeline_result
    bt = res.batch_train
    for r, name in enumerate(bt.names):
        clean = truth[name]["confirmed_clean"]
        pop = truth[name]["pop"]
        T = np.asarray(bt.new_cases_norm).shape[1]
        got_total = np.asarray(bt.new_cases_norm)[r].sum() * pop
        want_total = clean[min(T, len(clean)) - 1]
        # negative revisions remove ~10%; everything else conserves mass
        assert got_total > 0.6 * want_total, (name, got_total, want_total)
        assert got_total < 1.35 * want_total, (name, got_total, want_total)


def test_realistic_pipeline_golden(pipeline_result):
    res, _ = pipeline_result
    computed = {
        "a2": np.asarray(res.trained.a2),
        "b2": np.asarray(res.trained.b2),
        "J0": np.asarray(res.pareto["J0"]),
        "J1": np.asarray(res.pareto["J1"]),
    }
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **computed)
        if os.environ.get("GOLDEN_REGEN") != "1":
            pytest.skip("golden written; commit tests/goldens/ and rerun")
    g = np.load(GOLDEN)
    for k, v in computed.items():
        np.testing.assert_allclose(
            v, g[k], rtol=1e-9, atol=1e-12,
            err_msg=f"{k} drifted from the committed golden (the cleaning "
                    "layer's handling of real-data artifacts changed)")
