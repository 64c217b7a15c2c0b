"""Pipeline robustness: degenerate inputs must not crash or produce
non-finite parameters (the reference's data-level robustness, SURVEY.md §5:
NaN-in-filter handling, forward-fill, insufficient-data skips)."""

import numpy as np
import pytest

from epidemicmodeling_tpu.data.preprocess import (preprocess_region,
                                                  build_region_batch,
                                                  NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.core import train_regions


def _train(series, names, n_reg_days):
    b = build_region_batch(series, names)
    return train_regions(b, np.zeros(12), NPI_MAXES_DEFAULT, n_reg_days,
                         PipelineConfig())


def test_single_region():
    conf = np.cumsum(np.abs(np.random.default_rng(0).normal(50, 10, 100)))
    s = preprocess_region(conf, None, np.zeros((100, 12)), 1e6)
    out = _train([s], ["X "], 100)
    assert np.isfinite(np.asarray(out.trained.a2)).all()


def test_all_zero_cases():
    """A region with no epidemic at all must still train (I0 falls back to
    min_cases, TrainPredictPrescribeNPI.m:201)."""
    s = preprocess_region(np.zeros(80), None, np.zeros((80, 12)), 1e6)
    out = _train([s], ["Z "], 80)
    assert np.isfinite(np.asarray(out.trained.a2)).all()


def test_nan_riddled_series():
    """NaN confirmed counts and NaN NPI stretches are cleaned per the
    reference rules (back-fill last, zero-fill rest, NPI forward-fill)."""
    rng = np.random.default_rng(1)
    conf = np.cumsum(np.abs(rng.normal(50, 10, 90)))
    conf[::7] = np.nan
    conf[-1] = np.nan
    npis = rng.integers(0, 3, (90, 12)).astype(float)
    npis[40:50] = np.nan
    s = preprocess_region(conf, None, npis, 1e6)
    out = _train([s], ["N "], 90)
    assert np.isfinite(np.asarray(out.trained.a2)).all()


def test_regression_window_exceeding_series_uses_available_data():
    conf = np.cumsum(np.abs(np.random.default_rng(2).normal(50, 10, 60)))
    s = preprocess_region(conf, None, np.zeros((60, 12)), 1e6)
    out = _train([s], ["W "], 100)
    assert np.isfinite(np.asarray(out.trained.b2)).all()


def test_two_day_series():
    """The reference's minimum admissible length (:103: < 2 days skipped)."""
    s = preprocess_region(np.array([1.0, 3.0]), None, np.zeros((2, 12)), 1e6)
    out = _train([s], ["T "], 2)
    assert np.asarray(out.trained.a2).shape == (1, 12)


def test_sub_two_day_series_flagged_invalid():
    s = preprocess_region(np.array([5.0]), None, np.zeros((1, 12)), 1e6)
    assert not s.valid


def test_multi_year_horizon():
    """Three years of history + a six-month prescription horizon: the
    static-shape scan pipeline must stay finite end-to-end at T ~ 1280."""
    import jax.numpy as jnp
    from epidemicmodeling_tpu.pipelines.core import (forecast_scenarios,
                                                     pareto_prescribe)

    rng = np.random.default_rng(7)
    T, H = 1100, 180
    pop = 5e6
    u = np.repeat(rng.integers(0, 3, (T // 50 + 1, 12)), 50, axis=0)[:T]
    daily = 200 * (1.5 + np.sin(np.arange(T) / 90)) + rng.normal(0, 20, T)
    conf = np.cumsum(np.maximum(daily, 0.0))
    s = preprocess_region(conf, None, u, pop)
    bt = build_region_batch([s], ["Longland "])
    bf = build_region_batch([s], ["Longland "], horizon=H)
    cfg = PipelineConfig(backend="lanes", pareto_chunk=2,
                         smoother_gain="solve")
    out = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, 180, cfg,
                        dtype=jnp.float32)
    assert np.isfinite(np.asarray(out.trained.a2)).all()
    scen, s_hist = forecast_scenarios(bf, out.trained, out.init,
                                      np.ones(12), np.zeros(12),
                                      NPI_MAXES_DEFAULT, T, cfg,
                                      dtype=jnp.float32)
    assert np.isfinite(np.asarray(scen["fixed"].s)).all()
    par = pareto_prescribe(bf, out.trained, out.init, s_hist,
                           np.array([1e-3, 0.5]), np.ones(12), np.zeros(12),
                           NPI_MAXES_DEFAULT, T, cfg, dtype=jnp.float32)
    u_p = np.asarray(par["u_prescribed"])
    assert u_p.shape == (2, 1, H, 12)
    assert np.isfinite(np.asarray(par["J0"])).all()
    # bang-bang discreteness holds over the long horizon too
    assert np.all((u_p == 0) | (u_p == NPI_MAXES_DEFAULT[None, None, None, :]))


def test_iso_string_dates_and_all_skipped_error(tmp_path):
    """Two user-facing failure modes found by misuse probing (r4):
    1. a CSV whose Date column pandas infers as the Arrow-backed
       StringDtype (ISO '2020-03-01' dates) must parse, not crash
       np.issubdtype with an opaque TypeError;
    2. when EVERY region is skipped (short history / missing population),
       the pipeline must raise a clear ValueError, not
       'max() iterable argument is empty'."""
    import pytest
    from epidemicmodeling_tpu.data.oxford import load_oxford_data
    from epidemicmodeling_tpu.data.preprocess import NPI_MAXES_DEFAULT
    from epidemicmodeling_tpu.pipelines import (train_predict_prescribe,
                                                PipelineConfig)

    from epidemicmodeling_tpu.data.oxford import OXFORD_NPI_COLUMNS
    npi_hdr = "," + ",".join(OXFORD_NPI_COLUMNS)
    npi_row = "," + ",".join("0" for _ in OXFORD_NPI_COLUMNS)
    # the loader hard-refuses missing NPI columns since the r5 ingestion
    # fuzz — the fixture carries them so this test exercises only the
    # ISO-date and all-skipped paths
    data = tmp_path / "iso.csv"
    data.write_text(f"CountryName,RegionName,Date,ConfirmedCases{npi_hdr}\n"
                    f"X,,2020-03-01,5{npi_row}\nX,,2020-03-02,7{npi_row}\n")
    df = load_oxford_data(data)
    assert list(df["DateNum"]) == [20200301, 20200302]

    (tmp_path / "geo.csv").write_text("CountryName,RegionName\nX,\n")
    (tmp_path / "pop.csv").write_text(
        "CountryName,RegionName,Code,Population2020\nX,,X1,1000000\n")
    short = tmp_path / "short.csv"
    short.write_text(f"CountryName,RegionName,Date,ConfirmedCases{npi_hdr}\n"
                     f"X,,2020-03-01,5{npi_row}\n")  # 1 row -> skipped
    with pytest.warns(UserWarning, match="insufficient training"):
        with pytest.raises(ValueError, match="no region .* usable"):
            train_predict_prescribe(
                npi_weights=np.ones(12), epsilon_values=np.array([0.5]),
                start_train_date="2020-03-01", end_train_date="2020-03-20",
                start_regression_date="2020-03-01",
                end_predict_date="2020-04-01",
                data_file=str(short), geo_file=str(tmp_path / "geo.csv"),
                populations_file=str(tmp_path / "pop.csv"),
                npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
                cfg=PipelineConfig(backend="lanes", num_monte_carlo=4,
                                   pareto_chunk=1))


def test_cleaning_layer_fuzz_invariants():
    """Randomized pathological inputs (all NaN patterns x negative
    revisions x zero runs x constant tails) must never break the cleaning
    invariants of TrainPredictPrescribeNPI.m:121-170: finite non-negative
    refined new cases, finite NPI fills drawn from observed levels or 0,
    idempotent forward-fill, and a finite end-to-end RegionSeries."""
    from epidemicmodeling_tpu.data.preprocess import (
        clean_case_series, forward_fill_npis, preprocess_region)

    rng = np.random.default_rng(42)
    for trial in range(50):
        T = int(rng.integers(3, 120))
        confirmed = np.cumsum(np.abs(rng.normal(10, 20, T)))
        # random pathologies, jointly
        if rng.random() < 0.7:                       # NaN holes
            confirmed[rng.integers(0, T, size=rng.integers(1, max(2, T // 3)))] = np.nan
        if rng.random() < 0.5:                       # negative revisions
            t0 = int(rng.integers(1, T))
            confirmed[t0:] -= float(rng.uniform(0, confirmed[~np.isnan(confirmed)].max()))
        if rng.random() < 0.5:                       # trailing NaN
            confirmed[-1] = np.nan
        if rng.random() < 0.3:                       # leading NaN run
            confirmed[: int(rng.integers(1, T))] = np.nan
        if rng.random() < 0.3:                       # flat (gap) runs
            g = int(rng.integers(0, T - 1))
            confirmed[g:] = confirmed[g] if np.isfinite(confirmed[g]) else 0.0

        refined, ok = clean_case_series(confirmed)
        assert refined.shape == confirmed.shape
        assert np.isfinite(refined).all(), f"trial {trial}: NaN survived"
        assert (refined >= 0).all(), f"trial {trial}: negative new cases"

        P = int(rng.integers(1, 13))
        npis = rng.integers(0, 4, (T, P)).astype(float)
        mask = rng.random((T, P)) < 0.4
        npis[mask] = np.nan
        filled = forward_fill_npis(npis)
        assert np.isfinite(filled).all()
        # every filled value is a previously observed level or 0
        for j in range(P):
            obs_levels = set(npis[:, j][np.isfinite(npis[:, j])]) | {0.0}
            assert set(filled[:, j]).issubset(obs_levels), f"trial {trial}"
        # idempotence
        np.testing.assert_array_equal(forward_fill_npis(filled), filled)

        s = preprocess_region(confirmed, None, npis, 1e6)
        assert np.isfinite(s.new_cases_smoothed).all()
        assert np.isfinite(s.obs_noise_var).all()
        assert (s.obs_noise_var >= 0).all()
        assert np.isfinite(s.npis).all()
