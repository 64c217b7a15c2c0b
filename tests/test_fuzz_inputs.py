"""Adversarial input fuzz for the product ingestion surface.

Every hostile frame must either be handled the way the reference handles
it (region skipped with a warning — Tools/TrainPredictPrescribeNPI.m:
103-113 — or cleaned by the documented rules, :156-170) or be refused
with a clear ValueError naming the problem. Never a wrong-shaped jit
crash, a silent mis-ordering, or a KeyError from pandas internals.
"""

import warnings

import numpy as np
import pandas as pd
import pytest

from epidemicmodeling_tpu.data.synthetic import synthetic_oxford_frame
from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
    build_batches_from_frames

START, END_TRAIN, END_PREDICT = "2020-03-01", "2020-07-09", "2020-08-08"


@pytest.fixture(scope="module")
def base():
    """A well-formed 3-region frame in post-load_oxford_data form
    (GeoID/DateNum columns added), plus the GeoID-indexed populations."""
    df, pops, _ = synthetic_oxford_frame(n_regions=3, n_days=160, seed=3)
    df = df.assign(DateNum=df["Date"].astype(np.int64),
                   GeoID=df["CountryName"] + " ")
    pops = pops.assign(GeoID=pops["CountryName"] + " ").set_index("GeoID")
    return df, pops, sorted(df["GeoID"].unique())


def _build(df, pops, geos, **kw):
    return build_batches_from_frames(df, pops, geos, START, END_TRAIN,
                                     END_PREDICT, **kw)


# ---- rows that should be REFUSED with a clear ValueError ----------------

def test_duplicate_dates_refused(base):
    df, pops, geos = base
    hostile = pd.concat([df, df[df["GeoID"] == geos[0]].iloc[40:42]],
                        ignore_index=True)
    with pytest.raises(ValueError, match="duplicate rows for date"):
        _build(hostile, pops, geos)


def test_interior_date_gap_refused(base):
    """Rows are consumed positionally as consecutive days while the
    horizon stays calendar-based, so a missing week inside the window
    would silently shift every later date — refuse instead."""
    df, pops, geos = base
    g0 = df["GeoID"] == geos[0]
    drop = df[g0].iloc[40:47].index          # a week-long interior hole
    with pytest.raises(ValueError, match="calendar gap"):
        _build(df.drop(index=drop), pops, geos)


def test_missing_npi_column_refused(base):
    df, pops, geos = base
    with pytest.raises(ValueError, match="missing required columns"):
        _build(df.drop(columns=["C1_School closing"]), pops, geos)


def test_missing_deaths_column_refused(base):
    df, pops, geos = base
    with pytest.raises(ValueError, match="missing required columns"):
        _build(df.drop(columns=["ConfirmedDeaths"]), pops, geos)


def test_empty_geo_list_refused(base):
    df, pops, _ = base
    with pytest.raises(ValueError, match="geo list is empty"):
        _build(df, pops, [])


def test_all_regions_too_short_refused(base):
    df, pops, geos = base
    hostile = df.groupby("GeoID", group_keys=False).head(1)
    with pytest.raises(ValueError, match="no region .* has usable"), \
            warnings.catch_warnings():
        warnings.simplefilter("ignore")
        _build(hostile, pops, geos)


def test_nonpositive_population_refused(base):
    df, pops, geos = base
    bad = pops.copy()
    bad.loc[geos[0], "Population2020"] = 0.0
    with pytest.raises(ValueError, match="population"):
        _build(df, bad, [geos[0]])


def test_nan_population_refused(base):
    df, pops, geos = base
    bad = pops.copy()
    bad.loc[geos[1], "Population2020"] = np.nan
    with pytest.raises(ValueError, match="population"):
        _build(df, bad, [geos[1]])


# ---- rows the reference SKIPS with a warning -----------------------------

def test_one_day_region_skipped_others_kept(base):
    """A 1-row region is skipped with a warning naming it; the remaining
    regions train (reference :103-106)."""
    df, pops, geos = base
    hostile = pd.concat([df[df["GeoID"] != geos[0]],
                         df[df["GeoID"] == geos[0]].iloc[:1]],
                        ignore_index=True)
    with pytest.warns(UserWarning, match="insufficient training data"):
        bt, bf, actual, T_hist, horizon = _build(hostile, pops, geos)
    assert list(bt.names) == geos[1:]
    assert actual.shape[0] == 2


def test_region_missing_from_populations_skipped(base):
    df, pops, geos = base
    with pytest.warns(UserWarning, match="no population entry"):
        bt, _, _, _, _ = _build(df, pops.drop(index=geos[2]), geos)
    assert list(bt.names) == geos[:2]


# ---- hostile-but-cleanable frames must flow through -----------------------

def test_unsorted_rows_are_sorted(base):
    """Shuffled row order must produce the identical batch as the sorted
    frame — never a silently time-scrambled series."""
    df, pops, geos = base
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    bt_ref, _, act_ref, _, _ = _build(df, pops, geos)
    bt_shf, _, act_shf, _, _ = _build(shuffled, pops, geos)
    np.testing.assert_array_equal(np.asarray(bt_ref.observations),
                                  np.asarray(bt_shf.observations))
    np.testing.assert_array_equal(act_ref, act_shf)


def test_nonmonotone_cumulative_cases_clipped(base):
    """Dips in cumulative counts (bulk corrections in real OxCGRT files)
    yield CLIPPED new cases (reference :159), not negatives or NaNs."""
    df, pops, geos = base
    hostile = df.copy()
    m = hostile["GeoID"] == geos[0]
    vals = hostile.loc[m, "ConfirmedCases"].to_numpy(float).copy()
    vals[50:55] = vals[45]          # revision wipes out a week of growth
    hostile.loc[m, "ConfirmedCases"] = vals
    bt, *_ = _build(hostile, pops, geos)
    obs = np.asarray(bt.observations)
    L = int(bt.length[0])
    assert np.isfinite(obs[0, :L]).all()
    assert (obs[0, :L] >= 0).all()


def test_all_nan_npi_columns_zero_filled(base):
    """All-NaN NPI columns forward-fill to zero (reference :121-128) and
    the batch still builds."""
    df, pops, geos = base
    hostile = df.copy()
    from epidemicmodeling_tpu.data.preprocess import OXFORD_NPI_COLUMNS
    hostile[OXFORD_NPI_COLUMNS] = np.nan
    bt, bf, actual, _, _ = _build(hostile, pops, geos)
    assert np.all(np.asarray(bt.npis) == 0.0)
    assert np.all(actual == 0.0)


def test_all_nan_case_series_flows_through(base):
    """A region whose every ConfirmedCases entry is NaN cleans to an
    all-zero series (reference :164-170) rather than crashing."""
    df, pops, geos = base
    hostile = df.copy()
    m = hostile["GeoID"] == geos[1]
    hostile.loc[m, "ConfirmedCases"] = np.nan
    bt, *_ = _build(hostile, pops, geos)
    r = list(bt.names).index(geos[1])
    L = int(bt.length[r])
    assert np.isfinite(np.asarray(bt.observations)[r, :L]).all()
    assert np.allclose(np.asarray(bt.observations)[r, :L], 0.0)


def test_hostile_batch_runs_the_pipeline():
    """The accepted end of the fuzz envelope must survive the jitted
    pipeline: non-monotone cases + all-NaN NPIs + a skipped region, tiny
    shapes, finite costs out."""
    from epidemicmodeling_tpu.data.preprocess import (OXFORD_NPI_COLUMNS,
                                                      NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        run_pipeline

    df, pops, _ = synthetic_oxford_frame(n_regions=3, n_days=70, seed=5)
    df = df.assign(DateNum=df["Date"].astype(np.int64),
                   GeoID=df["CountryName"] + " ")
    pops = pops.assign(GeoID=pops["CountryName"] + " ").set_index("GeoID")
    geos = sorted(df["GeoID"].unique())
    m0 = df["GeoID"] == geos[0]
    vals = df.loc[m0, "ConfirmedCases"].to_numpy(float).copy()
    vals[30:35] = vals[25]
    df.loc[m0, "ConfirmedCases"] = vals
    df.loc[df["GeoID"] == geos[1], OXFORD_NPI_COLUMNS] = np.nan
    df = pd.concat([df[df["GeoID"] != geos[2]],
                    df[df["GeoID"] == geos[2]].iloc[:1]], ignore_index=True)

    with pytest.warns(UserWarning, match="insufficient training data"):
        bt, bf, actual, T_hist, horizon = build_batches_from_frames(
            df, pops, geos, "2020-03-01", "2020-05-01", "2020-05-09")
    cfg = PipelineConfig(backend="vmap", num_monte_carlo=4, pareto_chunk=4)
    res = run_pipeline(bt, bf, actual, T_hist, np.ones(12),
                       np.array([1e-4, 0.5]), np.zeros(12),
                       NPI_MAXES_DEFAULT, T_hist, cfg)
    assert np.isfinite(np.asarray(res.pareto["J0"])).all()
    assert np.isfinite(np.asarray(res.pareto["J1"])).all()


# ---- CLI surface ----------------------------------------------------------

def test_cli_missing_npi_columns_is_a_clear_error(tmp_path):
    """A data CSV without the NPI columns must surface the missing-column
    ValueError, not a pandas KeyError."""
    from epidemicmodeling_tpu.pipelines.xprize_cli import main

    df, pops, _ = synthetic_oxford_frame(n_regions=2, n_days=80, seed=9)
    df.drop(columns=["H6_Facial Coverings"]).to_csv(
        tmp_path / "oxford.csv", index=False)
    pops.to_csv(tmp_path / "populations.csv", index=False)
    pops[["CountryName", "RegionName"]].to_csv(tmp_path / "geos.csv",
                                               index=False)
    with pytest.raises(ValueError, match="H6_Facial Coverings"):
        main(["--data", str(tmp_path / "oxford.csv"),
              "--geos", str(tmp_path / "geos.csv"),
              "--populations", str(tmp_path / "populations.csv"),
              "--start-train", "2020-03-01", "--end-train", "2020-05-01",
              "--end-predict", "2020-05-09",
              "--num-epsilon", "4", "--backend", "lanes",
              "--prescriptions-out", str(tmp_path / "p.csv")])
