"""Integration against the reference's REAL sample data files (read-only):
populations.csv schema quirks (country rows with NaN RegionName, Code
columns), geo list joins, and the NPI cost weight files."""

import os

import numpy as np
import pandas as pd
import pytest

REF = "/root/reference/xprize-sample-data"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference sample data not mounted")


def test_load_real_populations_and_geos():
    from epidemicmodeling_tpu.data.oxford import (load_populations,
                                                  load_geo_list)
    pops = load_populations(f"{REF}/populations.csv")
    geos = load_geo_list(f"{REF}/countries_regions.csv")
    assert len(geos) > 200
    # country-level ids end with a space (NaN RegionName)
    assert any(g.endswith(" ") for g in geos)
    # the join works for a known country-level row
    assert "France " in pops.index
    assert float(np.atleast_1d(pops.loc["France ", "Population2020"])[0]) > 6e7
    # US state rows exist too
    assert any(g.startswith("United States ") and not g.endswith("States ")
               for g in geos)


def test_real_cost_files_schema():
    df = pd.read_csv(f"{REF}/fixed_equal_costs.csv")
    from epidemicmodeling_tpu.data.preprocess import OXFORD_NPI_COLUMNS
    for c in OXFORD_NPI_COLUMNS:
        assert c in df.columns
    w = df[OXFORD_NPI_COLUMNS].to_numpy(float)
    assert (w == 1.0).all()


def test_output_schemas_match_reference_examples(tmp_path):
    """Our writers must emit EXACTLY the column sets of the reference's
    shipped example output CSVs (the XPRIZE submission format a judge
    harness parses), and the per-geo uniform_random_costs.csv must load
    as per-region weights."""
    from epidemicmodeling_tpu.data.xprize_io import (
        write_predictions_csv, write_prescriptions_csv)
    from epidemicmodeling_tpu.data.oxford import load_npi_costs

    ex_presc = pd.read_csv(
        f"{REF}/2020-08-01_2020-08-04_prescriptions_example.csv")
    ex_pred = pd.read_csv(
        f"{REF}/2020-08-01_2020-08-04_predictions_example.csv")

    geos = ["Aruba ", "Afghanistan "]
    p1 = write_predictions_csv(tmp_path / "pred.csv", geos, "2020-08-01",
                               np.ones((2, 4)))
    p2 = write_prescriptions_csv(tmp_path / "presc.csv", geos, "2020-08-01",
                                 np.zeros((3, 2, 4, 12)))
    assert list(pd.read_csv(p1).columns) == list(ex_pred.columns)
    assert list(pd.read_csv(p2).columns) == list(ex_presc.columns)

    w = load_npi_costs(f"{REF}/uniform_random_costs.csv", geos)
    assert w.shape == (2, 12) and np.isfinite(w).all() and (w >= 0).all()
    # per-geo file: different regions carry different weights
    assert not np.allclose(w[0], w[1])


def test_pipeline_runs_on_real_geo_population_files(tmp_path):
    """Full pipeline: synthetic case data for three REAL region ids, joined
    against the reference's actual populations/geo files."""
    import jax
    from epidemicmodeling_tpu.data.oxford import load_populations
    from epidemicmodeling_tpu.data.preprocess import (OXFORD_NPI_COLUMNS,
                                                      NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.data.synthetic import _numpy_si_alpha_rollout
    from epidemicmodeling_tpu.pipelines import (PipelineConfig,
                                                train_predict_prescribe)
    from epidemicmodeling_tpu.control import epsilon_grid

    pops = load_populations(f"{REF}/populations.csv")
    chosen = ["France ", "Italy ", "Japan "]
    rng = np.random.default_rng(0)
    rows = []
    n_days = 140
    dates = pd.date_range("2020-03-01", periods=n_days, freq="D")
    for gid in chosen:
        country = gid.strip()
        pop = float(np.atleast_1d(pops.loc[gid, "Population2020"])[0])
        P = 12
        u = np.repeat(rng.integers(0, 3, (5, P)), 30, axis=0)[:n_days]
        beta = 0.219
        s, i, al = _numpy_si_alpha_rollout(
            u.astype(float), 1 - 50 / pop, 50 / pop, beta + 0.8,
            NPI_MAXES_DEFAULT, 1e-8, 100.0, 1 / 7, 0.008 * rng.random(P),
            beta * 0.85, beta, n_days, 1.0)
        conf = np.cumsum(s * i * al * pop)
        for t in range(n_days):
            row = {"CountryName": country, "RegionName": np.nan,
                   "Date": int(dates[t].strftime("%Y%m%d")),
                   "ConfirmedCases": conf[t],
                   "ConfirmedDeaths": 0.01 * conf[t]}
            for j, c in enumerate(OXFORD_NPI_COLUMNS):
                row[c] = u[t, j]
            rows.append(row)
    data_file = tmp_path / "ox.csv"
    pd.DataFrame(rows).to_csv(data_file, index=False)
    geo_file = tmp_path / "geo.csv"
    pd.DataFrame({"CountryName": [g.strip() for g in chosen],
                  "RegionName": [np.nan] * 3}).to_csv(geo_file, index=False)

    res = train_predict_prescribe(
        npi_weights=np.ones(12), epsilon_values=np.asarray(epsilon_grid(6)),
        start_train_date="2020-03-01", end_train_date="2020-06-28",
        start_regression_date="2020-03-01", end_predict_date="2020-07-18",
        data_file=data_file, geo_file=geo_file,
        populations_file=f"{REF}/populations.csv",
        npi_mins=np.zeros(12), npi_maxes=NPI_MAXES_DEFAULT,
        cfg=PipelineConfig(num_monte_carlo=20, pareto_chunk=3),
        key=jax.random.PRNGKey(0))
    assert len(res.trained.names) == 3
    assert np.isfinite(np.asarray(res.pareto["J0"])).all()
    # populations joined from the REAL file
    assert res.trained.population[0] > 1e7
