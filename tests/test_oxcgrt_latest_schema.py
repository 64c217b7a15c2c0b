"""Live OxCGRT_latest.csv schema ingestion.

The reference drivers read the real OxCGRT download by column name
(Tools/TrainPredictPrescribeNPI.m:73-89), which carries ~50 columns:
CountryCode/RegionCode/Jurisdiction identity columns, per-NPI Flag columns,
E/H indicators the pipeline ignores, and aggregate indices. These tests
synthesize a frame in that exact schema and prove the loaders run
unmodified on it, with results identical to the minimal schema. (The full
CLI end-to-end leg lives in test_oxcgrt_cli_e2e.py — split out because
its pipeline compile dominated this file's runtime.) When a real download
is mounted (env OXCGRT_LATEST or the reference sample path), the loader
is exercised against it too.
"""

import os

import pandas as pd
import pytest

from epidemicmodeling_tpu.data import (synthetic_oxford_frame,
                                       to_oxcgrt_latest_schema)
from epidemicmodeling_tpu.data.oxford import (OXCGRT_LATEST_COLUMNS,
                                              load_oxford_data)
from epidemicmodeling_tpu.data.preprocess import OXFORD_NPI_COLUMNS


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("oxcgrt")
    df, pops, truth = synthetic_oxford_frame(n_regions=3, n_days=160, seed=3)
    # state-level rows exercise RegionCode/STATE_TOTAL paths
    state = df[df["CountryName"] == "Synthland0"].copy()
    state["RegionName"] = "Eastprovince"
    df = pd.concat([df, state], ignore_index=True)
    pops = pd.concat([pops, pd.DataFrame({
        "CountryName": ["Synthland0"], "RegionName": ["Eastprovince"],
        "Code": ["SY0E"],
        "Population2020": [pops["Population2020"].iloc[0]]})],
        ignore_index=True)
    full = to_oxcgrt_latest_schema(df, seed=1)
    (tmp / "minimal.csv").write_text(df.to_csv(index=False))
    (tmp / "latest.csv").write_text(full.to_csv(index=False))
    pops.to_csv(tmp / "populations.csv", index=False)
    pops[["CountryName", "RegionName"]].to_csv(tmp / "geos.csv", index=False)
    return tmp


def test_full_schema_column_inventory():
    df, _, _ = synthetic_oxford_frame(n_regions=1, n_days=10, seed=0)
    full = to_oxcgrt_latest_schema(df)
    assert list(full.columns) == OXCGRT_LATEST_COLUMNS
    for c in OXFORD_NPI_COLUMNS:
        assert c in full.columns
    assert set(full["Jurisdiction"]) <= {"NAT_TOTAL", "STATE_TOTAL"}


def test_loader_identical_on_live_and_minimal_schema(frames):
    kw = dict(npi_columns=None, start_date="2020-03-01",
              end_date="2020-08-01")
    lite = load_oxford_data(frames / "minimal.csv", **kw)
    full = load_oxford_data(frames / "latest.csv", **kw)
    assert list(lite.columns) == list(full.columns)
    pd.testing.assert_frame_equal(
        lite.reset_index(drop=True), full.reset_index(drop=True))
    # region-level GeoID present alongside the country-level one
    assert "Synthland0 Eastprovince" in set(full["GeoID"])
    assert "Synthland0 " in set(full["GeoID"])


REAL = os.environ.get(
    "OXCGRT_LATEST", "/root/reference/xprize-sample-data/OxCGRT_latest.csv")


@pytest.mark.skipif(not os.path.exists(REAL),
                    reason="real OxCGRT_latest.csv not mounted")
def test_loader_on_real_oxcgrt_download():
    df = load_oxford_data(REAL, None, "2020-03-01", "2020-08-01")
    assert df["GeoID"].nunique() > 100
    assert df["ConfirmedCases"].notna().any()
