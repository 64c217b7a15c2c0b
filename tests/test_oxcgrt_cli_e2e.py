"""Full CLI run on the live OxCGRT_latest.csv schema.

Split from test_oxcgrt_latest_schema.py: this is the expensive end-to-end
leg (full pipeline compile), isolated in its own file so per-file runners
and xdist loadfile scheduling get balanced buckets. The pipeline is driven
in-process via xprize_cli.main (sharing this process's XLA compile cache)
rather than a fresh subprocess — loader equivalence between the live and
minimal schemas is already pinned frame-equal in
test_oxcgrt_latest_schema.py, and `python -m` module entry is covered by
the cheap --help subprocess test below.

Reference driver: Tools/TrainPredictPrescribeNPI.m:73-89 (reads the real
OxCGRT download by column name), testScripts/testPrescribeXPRIZE02.m.
"""

import os
import subprocess
import sys

import pandas as pd
import pytest

from epidemicmodeling_tpu.data import (synthetic_oxford_frame,
                                       to_oxcgrt_latest_schema)


@pytest.fixture(scope="module")
def latest_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("oxcgrt_cli")
    df, pops, _ = synthetic_oxford_frame(n_regions=3, n_days=160, seed=3)
    state = df[df["CountryName"] == "Synthland0"].copy()
    state["RegionName"] = "Eastprovince"
    df = pd.concat([df, state], ignore_index=True)
    pops = pd.concat([pops, pd.DataFrame({
        "CountryName": ["Synthland0"], "RegionName": ["Eastprovince"],
        "Code": ["SY0E"],
        "Population2020": [pops["Population2020"].iloc[0]]})],
        ignore_index=True)
    full = to_oxcgrt_latest_schema(df, seed=1)
    (tmp / "latest.csv").write_text(full.to_csv(index=False))
    pops.to_csv(tmp / "populations.csv", index=False)
    pops[["CountryName", "RegionName"]].to_csv(tmp / "geos.csv", index=False)
    return tmp


def test_cli_runs_unmodified_on_live_schema(latest_files, tmp_path):
    from epidemicmodeling_tpu.pipelines.xprize_cli import main
    out = tmp_path / "prescriptions.csv"
    rc = main([
        "--data", str(latest_files / "latest.csv"),
        "--geos", str(latest_files / "geos.csv"),
        "--populations", str(latest_files / "populations.csv"),
        "--start-train", "2020-03-01", "--end-train", "2020-06-29",
        "--end-predict", "2020-07-29",
        "--num-epsilon", "6", "--num-prescriptions", "3",
        "--backend", "lanes", "--pareto-chunk", "6",
        "--prescriptions-out", str(out)])
    assert rc == 0
    df = pd.read_csv(out)
    assert {"PrescriptionIndex", "CountryName", "RegionName",
            "Date"}.issubset(df.columns)
    assert df["PrescriptionIndex"].nunique() == 3
    # all four geo ids prescribed (3 countries + 1 state-level region)
    assert df[["CountryName", "RegionName"]].drop_duplicates().shape[0] == 4


def test_cli_module_entry():
    """`python -m epidemicmodeling_tpu.pipelines.xprize_cli` is runnable
    (the cheap subprocess leg retained from the old full-pipeline test)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         env.get("PYTHONPATH", "")])
    res = subprocess.run(
        [sys.executable, "-m", "epidemicmodeling_tpu.pipelines.xprize_cli",
         "--help"], capture_output=True, text=True, env=env, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "--num-epsilon" in res.stdout
