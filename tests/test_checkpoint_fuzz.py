"""Checkpoint/IO fuzz: randomized trained-parameter tables and XPRIZE CSV
schedules round-tripped through every persistence format, graded against
independently-derived expectations.

Reference behaviors mirrored: the TrainedModelParams cell table
(Tools/TrainPredictPrescribeNPI.m:910-913, loaded by
testScripts/testPrescribeXPRIZE01.m:62), the XPRIZE predictions /
prescriptions CSV schemas, and the future-intervention-plan reader's
forward-fill/zero-prefill/absent-geo rules.
"""

import json
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from epidemicmodeling_tpu.pipelines.checkpoint import (
    save_trained_params, load_trained_params,
    save_trained_params_mat, load_trained_params_mat,
    save_trained_params_orbax, load_trained_params_orbax)
from epidemicmodeling_tpu.pipelines.core import TrainedRegionParams
from epidemicmodeling_tpu.data.preprocess import OXFORD_NPI_COLUMNS
from epidemicmodeling_tpu.data.xprize_io import (
    write_predictions_csv, write_prescriptions_csv, read_future_ip)
from epidemicmodeling_tpu.utils.dates import date_range_days


def _random_trained(rng, R=None, P=12):
    """Random trained table with schema-conformant GeoIDs: country-level
    regions carry the trailing-space convention; values span extreme
    magnitudes (the .mat path must preserve float64 verbatim)."""
    R = R or int(rng.integers(1, 8))
    names = []
    for r in range(R):
        country = "C" + "".join(rng.choice(list("abcdefgh"),
                                           rng.integers(2, 8)))
        if rng.random() < 0.4:
            names.append(country + " ")                    # country-level
        elif rng.random() < 0.5:
            names.append(country + " R" + str(rng.integers(0, 99)))
        else:                                              # multi-word
            names.append("New " + country + " Region " + str(r))
    mag = rng.choice([1e-30, 1e-8, 1.0, 1e8, 1e30], size=4)
    return TrainedRegionParams(
        names=tuple(names),
        population=rng.uniform(1e3, 1e9, R),
        a1=rng.normal(scale=mag[0], size=(R, P)),
        b1=rng.normal(scale=mag[1], size=R),
        a2=rng.normal(scale=mag[2], size=(R, P)),
        b2=rng.normal(scale=mag[3], size=R))


def _assert_trained_equal(got, ref, exact=True):
    assert tuple(got.names) == tuple(ref.names)
    for f in ("population", "a1", "b1", "a2", "b2"):
        a, b = np.asarray(getattr(got, f)), np.asarray(getattr(ref, f))
        if exact:
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-15, err_msg=f)


@pytest.mark.parametrize("seed", range(6))
def test_checkpoint_roundtrip_fuzz(seed):
    """Every persistence format must round-trip random trained tables
    bit-exactly: .npz (the portable default), the reference's .mat cell
    schema (both directions), and the orbax pytree checkpoint."""
    rng = np.random.default_rng(10700 + seed)
    trained = _random_trained(rng)
    with tempfile.TemporaryDirectory() as td:
        p = Path(td)
        save_trained_params(p / "ck", trained)
        _assert_trained_equal(load_trained_params(p / "ck"), trained)
        # extension supplied explicitly too
        save_trained_params(p / "ck2.npz", trained)
        _assert_trained_equal(load_trained_params(p / "ck2.npz"), trained)

        mat = save_trained_params_mat(p / "ck3", trained)
        got = load_trained_params_mat(mat)
        _assert_trained_equal(got, trained)

        if seed < 2:           # orbax is slow; two seeds cover the path
            d = save_trained_params_orbax(p / "orbax_ck", trained)
            _assert_trained_equal(load_trained_params_orbax(d), trained)


@pytest.mark.parametrize("seed", range(6))
def test_mat_shorter_coef_vectors(seed):
    """The .mat importer zero-pads coefficient vectors shorter than 12
    (MATLAB-side tables may carry reduced NPI sets) and truncates longer
    ones — pin that contract against a hand-built cell table."""
    import scipy.io as sio
    rng = np.random.default_rng(10800 + seed)
    k = int(rng.integers(1, 16))
    coef = rng.normal(size=k)
    tbl = np.empty((2, 7), dtype=object)
    tbl[0] = ["CountryName", "RegionName", "N_population",
              "coef0", "coef", "coef0_2", "coef_2"]
    tbl[1] = ["Xland", "", 1e6, 0.5, coef.reshape(-1, 1), 0.25,
              coef[::-1].copy().reshape(-1, 1)]
    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "t.mat")
        sio.savemat(path, {"TrainedModelParams": tbl})
        got = load_trained_params_mat(path)
    exp = np.zeros(12)
    exp[:min(12, k)] = coef[:12]
    np.testing.assert_array_equal(np.asarray(got.a1)[0], exp)
    exp2 = np.zeros(12)
    exp2[:min(12, k)] = coef[::-1][:12]
    np.testing.assert_array_equal(np.asarray(got.a2)[0], exp2)
    assert got.names == ("Xland ",)
    assert float(got.b1[0]) == 0.5 and float(got.b2[0]) == 0.25


@pytest.mark.parametrize("seed", range(6))
def test_xprize_csv_fuzz(seed):
    """The XPRIZE CSV writers vs a pandas re-read: predictions preserve
    values and geo decomposition; prescriptions preserve the rounded
    integer NPIs per (index, geo, day); and read_future_ip applies the
    documented forward-fill / zero-prefill / absent-geo rules, checked
    against an independently-computed expectation from the sparse spec."""
    rng = np.random.default_rng(10900 + seed)
    R = int(rng.integers(1, 5))
    T = int(rng.integers(3, 15))
    P = len(OXFORD_NPI_COLUMNS)
    geo_ids = []
    for r in range(R):
        c = "C" + str(rng.integers(100, 999))
        geo_ids.append(c + " " if rng.random() < 0.5
                       else c + " R" + str(r))
    start = "2020-08-01"
    dates = date_range_days(start, T)

    with tempfile.TemporaryDirectory() as td:
        p = Path(td)
        pred = rng.exponential(100.0, (R, T))
        write_predictions_csv(p / "pred.csv", geo_ids, start, pred)
        df = pd.read_csv(p / "pred.csv",
                         keep_default_na=False, dtype={"RegionName": str})
        assert len(df) == R * T
        for r, gid in enumerate(geo_ids):
            country, _, region = gid.rpartition(" ")
            sub = df[(df["CountryName"] == country)
                     & (df["RegionName"] == region)]
            assert len(sub) == T, gid
            np.testing.assert_allclose(
                sub.sort_values("Date")["PredictedDailyNewCases"].to_numpy(),
                pred[r], rtol=1e-12)

        n_idx = int(rng.integers(1, 4))
        u = rng.integers(0, 5, (n_idx, R, T, P)).astype(float)
        write_prescriptions_csv(p / "presc.csv", geo_ids, start, u)
        dfp = pd.read_csv(p / "presc.csv",
                          keep_default_na=False, dtype={"RegionName": str})
        assert len(dfp) == n_idx * R * T
        for idx in range(n_idx):
            for r, gid in enumerate(geo_ids):
                country, _, region = gid.rpartition(" ")
                sub = dfp[(dfp["PrescriptionIndex"] == idx)
                          & (dfp["CountryName"] == country)
                          & (dfp["RegionName"] == region)
                          ].sort_values("Date")
                got = sub[OXFORD_NPI_COLUMNS].to_numpy(float)
                np.testing.assert_array_equal(got, u[idx, r])

        # future_ip: sparse random schedule; last geo absent from the file
        spec = {}          # (r, t) -> (P,) values
        rows = []
        for r, gid in enumerate(geo_ids[:-1] if R > 1 else geo_ids):
            country, _, region = gid.rpartition(" ")
            n_entries = int(rng.integers(0, T + 1))
            for t in sorted(rng.choice(T, n_entries, replace=False)):
                vals = rng.integers(0, 5, P).astype(float)
                spec[(r, int(t))] = vals
                row = {"CountryName": country, "RegionName": region,
                       "Date": dates[int(t)]}
                row.update({c: v for c, v in zip(OXFORD_NPI_COLUMNS, vals)})
                rows.append(row)
        if not rows:       # reader needs the schema columns to exist
            rows.append({"CountryName": "Nowhere", "RegionName": "",
                         "Date": dates[0],
                         **{c: 0.0 for c in OXFORD_NPI_COLUMNS}})
        pd.DataFrame(rows).to_csv(p / "future_ip.csv", index=False)
        got_ip = read_future_ip(p / "future_ip.csv", geo_ids, start,
                                dates[-1])
        assert got_ip.shape == (R, T, P)
        for r in range(R):
            filled = np.zeros(P)
            for t in range(T):
                if (r, t) in spec:
                    filled = spec[(r, t)]
                np.testing.assert_array_equal(
                    got_ip[r, t], filled, err_msg=f"geo {r} day {t}")
