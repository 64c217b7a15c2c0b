"""XPRIZE prediction/prescription CSV output writers.

Reference behavior: the XPRIZE output schemas shipped in
xprize-sample-data/2020-08-01_2020-08-04_predictions_example.csv
(CountryName, RegionName, Date, PredictedDailyNewCases, IsSpecialty) and
..._prescriptions_example.csv (PrescriptionIndex, CountryName, RegionName,
Date, <12 NPI columns>).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from .preprocess import OXFORD_NPI_COLUMNS
from ..utils.dates import date_range_days


def _split_geo(geo_id: str):
    """'Country Region' (trailing space for country-level) -> fields."""
    country, _, region = str(geo_id).rpartition(" ")
    if not country:
        country, region = region, ""
    return country, region


def write_predictions_csv(path, geo_ids: Sequence[str], start_date: str,
                          predicted_daily_new_cases, is_specialty=False):
    """predicted_daily_new_cases: (R, T). Writes the XPRIZE schema."""
    pred = np.asarray(predicted_daily_new_cases)
    R, T = pred.shape
    dates = date_range_days(start_date, T)
    rows = []
    for r, gid in enumerate(geo_ids):
        country, region = _split_geo(gid)
        for t, d in enumerate(dates):
            rows.append({"CountryName": country, "RegionName": region,
                         "Date": d,
                         "PredictedDailyNewCases": float(pred[r, t]),
                         "IsSpecialty": int(bool(is_specialty))})
    pd.DataFrame(rows).to_csv(path, index=False)
    return path


def write_prescriptions_csv(path, geo_ids: Sequence[str], start_date: str,
                            prescriptions, npi_columns=None):
    """prescriptions: (n_idx, R, T, P) — one block per PrescriptionIndex
    (e.g. selected Pareto-front points). Writes the XPRIZE schema."""
    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    u = np.asarray(prescriptions)
    n_idx, R, T, P = u.shape
    dates = date_range_days(start_date, T)
    rows = []
    for idx in range(n_idx):
        for r, gid in enumerate(geo_ids):
            country, region = _split_geo(gid)
            for t, d in enumerate(dates):
                row = {"PrescriptionIndex": idx, "CountryName": country,
                       "RegionName": region, "Date": d}
                for j, c in enumerate(npi_columns[:P]):
                    row[c] = int(round(float(u[idx, r, t, j])))
                rows.append(row)
    pd.DataFrame(rows).to_csv(path, index=False)
    return path

def read_future_ip(path, geo_ids: Sequence[str], start_date: str,
                   end_date: str, npi_columns=None) -> np.ndarray:
    """Read a future-intervention-plan CSV (the XPRIZE `future_ip.csv`
    schema: CountryName, RegionName, Date, one column per NPI) into an
    (R, T, P) schedule aligned to geo_ids over [start_date, end_date]
    inclusive. Missing days are forward-filled (then zero before the first
    entry); geos absent from the file get all-zero schedules — matching the
    reference drivers' treatment of unspecified interventions."""
    import pandas as pd
    from .preprocess import OXFORD_NPI_COLUMNS
    from ..utils.dates import date_range_days, num_days_between

    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    P = len(npi_columns)
    dates = date_range_days(start_date, num_days_between(start_date,
                                                         end_date) + 1)
    T = len(dates)
    date_idx = {d: t for t, d in enumerate(dates)}

    df = pd.read_csv(path, dtype={"CountryName": str, "RegionName": str})
    region = df["RegionName"].fillna("")
    df = df.assign(GeoID=df["CountryName"].astype(str) + " "
                   + region.astype(str),
                   DateISO=pd.to_datetime(df["Date"]).dt.strftime("%Y-%m-%d"))

    out = np.zeros((len(geo_ids), T, P))
    for r, gid in enumerate(geo_ids):
        sub = df[df["GeoID"] == gid]
        if not len(sub):
            continue
        sched = np.full((T, P), np.nan)
        for _, row in sub.iterrows():
            t = date_idx.get(row["DateISO"])
            if t is not None:
                sched[t] = [float(row[c]) for c in npi_columns]
        # forward-fill, zero before the first entry
        filled = np.zeros(P)
        for t in range(T):
            mask = np.isnan(sched[t])
            sched[t] = np.where(mask, filled, sched[t])
            filled = sched[t]
        out[r] = sched
    return out
