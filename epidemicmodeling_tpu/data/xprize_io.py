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
