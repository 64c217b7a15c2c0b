"""JHU CSSE time-series loader.

Reference behavior: Tools/ReadCOVID19Data.m — reads the three JHU CSSE
global CSVs (confirmed / deaths / recovered), sums rows whose country field
contains each requested region name, and returns per-region matrices
(TotalCases, Infected = cases - deaths - recovered, Recovered, Deceased)
plus the first-case and min-case date indices.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def read_covid19_data(confirmed_csv, deaths_csv, recovered_csv,
                      region_list: Sequence[str], min_cases: float = 1.0):
    """Returns dict with TotalCases, Infected, Recovered, Deceased
    ((R, NumDays) arrays), FirstCaseDateIndex, MinCaseDateIndex, NumDays,
    and the date column labels."""
    conf = pd.read_csv(confirmed_csv)
    dead = pd.read_csv(deaths_csv)
    reco = pd.read_csv(recovered_csv)

    # JHU schema: Province/State, Country/Region, Lat, Long, <dates...>
    date_cols = conf.columns[4:]
    R = len(region_list)
    T = len(date_cols)
    total = np.zeros((R, T))
    infected = np.zeros((R, T))
    recovered = np.zeros((R, T))
    deceased = np.zeros((R, T))
    first_idx = np.zeros(R, np.int64)
    min_idx = np.zeros(R, np.int64)

    def sum_region(df, name):
        rows = df[df["Country/Region"].astype(str).str.contains(
            name, regex=False)]
        return rows[df.columns[4:]].to_numpy(float).sum(axis=0)

    for k, name in enumerate(region_list):
        cases = sum_region(conf, name)
        deaths = sum_region(dead, name)
        recov = sum_region(reco, name)
        total[k] = cases
        deceased[k] = deaths
        recovered[k] = recov
        infected[k] = cases - deaths - recov
        pos = np.flatnonzero(cases > 0)
        first_idx[k] = pos[0] if pos.size else 0
        posm = np.flatnonzero(cases >= min_cases)
        min_idx[k] = posm[0] if posm.size else 0

    return dict(TotalCases=total, Infected=infected, Recovered=recovered,
                Deceased=deceased, FirstCaseDateIndex=first_idx,
                MinCaseDateIndex=min_idx, NumDays=T,
                dates=list(date_cols))
