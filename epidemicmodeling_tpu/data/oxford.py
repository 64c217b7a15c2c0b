"""OxCGRT / XPRIZE data loaders.

Reference behavior: the drivers readtable the OxCGRT CSV (CountryName,
RegionName, Date as YYYYMMDD, ConfirmedCases, ConfirmedDeaths, NPI columns)
and the populations/geo CSVs (Tools/TrainPredictPrescribeNPI.m:62-91), keying
regions by the "CountryName RegionName" string concatenation.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

from .preprocess import OXFORD_NPI_COLUMNS


# Full column set of the live OxCGRT_latest.csv download (the file every
# reference driver actually reads, e.g. Tools/TrainPredictPrescribeNPI.m:73-89
# via '../covid-policy-tracker/data/OxCGRT_latest.csv'): identity columns
# (CountryCode/RegionCode/Jurisdiction), the C/E/H policy indicators with
# their geographic-scope Flag columns, M1_Wildcard, case/death counts and the
# aggregate indices. Loaders key by name, so the extras are tolerated and
# ignored; this list exists to synthesize/validate live-schema frames.
OXCGRT_LATEST_COLUMNS = [
    "CountryName", "CountryCode", "RegionName", "RegionCode", "Jurisdiction",
    "Date",
    "C1_School closing", "C1_Flag",
    "C2_Workplace closing", "C2_Flag",
    "C3_Cancel public events", "C3_Flag",
    "C4_Restrictions on gatherings", "C4_Flag",
    "C5_Close public transport", "C5_Flag",
    "C6_Stay at home requirements", "C6_Flag",
    "C7_Restrictions on internal movement", "C7_Flag",
    "C8_International travel controls",
    "E1_Income support", "E1_Flag",
    "E2_Debt/contract relief",
    "E3_Fiscal measures",
    "E4_International support",
    "H1_Public information campaigns", "H1_Flag",
    "H2_Testing policy",
    "H3_Contact tracing",
    "H4_Emergency investment in healthcare",
    "H5_Investment in vaccines",
    "H6_Facial Coverings", "H6_Flag",
    "H7_Vaccination policy", "H7_Flag",
    "H8_Protection of elderly people", "H8_Flag",
    "M1_Wildcard",
    "ConfirmedCases", "ConfirmedDeaths",
    "StringencyIndex", "StringencyIndexForDisplay",
    "StringencyLegacyIndex", "StringencyLegacyIndexForDisplay",
    "GovernmentResponseIndex", "GovernmentResponseIndexForDisplay",
    "ContainmentHealthIndex", "ContainmentHealthIndexForDisplay",
    "EconomicSupportIndex", "EconomicSupportIndexForDisplay",
]


def _geo_id(country, region) -> pd.Series:
    """Unique region key: 'CountryName RegionName' with a trailing space for
    country-level rows, mirroring strcat(country, " ", region)."""
    region = region.fillna("") if hasattr(region, "fillna") else region
    return country.astype(str) + " " + region.astype(str)


def load_oxford_data(path, npi_columns: Optional[Sequence[str]] = None,
                     start_date: Optional[str] = None,
                     end_date: Optional[str] = None) -> pd.DataFrame:
    """Load the OxCGRT table, normalize the Date column to YYYYMMDD ints, add
    a GeoID key, and optionally crop the date range (inclusive)."""
    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    df = pd.read_csv(path, dtype={"CountryName": str, "RegionName": str},
                     low_memory=False)
    # a missing NPI or cases column would silently train on zero-filled
    # series — refuse instead (OxCGRT renamed columns across versions,
    # e.g. "H6_Facial Coverings" -> "H6M_Facial Coverings"; pass
    # npi_columns matching the file's header). RegionName/ConfirmedDeaths
    # stay lenient: country-only tables omit the former, and deaths only
    # feed the optional mortality estimate.
    hard = [c for c in ["Date", "CountryName", "ConfirmedCases"]
            + npi_columns if c not in df.columns]
    if hard:
        raise ValueError(
            f"{path!r} is missing required columns {hard} — check the NPI "
            "column names against the file header (OxCGRT releases renamed "
            "some, e.g. 'H6_Facial Coverings' vs 'H6M_Facial Coverings')")
    for c in ("RegionName", "ConfirmedDeaths"):
        if c not in df.columns:
            df[c] = np.nan
    # pd.api check, not np.issubdtype: pandas' extension dtypes (the
    # Arrow-backed StringDtype a CSV with ISO "2020-03-01" dates infers)
    # crash np.issubdtype with an opaque TypeError
    if pd.api.types.is_numeric_dtype(df["Date"]):
        date_num = df["Date"].astype(np.int64)
    else:
        date_num = pd.to_datetime(df["Date"]).dt.strftime("%Y%m%d").astype(
            np.int64)
    df = df.assign(DateNum=date_num,
                   GeoID=_geo_id(df["CountryName"], df["RegionName"]))
    if start_date:
        df = df[df["DateNum"] >= int(start_date.replace("-", ""))]
    if end_date:
        df = df[df["DateNum"] <= int(end_date.replace("-", ""))]
    needed = (["CountryName", "RegionName", "GeoID", "DateNum",
               "ConfirmedCases", "ConfirmedDeaths"] + npi_columns)
    return df[needed].sort_values(["GeoID", "DateNum"]).reset_index(drop=True)


def load_populations(path) -> pd.DataFrame:
    """populations.csv: CountryName, RegionName, Code, Population2020, ...
    Returns a frame indexed by GeoID with a Population2020 column."""
    df = pd.read_csv(path, dtype={"CountryName": str, "RegionName": str})
    df = df.assign(GeoID=_geo_id(df["CountryName"], df["RegionName"]))
    return df.set_index("GeoID")


def load_geo_list(path) -> list:
    """countries_regions.csv -> list of GeoID strings to process."""
    df = pd.read_csv(path, dtype={"CountryName": str, "RegionName": str})
    return list(_geo_id(df["CountryName"], df["RegionName"]))


def region_arrays(df: pd.DataFrame, geo_id: str,
                  npi_columns: Optional[Sequence[str]] = None):
    """Extract (confirmed, deaths, npis (T,P)) numpy arrays for one region."""
    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    sub = df[df["GeoID"] == geo_id]
    return (sub["ConfirmedCases"].to_numpy(float),
            sub["ConfirmedDeaths"].to_numpy(float),
            sub[npi_columns].to_numpy(float))

def load_npi_costs(path, geo_ids: Sequence[str],
                   npi_columns: Optional[Sequence[str]] = None) -> np.ndarray:
    """NPI cost-weight CSV (fixed_equal_costs.csv / uniform_random_costs.csv:
    CountryName, RegionName, one column per NPI) -> (R, P) weights aligned to
    geo_ids, mirroring the per-geo weight lookup of
    Tools/TrainPredictPrescribeNPI.m:109-127. Geos missing from the file get
    equal weight 1."""
    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    df = pd.read_csv(path, dtype={"CountryName": str, "RegionName": str})
    df = df.assign(GeoID=_geo_id(df["CountryName"], df["RegionName"]))
    df = df.set_index("GeoID")
    P = len(npi_columns)
    out = np.ones((len(geo_ids), P), float)
    for r, gid in enumerate(geo_ids):
        if gid in df.index:
            row = df.loc[gid]
            if isinstance(row, pd.DataFrame):
                row = row.iloc[0]
            out[r] = np.asarray([float(row[c]) for c in npi_columns])
    return out
