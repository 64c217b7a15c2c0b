"""Synthetic OxCGRT-schema data generator for tests and benchmarks.

Generates a multi-region epidemic dataset by rolling the SI-alpha model with
region-specific parameters and NPI schedules, then assembling an OxCGRT-shaped
DataFrame — the framework's equivalent of the reference's
sim-then-re-estimate round-trip fixtures (testPrescribeXPRIZE01.m:100-119).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .preprocess import OXFORD_NPI_COLUMNS, NPI_MAXES_DEFAULT


def _numpy_si_alpha_rollout(u, s0, i0, alpha0, u_max, alpha_min, alpha_max,
                            gamma, a, b, beta, K, dt):
    """Noise-free SI-alpha Euler rollout (Tools/SIalpha_Controlled.m
    semantics), initial condition excluded from outputs."""
    s = np.empty(K + 1); i = np.empty(K + 1); al = np.empty(K + 1)
    s[0], i[0], al[0] = s0, i0, alpha0
    for t in range(K):
        s[t + 1] = min(1.0, max(0.0, s[t] - dt * al[t] * s[t] * i[t]))
        i[t + 1] = min(1.0, max(0.0, i[t] + dt * (al[t] * s[t] * i[t]
                                                  - beta * i[t])))
        al[t + 1] = min(alpha_max, max(alpha_min, al[t] + dt * (
            -gamma * al[t] + gamma * b + gamma * a @ (u_max - u[t]))))
    return s[1:], i[1:], al[1:]


def synthetic_oxford_frame(n_regions: int = 4, n_days: int = 240,
                           start_date: str = "2020-03-01", seed: int = 0,
                           npi_maxes=NPI_MAXES_DEFAULT, beta=None):
    """Returns (df, truth) where df mimics the OxCGRT schema and truth holds
    the per-region generating parameters for round-trip assertions."""

    rng = np.random.default_rng(seed)
    P = len(npi_maxes)
    dates = pd.date_range(start_date, periods=n_days, freq="D")
    rows = []
    truth = {}
    for r in range(n_regions):
        pop = float(rng.integers(1_000_000, 80_000_000))
        # keep the equilibrium contact rate b + a.(umax-u) near beta so the
        # epidemic persists (alpha stays observable) and NPIs matter.
        # Default beta matches the pipeline's assumed recovery rate
        # (-ln(0.01)/21, PipelineConfig.beta_model) so sim->estimate round
        # trips are well-specified.
        beta_r = beta if beta is not None else 0.21925347571405505
        a_true = 0.008 * rng.random(P)
        b_true = beta_r * (0.75 + 0.2 * rng.random())
        # piecewise-constant NPI schedule: levels change every ~30 days
        n_seg = -(-n_days // 30)  # ceil: cover all days
        seg_levels = rng.integers(0, np.asarray(npi_maxes, int) + 1,
                                  size=(n_seg, P))
        u = np.repeat(seg_levels, 30, axis=0)[:n_days].astype(float)
        alpha0 = beta_r + np.log(2.2)  # outbreak initial contact rate
        i0 = 50.0 / pop
        s, i, al = _numpy_si_alpha_rollout(
            u, 1.0 - i0, i0, alpha0, np.asarray(npi_maxes, float),
            1e-8, 100.0, 1.0 / 7.0, a_true, b_true, beta_r, n_days, 1.0)
        new_cases = s * i * al * pop
        confirmed = np.cumsum(new_cases)
        deaths = np.cumsum(0.01 * new_cases)
        name = f"Synthland{r}"
        truth[name + " "] = dict(a=a_true, b=b_true, beta=beta_r, pop=pop,
                                 u=u, s=np.asarray(s), i=np.asarray(i),
                                 alpha=np.asarray(al))
        for t in range(n_days):
            row = {"CountryName": name, "RegionName": np.nan,
                   "Date": int(dates[t].strftime("%Y%m%d")),
                   "ConfirmedCases": confirmed[t],
                   "ConfirmedDeaths": deaths[t]}
            for j, c in enumerate(OXFORD_NPI_COLUMNS[:P]):
                row[c] = u[t, j]
            rows.append(row)
    df = pd.DataFrame(rows)
    pops = pd.DataFrame({
        "CountryName": [f"Synthland{r}" for r in range(n_regions)],
        "RegionName": [np.nan] * n_regions,
        "Code": [f"SY{r}" for r in range(n_regions)],
        "Population2020": [truth[f"Synthland{r} "]["pop"]
                           for r in range(n_regions)],
    })
    return df, pops, truth


def realistic_oxford_frame(n_regions: int = 4, n_days: int = 240,
                           start_date: str = "2020-03-01", seed: int = 0,
                           npi_maxes=NPI_MAXES_DEFAULT, beta=None):
    """"Real-artifact" mode: compose the pathologies of real OxCGRT/JHU case
    histories JOINTLY on top of the clean synthetic epidemic, so the fixture
    exercises every rule of the cleaning layer at once rather than
    one-at-a-time (the rules: new-case diff + negative clipping
    TrainPredictPrescribeNPI.m:156-159, trailing-NaN backfill + NaN
    zero-fill :160-170, NPI forward-fill then zero-fill :121-128,
    short-history skip :103-106):

    - weekend under-reporting dips with a Monday catch-up spike (weekly
      totals conserved — the dominant artifact of real case counts)
    - multi-day reporting gaps: the cumulative count freezes, then the
      missed cases dump in one catch-up day
    - negative revisions: the cumulative count DROPS on correction days
      (negative daily diff, clipped by :159)
    - NaN holes mid-series and a trailing NaN (today's not-yet-reported
      value, backfilled by :160-165)
    - a late-starting region: leading NaN run before reporting begins
    - NaN runs and leading NaNs in the NPI columns (forward-fill :121-128)

    Returns (df, pops, truth) like synthetic_oxford_frame; truth additionally
    records the clean pre-corruption series under "confirmed_clean".
    """
    df, pops, truth = synthetic_oxford_frame(
        n_regions=n_regions, n_days=n_days, start_date=start_date,
        seed=seed, npi_maxes=npi_maxes, beta=beta)
    rng = np.random.default_rng(seed + 1000)
    P = len(npi_maxes)
    npi_cols = OXFORD_NPI_COLUMNS[:P]
    dates = pd.date_range(start_date, periods=n_days, freq="D")
    dow = dates.dayofweek.to_numpy()          # 0=Mon .. 6=Sun

    out_blocks = []
    for r in range(n_regions):
        cname = f"Synthland{r}"
        name = cname + " "
        sub = df[df["CountryName"] == cname].sort_values("Date").copy()
        confirmed = sub["ConfirmedCases"].to_numpy(float)
        truth[name]["confirmed_clean"] = confirmed.copy()
        new_cases = np.diff(np.concatenate([[confirmed[0]], confirmed]))

        # 1) weekend dips + Monday catch-up (weekly totals conserved)
        dip = rng.uniform(0.3, 0.6)
        carried = 0.0
        nc = new_cases.copy()
        for t in range(n_days):
            if dow[t] >= 5:                        # Sat/Sun under-report
                held = nc[t] * (1.0 - dip)
                nc[t] -= held
                carried += held
            elif dow[t] == 0 and carried > 0:      # Monday catch-up
                nc[t] += carried
                carried = 0.0

        # 2) reporting gaps: cumulative freezes, then one catch-up dump
        for _ in range(3):
            g0 = int(rng.integers(20, n_days - 10))
            glen = int(rng.integers(2, 6))
            dumped = nc[g0:g0 + glen].sum()
            nc[g0:g0 + glen] = 0.0
            nc[g0 + glen] += dumped

        confirmed = np.cumsum(nc)

        # 3) negative revisions: permanent downward corrections (one
        #    negative daily diff each; clipped to 0 by the cleaning)
        for _ in range(2):
            t0 = int(rng.integers(n_days // 2, n_days - 5))
            delta = 0.05 * confirmed[t0]
            confirmed[t0:] -= delta

        # 4) NaN holes + trailing NaN (region 0 gets the trailing NaN)
        holes = rng.integers(10, n_days - 2, size=4)
        confirmed[holes] = np.nan
        if r == 0:
            confirmed[-1] = np.nan

        # 5) late-starting region: leading NaN run (region 1)
        if r == 1 and n_days > 80:
            confirmed[:40] = np.nan

        deaths = np.where(np.isnan(confirmed), np.nan, 0.01 * confirmed)

        # 6) NPI NaN runs + leading NaNs
        u = sub[npi_cols].to_numpy(float).copy()
        for j in range(P):
            if rng.random() < 0.5:
                h0 = int(rng.integers(5, n_days - 10))
                u[h0:h0 + int(rng.integers(3, 10)), j] = np.nan
        if r == 1:
            u[:15, :] = np.nan                      # pre-reporting era

        sub["ConfirmedCases"] = confirmed
        sub["ConfirmedDeaths"] = deaths
        sub[npi_cols] = u
        out_blocks.append(sub)

    return pd.concat(out_blocks, ignore_index=True), pops, truth


def to_oxcgrt_latest_schema(df: pd.DataFrame, seed: int = 0) -> pd.DataFrame:
    """Expand a minimal OxCGRT-schema frame to the FULL live
    OxCGRT_latest.csv column set (data.oxford.OXCGRT_LATEST_COLUMNS): adds
    CountryCode/RegionCode/Jurisdiction identity columns, the per-NPI
    geographic-scope Flag columns, the E/H policy columns the pipeline does
    not consume, M1_Wildcard, and the aggregate indices — so tests can prove
    the loaders/pipeline run unmodified on a real OxCGRT download
    (Tools/TrainPredictPrescribeNPI.m:73-89 reads this schema by name).
    """
    from .oxford import OXCGRT_LATEST_COLUMNS

    rng = np.random.default_rng(seed)
    out = df.copy()
    countries = out["CountryName"].astype(str)
    regions = out["RegionName"]
    is_state = regions.notna() & (regions.astype(str) != "")
    out["CountryCode"] = countries.str.upper().str.slice(0, 3)
    out["RegionCode"] = np.where(
        is_state, countries.str.upper().str.slice(0, 2) + "_" +
        regions.astype(str).str.upper().str.slice(0, 2), "")
    out["Jurisdiction"] = np.where(is_state, "STATE_TOTAL", "NAT_TOTAL")
    for col in OXCGRT_LATEST_COLUMNS:
        if col in out.columns:
            continue
        if col.endswith("_Flag"):
            out[col] = rng.integers(0, 2, len(out)).astype(float)
        elif col.endswith("ForDisplay") or col.endswith("Index"):
            out[col] = rng.uniform(0, 100, len(out)).round(2)
        elif col == "M1_Wildcard":
            out[col] = np.nan
        else:  # E/H policy indicators the pipeline ignores
            out[col] = rng.integers(0, 3, len(out)).astype(float)
    return out[OXCGRT_LATEST_COLUMNS]
