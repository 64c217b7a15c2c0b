"""The flagship end-to-end pipeline: train -> predict -> prescribe.

TPU-native rebuild of Tools/TrainPredictPrescribeNPI.m (the XPRIZE product
entry point, see SURVEY.md §3.1): per-region data cleaning feeds a fully
batched two-round EKF+regression trainer, forecast scenarios, a vmapped
Pareto epsilon sweep of the 6-state optimal-control EKS, and a Monte-Carlo
random-policy baseline — no Python loop over regions anywhere.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..data.preprocess import (preprocess_region, build_region_batch,
                               OXFORD_NPI_COLUMNS)
from ..data.oxford import load_oxford_data, load_populations, load_geo_list
from ..control import pareto_front_mask_batched
from .config import PipelineConfig
from .core import (train_regions, forecast_scenarios, pareto_prescribe,
                   monte_carlo_baseline, TrainedRegionParams)


class TrainPredictPrescribeResult(NamedTuple):
    """Everything the flagship pipeline produces for a region batch — the
    rebuild of TrainPredictPrescribeNPI.m's saved results + figures inputs."""
    trained: TrainedRegionParams
    scenarios: dict                # fixed/zero/max(/actual) ScenarioResult
    pareto: dict                   # J0/J1 (E,R), trajectories, prescriptions
    monte_carlo: dict              # J0/J1 (N,R)
    pareto_front: np.ndarray       # (E, R) bool front membership per region
    s_hist: jnp.ndarray            # (R, T_hist, 3) smoothed historic states
    batch_train: object
    batch_full: object


def build_batches_from_frames(df, pops_df, geo_ids, start_train, end_train,
                              end_predict, npi_columns=None,
                              cfg: PipelineConfig = PipelineConfig()):
    """Slice the OxCGRT frame into training and full-horizon RegionBatches.

    Mirrors the driver-side data extraction of
    Tools/TrainPredictPrescribeNPI.m:93-197: regions are keyed by
    "Country Region", cropped to [start_train, end_train] for training, and
    the forecast horizon to end_predict is appended as NaN observations.
    Returns (batch_train, batch_full, actual_npis, T_hist, horizon).
    """
    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    required = ["GeoID", "DateNum", "ConfirmedCases", "ConfirmedDeaths"] \
        + npi_columns
    missing_cols = [c for c in required if c not in df.columns]
    if missing_cols:
        raise ValueError(
            f"data frame is missing required columns {missing_cols} — "
            "expected an OxCGRT-schema frame (load_oxford_data adds "
            "GeoID/DateNum); check npi_columns spelling against the file "
            "header")
    d0 = int(str(start_train).replace("-", ""))
    d1 = int(str(end_train).replace("-", ""))
    d2 = int(str(end_predict).replace("-", ""))
    from ..utils.dates import num_days_between
    horizon = num_days_between(str(end_train), str(end_predict))

    series, names, actual_list = [], [], []
    for gid in geo_ids:
        sub = df[(df["GeoID"] == gid) & (df["DateNum"] >= d0)
                 & (df["DateNum"] <= d2)]
        # the reference's frames arrive date-sorted, unique and daily-
        # contiguous per region (one OxCGRT row per day); hostile frames
        # may not — sort here and refuse duplicates/gaps rather than
        # silently mis-ordering or calendar-shifting the series (rows are
        # consumed positionally as consecutive days, while the horizon
        # stays calendar-based)
        sub = sub.sort_values("DateNum", kind="stable")
        dup = sub["DateNum"].duplicated()
        if bool(dup.any()):
            first = int(sub["DateNum"][dup].iloc[0])
            raise ValueError(
                f"region {gid!r} has duplicate rows for date {first} — "
                "each (GeoID, Date) must be unique; deduplicate the data "
                "file before training")
        if len(sub) > 1:
            import pandas as pd
            dts = pd.to_datetime(sub["DateNum"].astype(str),
                                 format="%Y%m%d").to_numpy()
            dd = np.diff(dts) // np.timedelta64(1, "D")
            bad = np.nonzero(dd != 1)[0]
            if bad.size:
                i = int(bad[0])
                raise ValueError(
                    f"region {gid!r} has a {int(dd[i])}-day calendar gap "
                    f"after {int(sub['DateNum'].iloc[i])} inside "
                    f"[{start_train}, {end_predict}] — rows are consumed "
                    "as consecutive days, so a gap silently shifts every "
                    "later date; fill or re-export the data file")
        tr = sub[sub["DateNum"] <= d1]
        if len(tr) < 2:
            import warnings
            warnings.warn(f"skipping region {gid!r}: insufficient training "
                          f"data ({len(tr)} rows)")   # reference :103-106
            continue
        if gid not in pops_df.index:
            import warnings
            warnings.warn(f"skipping region {gid!r}: no population entry")
            continue
        pop = float(np.atleast_1d(pops_df.loc[gid, "Population2020"])[0])
        s = preprocess_region(tr["ConfirmedCases"].to_numpy(float),
                              tr["ConfirmedDeaths"].to_numpy(float),
                              tr[npi_columns].to_numpy(float), pop,
                              smoothing_win=cfg.smoothing_win,
                              obs_noise_factor=cfg.obs_noise_factor)
        series.append(s)
        names.append(gid)
        ent = sub[sub["DateNum"] <= d2]
        from ..data.preprocess import forward_fill_npis
        actual_list.append(forward_fill_npis(
            ent[npi_columns].to_numpy(float)))
    if not series:
        raise ValueError(
            "no region in the geo list has usable training data in "
            f"[{start_train}, {end_train}]" + (
                " (every one was skipped — see the warnings above for "
                "per-region reasons: too few rows, or missing from the "
                "populations file)" if geo_ids else
                " (the geo list is empty)"))
    T_hist = max(s.npis.shape[0] for s in series)
    batch_train = build_region_batch(series, names,
                                    obs_type=cfg.observation_type)
    batch_full = build_region_batch(series, names,
                                    obs_type=cfg.observation_type,
                                    horizon=horizon)
    T_full = T_hist + horizon
    P = len(npi_columns)
    actual = np.zeros((len(series), T_full, P))
    for r, u in enumerate(actual_list):
        L = min(len(u), T_full)
        actual[r, :L] = u[:L]
        if L < T_full and L:
            actual[r, L:] = u[L - 1]
    return batch_train, batch_full, actual, T_hist, horizon


def train_predict_prescribe(
    npi_weights,
    epsilon_values,
    start_train_date: str,
    end_train_date: str,
    start_regression_date: str,
    end_predict_date: str,
    data_file,
    geo_file,
    populations_file,
    npi_columns=None,
    npi_mins=None,
    npi_maxes=None,
    trained_params_file: Optional[str] = None,
    cfg: PipelineConfig = PipelineConfig(),
    key=None,
    dtype=None,
    trained=None,
    mesh=None,
) -> TrainPredictPrescribeResult:
    """Drop-in equivalent of Tools/TrainPredictPrescribeNPI.m:1 with the same
    argument intent (dates, files, NPI config, epsilon sweep, weights).

    mesh: optional jax.sharding.Mesh with ("dp", "ep") axes
    (parallel.make_mesh): region INPUTS are replicated (see
    parallel.mesh.shard_region_batch for why — bit-parity of the NNLS
    support selection, multi-host readability), the Pareto ensemble axis
    is sharded over ep (its propagation partitions the big (E, R) lane
    work; the pallas backend shard_maps the lane axis over the whole
    mesh), and every stage runs SPMD with no collectives in the hot scans
    (the reference is serial; SURVEY.md §2.10 maps its loop nest onto
    exactly these axes)."""
    from ..utils.dates import num_days_between
    npi_columns = list(npi_columns or OXFORD_NPI_COLUMNS)
    P = len(npi_columns)
    npi_mins = np.zeros(P) if npi_mins is None else np.asarray(npi_mins, float)
    if npi_maxes is None:
        raise ValueError("npi_maxes is required (Oxford codebook maxima)")
    npi_maxes = np.asarray(npi_maxes, float)
    for nm, arr, want in (("npi_maxes", npi_maxes, P),
                          ("npi_mins", npi_mins, P)):
        if arr.shape != (want,):
            raise ValueError(
                f"{nm} has shape {arr.shape}, expected ({want},) — one "
                f"entry per NPI column ({P} columns configured)")
    npi_weights = np.asarray(npi_weights, float)
    if npi_weights.ndim == 1 and npi_weights.shape != (P,):
        raise ValueError(
            f"npi_weights has shape {npi_weights.shape}, expected ({P},) "
            f"shared weights or (R, {P}) per-region weights")
    if len(np.atleast_1d(epsilon_values)) == 0:
        raise ValueError("epsilon_values is empty — pass at least one "
                         "tradeoff point (control.epsilon_grid(n) builds "
                         "the reference's log+linear grid)")
    if not (num_days_between(start_train_date, end_train_date) >= 0
            and num_days_between(end_train_date, end_predict_date) >= 0):
        raise ValueError("Invalid input times order.")
    num_regression_days = num_days_between(start_regression_date,
                                           end_train_date)

    df = load_oxford_data(data_file, npi_columns, start_train_date,
                          end_predict_date)
    pops = load_populations(populations_file)
    requested = load_geo_list(geo_file)
    geo_ids = [g for g in requested if g in set(df["GeoID"])]
    if requested and not geo_ids:
        raise ValueError(
            f"none of the {len(requested)} regions in {geo_file!r} appear "
            f"in {data_file!r} (first requested: {requested[0]!r}) — wrong "
            "data file, or CountryName/RegionName spelling mismatch")

    batch_train, batch_full, actual_npis, T_hist, horizon = \
        build_batches_from_frames(df, pops, geo_ids, start_train_date,
                                  end_train_date, end_predict_date,
                                  npi_columns, cfg)

    result = run_pipeline(batch_train, batch_full, actual_npis, T_hist,
                          npi_weights, epsilon_values, npi_mins, npi_maxes,
                          num_regression_days, cfg, key, dtype,
                          trained=trained, mesh=mesh)
    if trained_params_file:
        if str(trained_params_file).endswith(".mat"):
            from .checkpoint import save_trained_params_mat
            save_trained_params_mat(trained_params_file, result.trained)
        else:
            from .checkpoint import save_trained_params
            save_trained_params(trained_params_file, result.trained)
    return result


def run_pipeline(batch_train, batch_full, actual_npis, T_hist, npi_weights,
                 epsilon_values, npi_mins, npi_maxes, num_regression_days,
                 cfg: PipelineConfig = PipelineConfig(), key=None,
                 dtype=None, trained=None,
                 mesh=None) -> TrainPredictPrescribeResult:
    """Run the batched compute pipeline on prepared RegionBatches.

    trained: optional pre-trained TrainedRegionParams (the
    testScripts/testPrescribeXPRIZE01.m flow: prescribe from a saved
    checkpoint without retraining). Rows are re-aligned to the batch's
    region order by name; regions absent from the checkpoint raise.

    mesh: optional ("dp", "ep") device mesh — replicates the region
    inputs (parallel.mesh.shard_region_batch) and shards the epsilon
    sweep's lane work over ep (see train_predict_prescribe)."""
    import contextlib
    if mesh is not None:
        from ..parallel.mesh import shard_region_batch, validate_pareto_chunk
        R = len(batch_train.names)
        if R % mesh.shape["dp"]:
            raise ValueError(
                f"{R} regions not divisible by mesh dp={mesh.shape['dp']}; "
                "pad the geo list or pick a different mesh")
        # the sweep pads epsilon to whole chunks of exactly cfg.pareto_chunk,
        # and each chunk's epsilon axis is sharded over 'ep'
        validate_pareto_chunk(cfg.pareto_chunk, mesh)
        batch_train = shard_region_batch(mesh, batch_train)
        batch_full = shard_region_batch(mesh, batch_full)
        if actual_npis is not None:
            # replicated like the batch fields (see shard_region_batch:
            # bit-parity + multi-host host-readability)
            from jax.sharding import PartitionSpec as _PS
            from ..parallel.mesh import put_global
            actual_npis = put_global(np.asarray(actual_npis), mesh, _PS())
        ctx = mesh
    else:
        # single-device: pre-upload the hot batch fields ONCE in the
        # compute dtype so the four stages reuse the resident arrays
        # instead of re-casting + re-uploading per stage (see
        # core.device_batch)
        from .core import device_batch
        batch_train = device_batch(batch_train, dtype)
        batch_full = device_batch(batch_full, dtype)
        ctx = contextlib.nullcontext()
    with ctx:
        return _run_pipeline_body(
            batch_train, batch_full, actual_npis, T_hist, npi_weights,
            epsilon_values, npi_mins, npi_maxes, num_regression_days,
            cfg, key, dtype, trained, mesh)


def _run_pipeline_body(batch_train, batch_full, actual_npis, T_hist,
                       npi_weights, epsilon_values, npi_mins, npi_maxes,
                       num_regression_days, cfg, key, dtype, trained, mesh):
    if trained is None:
        train_out = train_regions(batch_train, npi_mins, npi_maxes,
                                  num_regression_days, cfg, dtype,
                                  mesh=mesh)
    else:
        from .core import region_init, TrainOutputs, TrainedRegionParams
        idx = {n: i for i, n in enumerate(trained.names)}
        missing = [n for n in batch_train.names if n not in idx]
        if missing:
            raise ValueError(
                f"checkpoint is missing trained parameters for {missing}")
        order = np.asarray([idx[n] for n in batch_train.names])
        trained = TrainedRegionParams(
            names=tuple(batch_train.names),
            population=np.asarray(trained.population)[order],
            a1=np.asarray(trained.a1)[order], b1=np.asarray(trained.b1)[order],
            a2=np.asarray(trained.a2)[order], b2=np.asarray(trained.b2)[order])
        train_out = TrainOutputs(trained, region_init(batch_train, cfg),
                                 None, None, None, None)
    scen, s_hist = forecast_scenarios(
        batch_full, train_out.trained, train_out.init, npi_weights,
        npi_mins, npi_maxes, T_hist, cfg,
        actual_npis=actual_npis, key=key, dtype=dtype, mesh=mesh)
    par = pareto_prescribe(
        batch_full, train_out.trained, train_out.init, s_hist,
        epsilon_values, npi_weights, npi_mins, npi_maxes, T_hist, cfg,
        key=key, dtype=dtype, mesh=mesh)
    mc = monte_carlo_baseline(
        batch_full, train_out.trained, train_out.init, s_hist, npi_weights,
        npi_mins, npi_maxes, T_hist, cfg, key=key, dtype=dtype)
    # per-region Pareto-front membership (TrainPredictPrescribeNPI.m:624-628)
    front = np.asarray(pareto_front_mask_batched(par["J0"], par["J1"]))
    return TrainPredictPrescribeResult(
        trained=train_out.trained, scenarios=scen, pareto=par,
        monte_carlo=mc, pareto_front=front, s_hist=s_hist,
        batch_train=batch_train, batch_full=batch_full)
