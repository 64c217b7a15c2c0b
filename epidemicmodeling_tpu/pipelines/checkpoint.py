"""Checkpoint / resume for trained per-region parameters.

The reference persists a MATLAB cell table {Country, Region, N_population,
reg_coef_b, reg_coef_a, reg_coef_b2, reg_coef_a2} in a .mat file
(Tools/TrainPredictPrescribeNPI.m:910-913, loaded by
testScripts/testPrescribeXPRIZE01.m:62). Here the same pytree is stored as a
portable .npz with a JSON names manifest — loadable without MATLAB or JAX.
"""

from __future__ import annotations

import json

import numpy as np

from .core import TrainedRegionParams


def save_trained_params(path, trained: TrainedRegionParams) -> None:
    """Save per-region trained coefficients to ``path`` (.npz appended if
    missing) — the rebuild of the reference's TrainedModelParams cell table
    persisted via .mat (TrainPredictPrescribeNPI.m:910-913)."""
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(
        path,
        names=json.dumps(list(trained.names)),
        population=np.asarray(trained.population),
        a1=np.asarray(trained.a1),
        b1=np.asarray(trained.b1),
        a2=np.asarray(trained.a2),
        b2=np.asarray(trained.b2),
    )


def load_trained_params(path) -> TrainedRegionParams:
    """Load a ``save_trained_params`` .npz checkpoint (the
    testPrescribeXPRIZE01.m:62 flow: prescribe without retraining)."""
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    return TrainedRegionParams(
        names=tuple(json.loads(str(z["names"]))),
        population=z["population"],
        a1=z["a1"], b1=z["b1"], a2=z["a2"], b2=z["b2"],
    )


def save_trained_params_orbax(directory, trained: TrainedRegionParams):
    """Orbax-backed checkpoint of the trained-parameter pytree (sharded
    array support, async-friendly) for users embedded in the JAX checkpoint
    ecosystem. The .npz format above remains the portable default."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {"population": np.asarray(trained.population),
            "a1": np.asarray(trained.a1), "b1": np.asarray(trained.b1),
            "a2": np.asarray(trained.a2), "b2": np.asarray(trained.b2)}
    import os
    directory = os.path.abspath(str(directory))
    ckptr.save(directory, tree)
    ckptr.wait_until_finished()
    with open(directory + ".names.json", "w") as f:
        json.dump(list(trained.names), f)
    return directory


def load_trained_params_orbax(directory) -> TrainedRegionParams:
    """Restore a ``save_trained_params_orbax`` checkpoint directory."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    import os
    directory = os.path.abspath(str(directory))
    tree = ckptr.restore(directory)
    with open(directory + ".names.json") as f:
        names = tuple(json.load(f))
    return TrainedRegionParams(names=names, population=tree["population"],
                               a1=tree["a1"], b1=tree["b1"],
                               a2=tree["a2"], b2=tree["b2"])

def load_trained_params_mat(path) -> TrainedRegionParams:
    """Import the reference's own trained-parameter checkpoint: a MATLAB
    cell table {CountryName, RegionName, N_population, coef0, coef,
    coef0_2, coef_2} with a header row
    (Tools/TrainPredictPrescribeNPI.m:91,910-913, saved as
    TrainedModelParams and loaded by testScripts/testPrescribeXPRIZE01.m:62).
    Lets the pipeline prescribe directly from artifacts trained by the
    MATLAB reference."""
    import scipy.io as sio

    tbl = sio.loadmat(str(path))["TrainedModelParams"]
    names, pop, b1, a1, b2, a2 = [], [], [], [], [], []

    def scalar(cell):
        v = np.squeeze(cell)
        return float(v) if v.size else 0.0

    def vec12(cell):
        v = np.asarray(cell, float).ravel()
        out = np.zeros(12)
        out[:min(12, v.size)] = v[:12]
        return out

    for r in range(1, tbl.shape[0]):   # row 0 is the header
        row = tbl[r]
        country = str(np.squeeze(row[0])) if np.squeeze(row[0]).size else ""
        region = str(np.squeeze(row[1])) if np.squeeze(row[1]).size else ""
        names.append(f"{country} {region}")
        pop.append(scalar(row[2]))
        b1.append(scalar(row[3]))
        a1.append(vec12(row[4]))
        b2.append(scalar(row[5]))
        a2.append(vec12(row[6]))
    return TrainedRegionParams(
        names=tuple(names), population=np.asarray(pop),
        a1=np.asarray(a1), b1=np.asarray(b1),
        a2=np.asarray(a2), b2=np.asarray(b2))

def save_trained_params_mat(path, trained: TrainedRegionParams) -> str:
    """Export to the reference's .mat schema (the TrainedModelParams cell
    table of TrainPredictPrescribeNPI.m:910-913) so MATLAB-side tooling —
    e.g. testScripts/testPrescribeXPRIZE01.m — can consume parameters
    trained here. Inverse of load_trained_params_mat."""
    import scipy.io as sio

    path = str(path)
    if not path.endswith(".mat"):
        path = path + ".mat"
    R = len(trained.names)
    tbl = np.empty((R + 1, 7), dtype=object)
    tbl[0] = ["CountryName", "RegionName", "N_population",
              "coef0", "coef", "coef0_2", "coef_2"]
    from ..data.xprize_io import _split_geo
    for r, name in enumerate(trained.names):
        country, region = _split_geo(name)
        tbl[r + 1, 0] = country
        tbl[r + 1, 1] = region
        tbl[r + 1, 2] = float(np.asarray(trained.population)[r])
        tbl[r + 1, 3] = float(np.asarray(trained.b1)[r])
        tbl[r + 1, 4] = np.asarray(trained.a1)[r].reshape(-1, 1)
        tbl[r + 1, 5] = float(np.asarray(trained.b2)[r])
        tbl[r + 1, 6] = np.asarray(trained.a2)[r].reshape(-1, 1)
    sio.savemat(path, {"TrainedModelParams": tbl})
    return path
