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
    path = str(path)
    if not path.endswith(".npz"):
        path = path + ".npz"
    z = np.load(path, allow_pickle=False)
    return TrainedRegionParams(
        names=tuple(json.loads(str(z["names"]))),
        population=z["population"],
        a1=z["a1"], b1=z["b1"], a2=z["a2"], b2=z["b2"],
    )
