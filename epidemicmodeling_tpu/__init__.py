"""epidemicmodeling_tpu — a TPU-native (JAX/XLA/Pallas) epidemic modeling framework.

A ground-up rebuild of the capabilities of alphanumericslab/EpidemicModeling
(MATLAB, XPRIZE Pandemic Response Challenge; Sameni, IEEE JSTSP 16(2):307-317, 2022)
designed TPU-first:

- Compartmental dynamics (SIR / SEIRP / SI / SI-alpha / SI-alpha+costate) as pure,
  jittable step functions rolled with ``lax.scan`` and batched with ``vmap`` /
  ``shard_map`` over device meshes.
- A generic batched Extended Kalman Filter + fixed-interval Smoother (EKF/EKS)
  with NaN-masked observations, Joseph-stabilized updates, adaptive observation
  noise, gain discounting, terminal boundary conditions, and an innovation
  whiteness monitor — feature-for-feature with the reference's
  ``Tools/GenericExtendedKalmanFilter.m`` but branch-free and scan-based.
- Finite-horizon optimal NPI control (Pontryagin costates, bang-bang law),
  Pareto epsilon sweeps as a vmapped batch axis.
- Batched non-negative least squares / LASSO regression of contact rate vs NPIs.
- Rt estimators, spatial PDE/agent simulators (Pallas kernels), and an optional
  flax LSTM forecasting stack.

Subpackages
-----------
models       dynamics kernels + EKF system equation plug-ins
ops          EKF/EKS core, smoothing filters, Pallas kernels
regression   NNLS / LASSO / robust element-wise fits (batched)
control      bang-bang law, NPI cost, Pareto front utilities
data         OxCGRT/JHU loaders, preprocessing to padded arrays + masks
pipelines    train / train-predict-prescribe / backtest / prescribe
rt           reproduction-number estimators
spatial      diffusion PDE + agent-based simulators
ml           flax LSTM forecasting pipeline
parallel     mesh construction + sharding helpers
utils        shared math/date utilities
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: the most-used entry points importable directly as
    ``from epidemicmodeling_tpu import train_predict_prescribe`` without
    paying the import cost of every subpackage up front."""
    _api = {
        "train_predict_prescribe": ("pipelines", "train_predict_prescribe"),
        "PipelineConfig": ("pipelines", "PipelineConfig"),
        "forecast_quality_assessment": (
            "pipelines.forecast_quality", "forecast_quality_assessment"),
        "ekf_smoother": ("ops", "ekf_smoother"),
        "epsilon_grid": ("control", "epsilon_grid"),
        "NPI_MAXES_DEFAULT": ("data.preprocess", "NPI_MAXES_DEFAULT"),
        "synthetic_oxford_frame": ("data", "synthetic_oxford_frame"),
    }
    if name in _api:
        import importlib
        mod, attr = _api[name]
        return getattr(importlib.import_module(f"{__name__}.{mod}"), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
