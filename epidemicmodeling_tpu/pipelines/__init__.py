from .config import PipelineConfig
from .core import (
    TrainedRegionParams,
    train_regions,
    forecast_scenarios,
    pareto_prescribe,
    monte_carlo_baseline,
    scenario_from_schedule,
)
from .train_predict_prescribe import (train_predict_prescribe,
                                      build_batches_from_frames)
from . import forecast_quality, prescribe
from .forecast_quality import forecast_quality_assessment
from .prescribe import prescribe_from_checkpoint
from .checkpoint import (save_trained_params, load_trained_params,
                         save_trained_params_orbax, load_trained_params_orbax,
                         load_trained_params_mat,
                         save_trained_params_mat)

__all__ = [
    "PipelineConfig",
    "TrainedRegionParams",
    "train_regions",
    "forecast_scenarios",
    "pareto_prescribe",
    "monte_carlo_baseline",
    "scenario_from_schedule",
    "train_predict_prescribe",
    "save_trained_params",
    "load_trained_params",
    "save_trained_params_orbax",
    "load_trained_params_orbax",
    "load_trained_params_mat",
    "save_trained_params_mat",
    "forecast_quality_assessment",
    "prescribe_from_checkpoint",
    "build_batches_from_frames",
]
