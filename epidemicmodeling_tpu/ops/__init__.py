from .ekf import EKFResult, ekf_smoother, batched_ekf_smoother, backward_ekf_smoother
from .ekf_bl import EKFSystemBL, EKFResultBL, ekf_smoother_bl
from .parallel_kf import parallel_kalman, PKFResult
from .ar import ar_fit, ar_fit_burg, ar_forecast
from .smoothing import smooth_series, tikhonov_smooth

__all__ = ["EKFResult", "ekf_smoother", "batched_ekf_smoother",
           "backward_ekf_smoother", "EKFSystemBL", "EKFResultBL",
           "ekf_smoother_bl", "parallel_kalman", "PKFResult",
           "ar_fit", "ar_fit_burg", "ar_forecast", "smooth_series",
           "tikhonov_smooth"]
