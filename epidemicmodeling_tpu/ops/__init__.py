from .ekf import EKFResult, ekf_smoother, batched_ekf_smoother, backward_ekf_smoother

__all__ = ["EKFResult", "ekf_smoother", "batched_ekf_smoother",
           "backward_ekf_smoother"]
