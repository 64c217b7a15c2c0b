from .math import symmetrize, causal_moving_average, filtfilt_ma, clip01
from .dates import date_range_days, num_days_between

__all__ = [
    "symmetrize",
    "causal_moving_average",
    "filtfilt_ma",
    "clip01",
    "date_range_days",
    "num_days_between",
]
