"""Forecast-quality backtest driver — reproduces the IEEE JSTSP evaluation
(testScripts/testIEEEJSTSP2021ArticleResults.m: MaxLookAheadDays=60, per-day
EKF reruns) on synthetic or real OxCGRT data, printing the error-vs-horizon
curves that are the paper's headline figures.

Usage: python examples/forecast_quality.py [--days N] [--regions R]
"""

import sys

import numpy as np


def main():
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (
        preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.forecast_quality import \
        forecast_quality_assessment

    n_days = 300
    n_regions = 4
    _, _, truth = synthetic_oxford_frame(n_regions=n_regions, n_days=n_days,
                                         seed=0)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    batch = build_region_batch(sers, names)

    res = forecast_quality_assessment(
        batch, np.zeros(12), NPI_MAXES_DEFAULT,
        num_regression_days=n_days - 90, num_forecast_days=90,
        max_look_ahead_days=60,
        cfg=PipelineConfig(smoother_gain="solve", backend="lanes"))

    med = np.asarray(res.median_error_smooth)   # (R, 60)
    print("median % error vs look-ahead horizon (per region):")
    for r, name in enumerate(names):
        print(f"  {name:14s} day1={med[r, 0]:6.2f}%  day7={med[r, 6]:6.2f}%"
              f"  day30={med[r, 29]:6.2f}%  day60={med[r, 59]:6.2f}%")


if __name__ == "__main__":
    main()
