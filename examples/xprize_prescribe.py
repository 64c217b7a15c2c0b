"""XPRIZE train-predict-prescribe driver.

The framework's counterpart of testScripts/testPrescribeXPRIZE02.m: configure
dates, the 12 Oxford NPIs with their codebook maxima, the 250-point epsilon
grid and equal NPI weights, then run the full pipeline and write the
prescription CSVs.

Usage:
    python examples/xprize_prescribe.py <OxCGRT.csv> <geos.csv> <pops.csv>
    python examples/xprize_prescribe.py --synthetic   # self-contained demo
"""

import sys
import tempfile

import numpy as np


def main(argv):
    import jax
    from epidemicmodeling_tpu.control import epsilon_grid
    from epidemicmodeling_tpu.data.preprocess import NPI_MAXES_DEFAULT
    from epidemicmodeling_tpu.data.xprize_io import write_prescriptions_csv
    from epidemicmodeling_tpu.pipelines import (PipelineConfig,
                                                train_predict_prescribe)

    if len(argv) >= 2 and argv[1] == "--synthetic":
        from epidemicmodeling_tpu.data import synthetic_oxford_frame
        tmp = tempfile.mkdtemp()
        df, pops, _ = synthetic_oxford_frame(n_regions=6, n_days=240, seed=0)
        data_file = f"{tmp}/ox.csv"
        geo_file = f"{tmp}/geo.csv"
        pop_file = f"{tmp}/pop.csv"
        df.to_csv(data_file, index=False)
        pops.to_csv(pop_file, index=False)
        pops[["CountryName", "RegionName"]].to_csv(geo_file, index=False)
        start_train, end_train = "2020-03-01", "2020-09-16"
        end_predict = "2020-10-26"
    else:
        data_file, geo_file, pop_file = argv[1:4]
        # the XPRIZE Phase-II configuration (testPrescribeXPRIZE02.m:12-15)
        start_train, end_train = "2020-03-15", "2021-05-29"
        end_predict = "2021-08-29"

    P = 12
    npi_weights = np.ones(P) * P / P          # equal weights (:56-57)
    eps = np.asarray(epsilon_grid(250))       # log+linear grid (:49-53)

    res = train_predict_prescribe(
        npi_weights=npi_weights, epsilon_values=eps,
        start_train_date=start_train, end_train_date=end_train,
        start_regression_date=start_train, end_predict_date=end_predict,
        data_file=data_file, geo_file=geo_file, populations_file=pop_file,
        npi_mins=np.zeros(P), npi_maxes=NPI_MAXES_DEFAULT,
        trained_params_file="trained_params",
        cfg=PipelineConfig(backend="lanes", smoother_gain="solve"),
        key=jax.random.PRNGKey(0))

    # export the Pareto-front prescriptions for each region's best tradeoff
    # points (up to 10 indices, XPRIZE schema)
    u = np.asarray(res.pareto["u_prescribed"])       # (E, R, H, P)
    front = res.pareto_front                          # (E, R)
    idxs = np.linspace(0, u.shape[0] - 1, 10).astype(int)
    out = write_prescriptions_csv(
        "prescriptions.csv", res.trained.names, end_train,
        u[idxs])
    print(f"wrote {out}; front sizes: {front.sum(axis=0)}")
    print(f"trained params saved to trained_params.npz "
          f"({len(res.trained.names)} regions)")


if __name__ == "__main__":
    main(sys.argv if len(sys.argv) > 1 else [sys.argv[0], "--synthetic"])
