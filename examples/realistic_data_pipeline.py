"""Full pipeline on jointly-pathological "real-artifact" data.

Every reference driver consumes the real OxCGRT download, whose case
histories carry negative revisions, reporting gaps, weekend dips, NaN
holes and late-starting regions in combination
(Tools/TrainPredictPrescribeNPI.m:121-170 is the cleaning layer built for
them). This driver writes a realistic_oxford_frame to CSV, runs the full
CSV -> loader -> cleaning -> train-predict-prescribe path, and reports how
well training recovered the generating epidemic despite the corruption.

Usage: python examples/realistic_data_pipeline.py
"""

import tempfile
import os

import numpy as np


def main(n_regions: int = 4, n_days: int = 200, n_eps: int = 6, seed: int = 7):
    import datetime

    import jax
    from epidemicmodeling_tpu.data import realistic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import NPI_MAXES_DEFAULT
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        train_predict_prescribe
    from epidemicmodeling_tpu.control import epsilon_grid

    df, pops, truth = realistic_oxford_frame(n_regions=n_regions,
                                             n_days=n_days, seed=seed)
    with tempfile.TemporaryDirectory() as tmp:
        df.to_csv(os.path.join(tmp, "oxford.csv"), index=False)
        pops.to_csv(os.path.join(tmp, "populations.csv"), index=False)
        pops[["CountryName", "RegionName"]].to_csv(
            os.path.join(tmp, "geos.csv"), index=False)

        nan_frac = float(df["ConfirmedCases"].isna().mean())
        neg_days = int(sum(
            (np.diff(g["ConfirmedCases"].dropna().to_numpy()) < 0).sum()
            for _, g in df.groupby("CountryName")))
        npi_cols = [c for c in df.columns if c[0] in "CH" and "_" in c]
        nan_npis = int(df[npi_cols].isna().sum().sum())
        print(f"raw data: {nan_frac:.1%} NaN case days, "
              f"{neg_days} negative-revision days, {nan_npis} NaN NPI cells")

        # train on the first ~85% of the generated window, predict the rest
        # (dates derived from the generator's own start/n_days so the split
        # matches the data regardless of n_days)
        d0 = datetime.date(2020, 3, 1)
        d_train = (d0 + datetime.timedelta(days=int(n_days * 0.85))).isoformat()
        d_end = (d0 + datetime.timedelta(days=n_days - 1)).isoformat()
        res = train_predict_prescribe(
            npi_weights=np.ones(12),
            epsilon_values=np.asarray(epsilon_grid(n_eps)),
            start_train_date=d0.isoformat(), end_train_date=d_train,
            start_regression_date=d0.isoformat(),
            end_predict_date=d_end,
            data_file=os.path.join(tmp, "oxford.csv"),
            geo_file=os.path.join(tmp, "geos.csv"),
            populations_file=os.path.join(tmp, "populations.csv"),
            npi_maxes=NPI_MAXES_DEFAULT,
            cfg=PipelineConfig(backend="lanes", smoother_gain="solve",
                               pareto_chunk=max(2, n_eps // 2),
                               num_monte_carlo=16),
            key=jax.random.PRNGKey(0))

    print("\nregion            total-cases recovered  front size")
    front_sizes = np.asarray(res.pareto_front).sum(axis=0)
    for r, name in enumerate(res.trained.names):
        clean = truth[name]["confirmed_clean"]
        pop = truth[name]["pop"]
        bt = res.batch_train
        T = np.asarray(bt.new_cases_norm).shape[1]
        got = np.asarray(bt.new_cases_norm)[r].sum() * pop
        want = clean[min(T, len(clean)) - 1]
        print(f"  {name.strip():14s} {got / want:8.1%} of clean truth"
              f"      {int(front_sizes[r])}/{n_eps}")
    assert np.isfinite(np.asarray(res.pareto["J0"])).all()
    print("\npipeline completed on pathological data; all costs finite")
    return res


if __name__ == "__main__":
    main()
