"""Full feature-extraction ML comparison (testScripts/test04FullFeatureExtMLpipeline.m):
extract the growth rate lambda(t) per region, build lagged-NPI + long-weekend
features, and compare ARX, ridge, linear/RBF SVR and an LSTM on
held-out-tail prediction of lambda. Prints a MAE table per model."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.ml.features import (lagged_features,
                                                  long_weekend_feature,
                                                  standardize,
                                                  train_test_split_time)
    from epidemicmodeling_tpu.ml.linear import ridge_regression, \
        arx_fit_predict
    from epidemicmodeling_tpu.ml.svr import svr_fit, svr_predict
    from epidemicmodeling_tpu.ml.lstm import (LSTMForecaster,
                                              train_forecaster)
    from epidemicmodeling_tpu.rt.estimators import rt_expfit_log_lin_reg

    df, pops, truth = synthetic_oxford_frame(n_regions=4, n_days=220, seed=9)
    npi_cols = [c for c in df.columns if c[0] in "CH" and "_" in c]
    results = []
    for name, sub in df.groupby("CountryName"):
        sub = sub.sort_values("Date")
        new_cases = np.maximum(np.diff(sub["ConfirmedCases"].to_numpy(),
                                       prepend=0.0), 0.0) + 1.0
        # growth-rate target via the log-linear regression estimator
        # (test04 uses the Rt feature stack :217-219)
        _, _, lam, _ = rt_expfit_log_lin_reg(new_cases, wlen=14,
                                             time_unit=1.0, causal=True)
        lam = np.asarray(lam)

        U = sub[npi_cols].to_numpy(float)
        dates = pd.to_datetime(sub["Date"]).dt.strftime("%Y-%m-%d").tolist()
        feats = np.column_stack([
            np.asarray(lagged_features(U, lags=(1, 7, 14))),
            np.asarray(long_weekend_feature(dates))[:, None],
        ])
        X, _, _ = standardize(feats)
        X = np.asarray(X)
        (Xtr, ytr), (Xte, yte) = train_test_split_time(X, lam, 0.8)
        Xtr, ytr, Xte, yte = map(np.asarray, (Xtr, ytr, Xte, yte))

        row = {"region": name}
        w, b = ridge_regression(jnp.asarray(Xtr), jnp.asarray(ytr), lam=1e-2)
        row["ridge"] = float(np.mean(np.abs(Xte @ np.asarray(w)
                                            + float(b) - yte)))
        _, y_arx = arx_fit_predict(lam[:len(ytr)], order=14,
                                   n_ahead=len(yte))
        row["arx"] = float(np.mean(np.abs(np.asarray(y_arx) - yte)))
        for kern in ("linear", "rbf"):
            m = svr_fit(jnp.asarray(Xtr), jnp.asarray(ytr), kernel=kern)
            pred = np.asarray(svr_predict(m, jnp.asarray(Xte)))
            row[f"svr_{kern}"] = float(np.mean(np.abs(pred - yte)))

        model = LSTMForecaster(hidden_sizes=(16,))
        seq_x = jnp.asarray(Xtr)[None]
        seq_y = jnp.asarray(ytr)[None, :, None]
        params, _ = train_forecaster(model, seq_x, seq_y,
                                     jax.random.PRNGKey(0), num_epochs=150)
        pred = np.asarray(model.apply(params, jnp.asarray(X)[None])
                          )[0, :, 0][len(ytr):]
        row["lstm"] = float(np.mean(np.abs(pred - yte)))
        results.append(row)

    tbl = pd.DataFrame(results).set_index("region")
    print("MAE of held-out growth-rate prediction per model:")
    print(tbl.round(4).to_string())
    best = tbl.mean().idxmin()
    print(f"best on average: {best}")


if __name__ == "__main__":
    main()
