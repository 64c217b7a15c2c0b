"""Direct new-cases multivariate closed-loop LSTM
(testScripts/test05DirectNewCasesLearning.m).

Trains an LSTM on [new cases, NPI levels, lagged NPIs] features to predict
next-day new cases DIRECTLY (no EKF in the loop), then rolls it out
closed-loop over a held-out tail: the case channel is fed back
autoregressively (predictAndUpdateState semantics, test05:216-233) while
the NPI channels follow the actual schedule. Prints the closed-loop MAE
against ground truth and a last-value persistence baseline.

Run on CPU:  JAX_PLATFORMS=cpu python examples/direct_newcases_lstm.py
"""

import numpy as np


def main(n_days=220, hidden=16, epochs=120, seed=0):
    import jax
    import jax.numpy as jnp

    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.ml import (LSTMForecaster, train_forecaster,
                                         rollout_forecast_exog,
                                         lagged_features, standardize)

    df, _, truth = synthetic_oxford_frame(n_regions=1, n_days=n_days,
                                          seed=seed)
    npi_cols = [c for c in df.columns if c[0] in "CH" and "_" in c]
    sub = df.sort_values("Date")
    new_cases = np.maximum(np.diff(sub["ConfirmedCases"].to_numpy(),
                                   prepend=0.0), 0.0)
    # 7-day causal smoothing like the reference's preprocessing
    kern = np.ones(7) / 7.0
    smoothed = np.convolve(new_cases, kern)[:len(new_cases)]
    cases_std, mu_c, sd_c = standardize(smoothed[:, None])
    cases_std = np.asarray(cases_std)[:, 0]

    U = sub[npi_cols].to_numpy(float)
    U_lag = np.asarray(lagged_features(U, lags=(3, 5, 7)))  # :117-123
    feats = np.column_stack([cases_std, U, U_lag])   # target channel FIRST
    feats, _, _ = standardize(feats)
    feats = np.array(feats)  # writable copy
    feats[:, 0] = cases_std              # target channel keeps its own scale
    # (so the fed-back prediction and the training target y agree in units)

    T = len(cases_std)
    T_train = int(0.8 * T)
    X = feats[:-1]                                   # predict next-day cases
    y = cases_std[1:][:, None]

    model = LSTMForecaster(hidden_sizes=(hidden,), out_features=1)
    params, losses = train_forecaster(
        model, jnp.asarray(X[:T_train - 1]), jnp.asarray(y[:T_train - 1]),
        jax.random.PRNGKey(seed), num_epochs=epochs)
    print(f"train mse: first={losses[0]:.4f} last={losses[-1]:.4f}")

    # closed-loop over the tail: feed back predicted cases, real NPI plan
    preds = rollout_forecast_exog(model, params, feats[:T_train],
                                  feats[T_train:], target_col=0)
    truth_tail = cases_std[T_train:]
    mae = float(np.mean(np.abs(np.asarray(preds) - truth_tail)))
    persist = float(np.mean(np.abs(cases_std[T_train - 1] - truth_tail)))
    # like the reference experiment, this reports the comparison without
    # claiming the LSTM wins — on nonstationary epidemic tails a long
    # closed-loop rollout is hard (test05 plots the overlays for the same
    # reason)
    print(f"closed-loop horizon={len(truth_tail)}  LSTM MAE={mae:.4f}  "
          f"persistence MAE={persist:.4f}")
    return mae, persist, losses


if __name__ == "__main__":
    main()
