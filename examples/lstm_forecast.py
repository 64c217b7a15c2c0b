"""Per-region LSTM case forecasting driver
(testScripts/test00ReadOxfordDataPlusProcessLSTM.m): standardize the smoothed
new-case series, train a 100-unit LSTM next-step model, roll a closed-loop
forecast."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.ml import (LSTMForecaster, train_forecaster,
                                         rollout_forecast, standardize)

    _, _, truth = synthetic_oxford_frame(n_regions=1, n_days=220, seed=2)
    tr = next(iter(truth.values()))
    cases = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]

    n_test = 30
    train = cases[:-n_test]
    xs, mu, sd = standardize(jnp.asarray(train).reshape(-1, 1))
    x_in, y_out = xs[:-1], xs[1:]

    model = LSTMForecaster(hidden_sizes=(100,))
    params, losses = train_forecaster(model, x_in, y_out,
                                      jax.random.PRNGKey(0), num_epochs=250,
                                      lr=0.005, lr_drop_period=125)
    pred_std = rollout_forecast(model, params, xs, n_test)
    pred = np.asarray(pred_std) * float(sd[0, 0]) + float(mu[0, 0])
    truth_tail = cases[-n_test:]
    mape = np.mean(np.abs(pred - truth_tail)
                   / np.maximum(truth_tail, 1e-9)) * 100
    print(f"final train loss {losses[-1]:.4f}; "
          f"{n_test}-day closed-loop forecast MAPE {mape:.1f}%")


if __name__ == "__main__":
    main()
