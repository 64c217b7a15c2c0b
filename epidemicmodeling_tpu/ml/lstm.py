"""LSTM sequence forecasters (flax) — the ML experiment stack.

Reference behavior (SURVEY.md §2.6):
- test00ReadOxfordDataPlusProcessLSTM.m:99-115 — per-region univariate LSTM
  (sequenceInput -> lstmLayer(100) -> FC -> regression), adam, gradient
  clipping at 1, piecewise LR schedule (drop 0.2x at epoch 125 of 250),
  standardized series, closed-loop rollout via predictAndUpdateState.
- test02FitExponentialLSTM.m:236-252 — LSTM regression of the growth rate
  lambda from NPI features.
- test04FullFeatureExtMLpipeline.m:457-495 — deep stack of up to 5 LSTM
  layers with optional custom exp / scaled-tanh output layers.
- test05DirectNewCasesLearning.m:216-233 — direct multivariate LSTM on new
  cases + NPI features with closed-loop rollout.

TPU design: the recurrence is a ``lax.scan`` over an ``nn.LSTMCell``; layers
stack sequentially; training batches (regions) vmap through one optax adam
step under jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from .layers import ExpLayer, ScaledTanhLayer


class LSTMForecaster(nn.Module):
    """Stacked-LSTM sequence regressor.

    hidden_sizes: e.g. (100,) for the univariate forecaster or
    (200, 200, 100, 50, 20) for the deep test04 stack.
    out_features: regression output dim (1 for case/lambda forecasting).
    output_layer: None | "exp" | "scaled_tanh" (the custom layers).
    """

    hidden_sizes: Sequence[int] = (100,)
    out_features: int = 1
    output_layer: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        """x: (T, F) single sequence or (B, T, F). Returns (.., T, out)."""
        squeeze = x.ndim == 2
        if squeeze:
            x = x[None]
        B, T, F = x.shape
        # recurrent params/carries are f32; keep the scan carry type stable
        # even when the caller passes f64 (tests run under x64)
        h = x.astype(jnp.float32)
        for li, size in enumerate(self.hidden_sizes):
            h = nn.RNN(nn.OptimizedLSTMCell(size), name=f"lstm{li}")(h)
        y = nn.Dense(self.out_features)(h)
        if self.output_layer == "exp":
            y = ExpLayer(self.out_features)(y)
        elif self.output_layer == "scaled_tanh":
            y = ScaledTanhLayer(self.out_features)(y)
        return y[0] if squeeze else y


def train_forecaster(model: LSTMForecaster, x, y, key, num_epochs: int = 250,
                     lr: float = 0.005, lr_drop_period: int = 125,
                     lr_drop_factor: float = 0.2, grad_clip: float = 1.0):
    """Train with adam + gradient clipping + piecewise LR (the reference's
    trainingOptions, test00:106-115). x: (T, F) or (B, T, F); y matching
    (T, out) / (B, T, out). Returns (params, losses)."""
    params = model.init(key, x)

    schedule = optax.piecewise_constant_schedule(
        lr, {lr_drop_period: lr_drop_factor})
    tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                     optax.adam(schedule))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(num_epochs):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    return params, losses


@functools.partial(jax.jit, static_argnums=0)
def _apply_model(model, params, x):
    # module-level jit keyed on the (hashable) flax module so repeated
    # rollout calls reuse ONE compiled executable instead of re-tracing a
    # per-call closure (CLAUDE.md perf rule 3)
    return model.apply(params, x)


def rollout_forecast(model: LSTMForecaster, params, history, n_ahead: int):
    """Closed-loop autoregressive rollout (predictAndUpdateState semantics,
    test00:118-128): feed the history, then repeatedly feed back the
    prediction. history: (T, 1) standardized series. Returns (n_ahead,).

    Implementation: a FIXED-SHAPE (T + n_ahead, 1) buffer updated in place,
    so the jitted apply compiles ONCE instead of once per step (a growing
    sequence re-traces the whole LSTM every iteration). The LSTM is causal,
    so the not-yet-written future rows cannot affect earlier outputs."""
    history = jnp.asarray(history)
    T = history.shape[0]
    buf = jnp.concatenate(
        [history, jnp.zeros((n_ahead,) + history.shape[1:], history.dtype)])
    preds = []
    for t in range(n_ahead):
        y = _apply_model(model, params, buf)
        yt = y[T + t - 1, 0]
        preds.append(yt)
        buf = buf.at[T + t, 0].set(yt)
    return jnp.stack(preds)


def rollout_forecast_exog(model: LSTMForecaster, params, history,
                          future_exog, target_col: int = 0):
    """Closed-loop MULTIVARIATE rollout (predictAndUpdateState semantics of
    testScripts/test05DirectNewCasesLearning.m:216-233): the target channel
    is fed back autoregressively while the exogenous feature columns (the
    NPI schedule) follow the given future plan.

    history: (T, F) feature sequence seen so far; future_exog: (H, F) future
    feature rows whose target column is overwritten by the feedback.
    Returns (H,) predictions of the target channel. Fixed-shape buffer =>
    the jitted apply compiles once (see rollout_forecast)."""
    history = jnp.asarray(history)
    T = history.shape[0]
    H = future_exog.shape[0]
    buf = jnp.concatenate([history,
                           jnp.asarray(future_exog, history.dtype)])
    preds = []
    for t in range(H):
        y = _apply_model(model, params, buf)
        yt = y[T + t - 1, 0]
        preds.append(yt)
        buf = buf.at[T + t, target_col].set(yt)
    return jnp.stack(preds)
