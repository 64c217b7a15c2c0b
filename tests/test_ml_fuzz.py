"""ML-layer fuzz: randomized configurations vs independent NumPy loop
oracles and closed-form certificates for the feature engineering, the
ridge/ARX baselines, the SVR feature maps + objective, and the custom
learnable layers.

Reference behaviors mirrored: lagged NPI stacking and the long-weekend
indicator (test04FullFeatureExtMLpipeline.m:96-100,355), the processing-
window criteria (:16,83-90), the ridge fit (:398-405), fitrsvm
linear/gaussian usage (test03ExpfitVsIPRegression.m:198-246), and
expLayer.m:28-33 / MyTanhLayer.m:28-33.
"""

import datetime

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.ml import (
    ExpLayer, ScaledTanhLayer, ridge_regression, svr_fit, svr_predict,
    lagged_features, long_weekend_feature, standardize,
    train_test_split_time)
from epidemicmodeling_tpu.ml.features import region_window_mask
from epidemicmodeling_tpu.ml.svr import SVRModel, _features


@pytest.mark.parametrize("seed", range(6))
def test_features_fuzz(seed):
    """Feature engineering vs loop oracles: lag stacking with zero-padded
    history (duplicate and unsorted lags included), the long-weekend
    indicator vs a datetime.weekday() oracle, standardization moments with
    constant-column safety, the chronological split, and the
    processing-window criteria with NaN reporting gaps."""
    rng = np.random.default_rng(10300 + seed)
    T = int(rng.integers(10, 80))
    F = int(rng.integers(1, 6))
    X = rng.normal(size=(T, F))
    lags = [int(v) for v in rng.integers(0, min(T, 10),
                                         size=rng.integers(1, 5))]
    got = np.asarray(lagged_features(X, lags))
    assert got.shape == (T, F * len(lags))
    for li, lag in enumerate(lags):
        block = got[:, li * F: (li + 1) * F]
        for t in range(T):
            exp = X[t - lag] if t - lag >= 0 else np.zeros(F)
            np.testing.assert_array_equal(block[t], exp,
                                          err_msg=f"lag={lag} t={t}")

    start = datetime.date(2020, 1, 1) + datetime.timedelta(
        days=int(rng.integers(0, 3000)))
    days = [start + datetime.timedelta(days=k) for k in range(T)]
    got_w = np.asarray(long_weekend_feature(
        np.array([d.isoformat() for d in days], dtype="datetime64[D]")))
    wk = np.array([d.weekday() >= 5 for d in days])
    ref_w = wk.copy()
    for t in range(T):
        if days[t].weekday() == 4 and t + 1 < T and wk[t + 1]:
            ref_w[t] = True                       # bridge Friday
        if days[t].weekday() == 0 and t - 1 >= 0 and wk[t - 1]:
            ref_w[t] = True                       # bridge Monday
    np.testing.assert_array_equal(got_w, ref_w.astype(float))

    Xc = X.copy()
    if F >= 2:
        Xc[:, 1] = 3.14                           # constant column
    Xs, mu, sd = standardize(Xc)
    Xs = np.asarray(Xs)
    np.testing.assert_allclose(Xs.mean(axis=0), 0.0, atol=1e-12)
    live = np.asarray(Xc).std(axis=0) > 1e-12
    np.testing.assert_allclose(Xs.std(axis=0)[live], 1.0, rtol=1e-10)
    np.testing.assert_allclose(Xs[:, ~live], 0.0, atol=1e-12)

    frac = float(rng.uniform(0.3, 0.9))
    (Xtr, ytr), (Xte, yte) = train_test_split_time(X, X[:, 0], frac)
    cut = int(T * frac)
    assert Xtr.shape[0] == cut and Xte.shape[0] == T - cut
    np.testing.assert_array_equal(np.asarray(Xtr), X[:cut])

    dates = np.array([int((start + datetime.timedelta(days=k)
                           ).strftime("%Y%m%d")) for k in range(T)])
    conf = np.cumsum(rng.poisson(30, T)).astype(float)
    conf[rng.random(T) < 0.15] = np.nan
    min_cases = float(rng.uniform(10, 500))
    lo, hi = sorted(rng.choice(dates, 2))
    for crit in ("MIN_CASE_BASED", "DATE_BASED", "DATA_OR_MIN_CASE_BASED"):
        got_m = np.asarray(region_window_mask(
            dates, conf, crit, min_cases, int(lo), int(hi)))
        for t in range(T):
            case_ok = (not np.isnan(conf[t])) and conf[t] > min_cases
            in_end = dates[t] <= hi
            if crit == "MIN_CASE_BASED":
                exp = case_ok and in_end
            elif crit == "DATE_BASED":
                exp = lo <= dates[t] <= hi
            else:
                exp = case_ok and lo <= dates[t] <= hi
            assert got_m[t] == exp, f"{crit} t={t}"
    with pytest.raises(ValueError, match="start_date_criterion"):
        region_window_mask(dates, conf, "TYPO")


@pytest.mark.parametrize("seed", range(6))
def test_ridge_fuzz(seed):
    """Ridge closed form vs the numpy normal-equations oracle (both
    intercept modes), stationarity of the returned solution, and the
    lam -> 0 limit vs lstsq on a well-conditioned problem."""
    rng = np.random.default_rng(10400 + seed)
    T = int(rng.integers(20, 150))
    F = int(rng.integers(1, min(T - 2, 8)))
    X = rng.normal(size=(T, F)) * rng.lognormal(size=F)
    y = rng.normal(size=T) + X @ rng.normal(size=F)
    lam = float(rng.choice([1e-6, 1e-3, 1.0, 10.0]))

    for fit_b in (True, False):
        w, b = ridge_regression(jnp.asarray(X), jnp.asarray(y), lam=lam,
                                fit_intercept=fit_b)
        w, b = np.asarray(w), float(b)
        if fit_b:
            Xc = X - X.mean(axis=0)
            yc = y - y.mean()
        else:
            Xc, yc = X, y
        ref = np.linalg.solve(Xc.T @ Xc + lam * np.eye(F), Xc.T @ yc)
        np.testing.assert_allclose(w, ref, rtol=1e-8, atol=1e-10)
        # stationarity of the (centered) ridge objective
        grad = Xc.T @ (Xc @ ref) + lam * ref - Xc.T @ yc
        assert np.abs(grad).max() < 1e-6 * max(1.0, np.abs(Xc.T @ yc).max())
        if fit_b:
            assert b == pytest.approx(y.mean() - w @ X.mean(axis=0),
                                      rel=1e-8, abs=1e-10)
        else:
            assert b == 0.0

    w0, b0 = ridge_regression(jnp.asarray(X), jnp.asarray(y), lam=1e-12)
    Xa = np.concatenate([X, np.ones((T, 1))], axis=1)
    wls = np.linalg.lstsq(Xa, y, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(w0), wls[:F], rtol=1e-5,
                               atol=1e-7 * max(1.0, np.abs(wls).max()))


@pytest.mark.parametrize("seed", range(6))
def test_svr_features_fuzz(seed):
    """SVR feature maps vs oracles: the rbf-exact map IS the gaussian
    kernel matrix (per-pair loop), the RFF map's inner products converge
    to that kernel at the Monte-Carlo rate, linear is standardization
    only, and a short fit improves the primal objective over its init."""
    rng = np.random.default_rng(10500 + seed)
    n = int(rng.integers(10, 60))
    F = int(rng.integers(1, 6))
    X = rng.normal(size=(n, F)) * rng.lognormal(size=F)
    gamma = float(rng.uniform(0.05, 2.0))
    mu = X.mean(axis=0)
    sd = np.where(X.std(axis=0) > 0, X.std(axis=0), 1.0)
    Xs = (X - mu) / sd

    mdl = SVRModel(None, None, "rbf-exact", None, None, jnp.asarray(mu),
                   jnp.asarray(sd), jnp.asarray(Xs), gamma)
    K = np.asarray(_features(jnp.asarray(X), mdl))
    for i in range(0, n, max(1, n // 8)):
        for j in range(0, n, max(1, n // 8)):
            d2 = float(np.sum((Xs[i] - Xs[j]) ** 2))
            assert K[i, j] == pytest.approx(np.exp(-gamma * d2), rel=1e-9)

    D = 4096
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    omega = np.sqrt(2.0 * gamma) * np.asarray(
        jax.random.normal(k1, (F, D)))
    phase = np.asarray(jax.random.uniform(k2, (D,), maxval=2 * np.pi))
    mdl_rff = SVRModel(None, None, "rbf", jnp.asarray(omega),
                       jnp.asarray(phase), jnp.asarray(mu), jnp.asarray(sd))
    Phi = np.asarray(_features(jnp.asarray(X), mdl_rff))
    approx = Phi @ Phi.T
    err = np.abs(approx - K).max()
    assert err < 6.0 / np.sqrt(D), f"RFF kernel error {err}"

    mdl_lin = SVRModel(None, None, "linear", None, None, jnp.asarray(mu),
                       jnp.asarray(sd))
    np.testing.assert_allclose(np.asarray(_features(jnp.asarray(X),
                                                    mdl_lin)), Xs,
                               rtol=1e-12)

    # a short fit must improve the primal objective over the zero init
    y = np.asarray(Xs @ rng.normal(size=F) + 0.1 * rng.normal(size=n))
    C, eps_tube = 1.0, 0.01
    def primal(pred, w, reg_quad):
        hinge = np.maximum(np.abs(pred - y) - eps_tube, 0.0)
        return reg_quad / (C * n) + hinge.mean()
    fit = svr_fit(jnp.asarray(X), jnp.asarray(y), kernel="linear", C=C,
                  epsilon=eps_tube, n_steps=400)
    pred = np.asarray(svr_predict(fit, jnp.asarray(X)))
    w = np.asarray(fit.w)
    obj_fit = primal(pred, w, 0.5 * np.sum(w ** 2))
    obj_init = primal(np.full(n, y.mean()), np.zeros(F), 0.0)
    assert obj_fit < obj_init, (obj_fit, obj_init)


@pytest.mark.parametrize("seed", range(6))
def test_layers_fuzz(seed):
    """expLayer.m:28-33 / MyTanhLayer.m:28-33 closed forms with random
    learnable parameters, including the near-zero-alpha guard of the
    scaled tanh (alpha -> 0 limit is the identity-slope x, not NaN)."""
    rng = np.random.default_rng(10600 + seed)
    F = int(rng.integers(1, 6))
    B = int(rng.integers(1, 8))
    x = jnp.asarray(rng.normal(size=(B, F)))

    layer = ExpLayer(features=F)
    params = layer.init(jax.random.PRNGKey(seed), x)
    alpha = rng.normal(size=F)
    params = {"params": {"alpha": jnp.asarray(alpha)}}
    np.testing.assert_allclose(np.asarray(layer.apply(params, x)),
                               np.exp(alpha * np.asarray(x)), rtol=1e-12)

    layer_t = ScaledTanhLayer(features=F)
    alpha_t = rng.normal(size=F) * rng.choice([1e-12, 0.1, 1.0, 10.0],
                                              size=F)
    params_t = {"params": {"alpha": jnp.asarray(alpha_t)}}
    got = np.asarray(layer_t.apply(params_t, x))
    safe = np.where(np.abs(alpha_t) > 1e-8, alpha_t, 1e-8)
    np.testing.assert_allclose(got, safe * np.tanh(np.asarray(x) / safe),
                               rtol=1e-12)
    assert np.isfinite(got).all()
