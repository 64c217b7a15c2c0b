"""Randomized fuzz for the cleaning/smoothing layer (data/preprocess.py,
ops/smoothing.py, utils/math.py) against independent loop oracles and
optimality certificates.

Oracle style matches the EKF fuzz families: every reference behavior is
re-transcribed here as a plain Python loop straight from the cited MATLAB
lines (Tools/TrainPredictPrescribeNPI.m:121-247), so a vectorization bug in
the package cannot hide in a shared implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.data.preprocess import (
    RegionSeries, build_region_batch, clean_case_series, forward_fill_npis,
    preprocess_region, _causal_ma)
from epidemicmodeling_tpu.ops.smoothing import (
    sliding_mean, sliding_median, smooth_series, tikhonov_smooth)
from epidemicmodeling_tpu.utils.math import causal_moving_average, filtfilt_ma


def _hostile_confirmed(rng, T):
    """Cumulative-case series with the reference's real-data pathologies:
    NaN holes, negative revisions (cumulative DECREASES), a possible
    trailing NaN, flat stretches and jumps."""
    steps = rng.choice([0.0, 1.0, 5.0, 50.0], size=T,
                       p=[0.3, 0.3, 0.3, 0.1]) * rng.random(T)
    conf = np.cumsum(steps)
    # negative revisions: a few days where the cumulative count drops
    for _ in range(int(rng.integers(0, 4))):
        i = int(rng.integers(1, T))
        conf[i:] -= rng.uniform(0, 10)
    # NaN holes anywhere (incl. possibly the first sample)
    n_nan = int(rng.integers(0, max(1, T // 5)))
    conf[rng.choice(T, size=n_nan, replace=False)] = np.nan
    if rng.random() < 0.5:
        conf[-1] = np.nan                       # today not yet reported
    return conf


def oracle_clean(confirmed):
    """Loop transcription of TrainPredictPrescribeNPI.m:156-170: diff with
    duplicated first sample, clip negatives to 0, back-fill a trailing NaN
    from the last finite NEW-CASES sample, zero remaining NaNs."""
    confirmed = np.asarray(confirmed, float)
    T = len(confirmed)
    if T < 2:
        return np.zeros(T), False
    new_cases = np.empty(T)
    new_cases[0] = 0.0
    for t in range(1, T):
        new_cases[t] = confirmed[t] - confirmed[t - 1]
    for t in range(T):
        if new_cases[t] < 0:                    # NaN compares False: kept
            new_cases[t] = 0.0
    refined = new_cases.copy()
    if np.isnan(refined[-1]):
        last = None
        for t in range(T):
            if not np.isnan(new_cases[t]):
                last = t
        if last is not None:
            refined[-1] = refined[last]
    for t in range(T):
        if np.isnan(refined[t]):
            refined[t] = 0.0
    return refined, True


@pytest.mark.parametrize("seed", range(8))
def test_clean_fuzz(seed):
    rng = np.random.default_rng(5100 + seed)
    T = int(rng.integers(2, 300))
    conf = _hostile_confirmed(rng, T)
    got, ok = clean_case_series(conf)
    ref, ok_ref = oracle_clean(conf)
    assert ok == ok_ref
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert np.all(np.isfinite(got)) and np.all(np.asarray(got) >= 0)


@pytest.mark.parametrize("seed", range(8))
def test_ffill_fuzz(seed):
    """forward_fill_npis vs the reference's double loop
    (TrainPredictPrescribeNPI.m:121-128): NaN takes the previous day's
    level; leading NaNs become 0."""
    rng = np.random.default_rng(5200 + seed)
    T, P = int(rng.integers(1, 120)), int(rng.integers(1, 13))
    npis = rng.integers(0, 5, size=(T, P)).astype(float)
    mask = rng.random((T, P)) < rng.uniform(0.05, 0.6)
    npis[mask] = np.nan
    ref = npis.copy()
    for p in range(P):
        for t in range(T):
            if np.isnan(ref[t, p]):
                ref[t, p] = ref[t - 1, p] if t > 0 else np.nan
        for t in range(T):
            if np.isnan(ref[t, p]):
                ref[t, p] = 0.0
    np.testing.assert_array_equal(forward_fill_npis(npis), ref)


def oracle_causal_ma(x, w):
    """y[t] = (1/w) sum_{i=0}^{w-1} x[t-i], x[<0] = 0 — MATLAB
    filter(ones(1,w), w, x) (TrainPredictPrescribeNPI.m:173)."""
    T = len(x)
    y = np.zeros(T)
    for t in range(T):
        for i in range(w):
            if t - i >= 0:
                y[t] += x[t - i]
        y[t] /= w
    return y


@pytest.mark.parametrize("seed", range(6))
def test_causal_ma_fuzz(seed):
    rng = np.random.default_rng(5300 + seed)
    T = int(rng.integers(3, 200))
    w = int(rng.integers(1, min(T + 3, 15)))
    x = 10.0 ** rng.uniform(-3, 3) * rng.standard_normal(T)
    ref = oracle_causal_ma(x, w)
    scale = np.abs(x).max() + 1e-30
    np.testing.assert_allclose(_causal_ma(x, w), ref, rtol=1e-12,
                               atol=1e-13 * scale)
    # the jnp twin, on a random batch axis
    B = int(rng.integers(1, 5))
    xb = 10.0 ** rng.uniform(-3, 3) * rng.standard_normal((B, T))
    refb = np.stack([oracle_causal_ma(r, w) for r in xb])
    got = np.asarray(causal_moving_average(jnp.asarray(xb), w, axis=-1))
    np.testing.assert_allclose(got, refb, rtol=1e-12,
                               atol=1e-13 * np.abs(xb).max())
    got_t = np.asarray(causal_moving_average(jnp.asarray(xb.T), w, axis=0))
    np.testing.assert_allclose(got_t, refb.T, rtol=1e-12,
                               atol=1e-13 * np.abs(xb).max())


@pytest.mark.parametrize("seed", range(4))
def test_filtfilt_fuzz(seed):
    """filtfilt_ma (jnp) vs scipy.signal.filtfilt on series long enough for
    the full reflective padding (T > 3*(w-1)); boxcar taps."""
    scipy_signal = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(5400 + seed)
    w = int(rng.integers(2, 9))
    T = int(rng.integers(3 * (w - 1) + 2, 250))
    x = rng.standard_normal(T)
    ref = scipy_signal.filtfilt(np.ones(w) / w, 1.0, x)
    got = np.asarray(filtfilt_ma(jnp.asarray(x), w))
    np.testing.assert_allclose(got, ref, rtol=1e-10,
                               atol=1e-12 * np.abs(x).max())


@pytest.mark.parametrize("seed", range(6))
def test_tikhonov_fuzz(seed):
    """Optimality certificates for the Tikhonov smoother: the fitted y
    satisfies the normal equations (I + g D'D) y = x to float precision,
    and its objective beats both the raw series and a random feasible
    perturbation (strict convexity => unique optimum)."""
    rng = np.random.default_rng(5500 + seed)
    T = int(rng.integers(8, 120))
    order = int(rng.choice([1, 2, 3]))
    gamma = 10.0 ** rng.uniform(-2, 6)
    x = 10.0 ** rng.uniform(-2, 2) * rng.standard_normal(T)
    y = np.asarray(tikhonov_smooth(jnp.asarray(x), order, gamma), float)

    D = np.eye(T)
    for _ in range(order):
        D = D[1:] - D[:-1]
    A = np.eye(T) + gamma * (D.T @ D)
    res = A @ y - x
    assert np.linalg.norm(res) <= 1e-8 * (
        np.linalg.norm(A, 2) * np.linalg.norm(y) + np.linalg.norm(x))

    def obj(v):
        return np.sum((v - x) ** 2) + gamma * np.sum((D @ v) ** 2)
    assert obj(y) <= obj(x) * (1 + 1e-12) + 1e-12
    pert = y + rng.standard_normal(T) * (np.abs(y).max() + 1e-12) * 0.01
    assert obj(y) <= obj(pert) * (1 + 1e-12) + 1e-12


def oracle_sliding(x, w, stat):
    """Loop transcription of OSET BaseLine1(x, w, 'mn'/'md') as mirrored by
    ops/smoothing.py: centered window [t - w//2, t + (w+1)//2) truncated at
    the boundaries."""
    T = len(x)
    out = np.empty(T)
    for t in range(T):
        seg = [x[k] for k in range(max(0, t - w // 2),
                                   min(T, t + (w + 1) // 2))]
        out[t] = float(np.mean(seg)) if stat == "mn" else float(np.median(seg))
    return out


@pytest.mark.parametrize("seed", range(4))
def test_sliding_and_dispatch_fuzz(seed):
    rng = np.random.default_rng(5600 + seed)
    T = int(rng.integers(5, 150))
    w = int(rng.integers(2, 14))   # w=1 makes MOVINGMEDIAN's half-window
    # degenerate (empty slices) — not a reference configuration
    x = rng.standard_normal(T) * 10.0 ** rng.uniform(-2, 2)
    np.testing.assert_allclose(sliding_mean(x, w), oracle_sliding(x, w, "mn"),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_array_equal(sliding_median(x, w),
                                  oracle_sliding(x, w, "md"))
    # dispatch parity (testSIModelOptimalControl04EKS.m:118-135): each enum
    # routes to the matching primitive, incl. MOVINGMEDIAN's two-pass
    np.testing.assert_array_equal(np.asarray(smooth_series(x, "BYPASS")), x)
    np.testing.assert_allclose(
        np.asarray(smooth_series(x, "MOVINGAVERAGE-NONCAUSAL", win=w)),
        oracle_sliding(x, w, "mn"), rtol=1e-12, atol=1e-12)
    med = oracle_sliding(x, w // 2, "md")
    np.testing.assert_allclose(
        np.asarray(smooth_series(x, "MOVINGMEDIAN", win=w)),
        oracle_sliding(np.asarray(med), w, "mn"), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(smooth_series(x, "MOVINGAVERAGE-CAUSAL", win=max(1, w))),
        oracle_causal_ma(x, max(1, w)), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("seed", range(6))
def test_batch_pack_fuzz(seed):
    """Ragged random regions through preprocess_region + build_region_batch:
    the padding semantics the batched EKF relies on (NaN observation pads =>
    pure prediction; R_v pads repeat the per-region mean per
    TrainPredictPrescribeNPI.m:360; NPIs and cumulative deaths hold their
    last level) plus the per-field assembly of preprocess_region itself."""
    rng = np.random.default_rng(5700 + seed)
    R = int(rng.integers(1, 5))
    P = int(rng.integers(1, 13))
    horizon = int(rng.integers(0, 30))
    obs_type = str(rng.choice(["NEWCASES", "TOTALCASES"]))
    win = int(rng.choice([1, 3, 7]))
    sers, names, raw = [], [], []
    for r in range(R):
        T = int(rng.integers(2, 160))
        conf = np.abs(_hostile_confirmed(rng, T))
        deaths = (np.nancumsum(conf) * 0.01 if rng.random() < 0.5 else None)
        npis = rng.integers(0, 4, size=(T, P)).astype(float)
        npis[rng.random((T, P)) < 0.2] = np.nan
        pop = 10.0 ** rng.uniform(4, 8)
        s = preprocess_region(conf, deaths, npis, pop, smoothing_win=win)
        sers.append(s)
        names.append(f"r{r}")
        raw.append((conf, deaths, npis, pop, T))

        # per-field assembly: smoothed new cases == causal MA of the cleaned
        # series; cumulative = cumsum of smoothed; normalization by pop
        nc_ref, _ = oracle_clean(conf)
        np.testing.assert_allclose(s.new_cases_smoothed,
                                   oracle_causal_ma(nc_ref, win), rtol=1e-10,
                                   atol=1e-12)
        np.testing.assert_allclose(s.new_cases_smoothed_norm,
                                   s.new_cases_smoothed / pop, rtol=1e-15)
        np.testing.assert_allclose(s.confirmed_smoothed_norm,
                                   np.cumsum(s.new_cases_smoothed) / pop,
                                   rtol=1e-12, atol=1e-300)
        assert np.all(s.obs_noise_var >= 0)

    batch = build_region_batch(sers, names, obs_type=obs_type,
                               horizon=horizon)
    Tmax = max(t for *_, t in raw)
    assert batch.observations.shape == (R, Tmax + horizon)
    for r, (s, (conf, deaths, npis, pop, T)) in enumerate(zip(sers, raw)):
        L = int(batch.length[r])
        assert L == T
        sel = (s.new_cases_smoothed_norm if obs_type == "NEWCASES"
               else s.confirmed_smoothed_norm)
        np.testing.assert_array_equal(batch.observations[r, :L], sel)
        assert np.all(np.isnan(batch.observations[r, L:]))
        np.testing.assert_array_equal(batch.npis[r, :L],
                                      forward_fill_npis(npis))
        np.testing.assert_array_equal(
            batch.npis[r, L:], np.broadcast_to(batch.npis[r, L - 1],
                                               batch.npis[r, L:].shape))
        np.testing.assert_allclose(batch.obs_noise_var[r, L:],
                                   s.obs_noise_var.mean(), rtol=1e-15)
        np.testing.assert_array_equal(batch.confirmed_deaths[r, L:],
                                      batch.confirmed_deaths[r, L - 1])
