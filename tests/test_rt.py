"""Rt estimator tests: exact recovery on clean exponentials, cross-method
agreement (the reference's validation style, SURVEY.md §4 #3), and numpy-loop
golden comparisons for the windowed closed forms."""

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.rt import (
    rt_expfit_gen_ratios, rt_expfit_log_lin_reg, rt_expfit_nonlin_ls,
    rt_expfit_ekf)


def make_exp_series(T=120, lam=0.03, A0=10.0):
    t = np.arange(T)
    return A0 * np.exp(lam * t)


def test_gen_ratios_exact_on_exponential():
    lam = 0.04
    x = make_exp_series(100, lam)
    Rt, Lambda, Rts, Lams = rt_expfit_gen_ratios(x, wlen=7,
                                                 generation_period=3,
                                                 time_unit=1.0)
    np.testing.assert_allclose(np.asarray(Lambda[3:]), lam, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(Rt[3:]), np.exp(lam), rtol=1e-9)


def numpy_log_lin_reg(x, wlen, time_unit, causal=True):
    x = np.asarray(x, float)
    L = len(x)
    logx = np.log(x)
    ALog = np.zeros(L)
    r = np.zeros(L)
    if causal:
        n = np.arange(-wlen + 1, 1, dtype=float)
        En, En2 = n.mean(), (n ** 2).mean()
        Det = En2 - En ** 2
        for mm in range(wlen - 1, L):
            seg = logx[mm - wlen + 1: mm + 1]
            ALog[mm] = (seg.mean() * En2 - (n * seg).mean() * En) / Det
            r[mm] = ((n * seg).mean() - seg.mean() * En) / Det
    else:
        half = wlen // 2
        n = np.arange(-half, half + 1, dtype=float)
        En, En2 = n.mean(), (n ** 2).mean()
        Det = En2 - En ** 2
        for mm in range(half, L - half):
            seg = logx[mm - half: mm + half + 1]
            ALog[mm] = (seg.mean() * En2 - (n * seg).mean() * En) / Det
            r[mm] = ((n * seg).mean() - seg.mean() * En) / Det
    A = np.exp(ALog)
    Rt = np.exp(r)
    return Rt, A, r / time_unit, A * Rt


@pytest.mark.parametrize("causal", [True, False])
def test_log_lin_reg_matches_numpy(causal):
    rng = np.random.default_rng(0)
    x = make_exp_series(90, 0.02) * np.exp(0.05 * rng.standard_normal(90))
    got = rt_expfit_log_lin_reg(jnp.asarray(x), 14, 1.0, causal=causal)
    ref = numpy_log_lin_reg(x, 14, 1.0, causal=causal)
    for g, rr in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), rr, rtol=1e-9, atol=1e-12)


def test_nonlin_ls_recovers_growth():
    lam = 0.05
    x = make_exp_series(80, lam, A0=20.0)
    Rt, A, Lambda, Fit = rt_expfit_nonlin_ls(jnp.asarray(x), 14, 1.0)
    np.testing.assert_allclose(np.asarray(Lambda[20:]), lam, rtol=1e-5)


def test_nonlin_ls_skips_zero_windows():
    x = make_exp_series(60, 0.03)
    x[25] = 0.0
    Rt, A, Lambda, Fit = rt_expfit_nonlin_ls(jnp.asarray(x), 10, 1.0)
    Lambda = np.asarray(Lambda)
    # windows overlapping the zero are skipped => lambda exactly 0 there
    assert np.all(Lambda[25:35] == 0.0)
    np.testing.assert_allclose(Lambda[45:], 0.03, rtol=1e-5)


def numpy_gen_ratios(x, wlen, generation_period, time_unit):
    """Independent loop transcription of Tools/Rt_ExpFitGenRatios.m:9-15."""
    x = np.asarray(x, float)
    T = len(x)
    gp = generation_period
    lam = np.zeros(T)
    for t in range(gp, T):
        lam[t] = np.log(x[t] / x[t - gp]) / gp
    lam_s = np.zeros(T)
    padded = np.concatenate([np.zeros(wlen - 1), lam])
    for t in range(T):
        lam_s[t] = padded[t:t + wlen].mean()
    return (np.exp(lam * time_unit), lam,
            np.exp(lam_s * time_unit), lam_s)


def _fuzz_series(rng, T, allow_zeros=False):
    """Piecewise-exponential case series with multiplicative noise; the
    cumulative log-drift is rescaled into a safe dynamic range."""
    n_seg = int(rng.integers(2, 5))
    bounds = np.sort(rng.choice(np.arange(1, T), n_seg - 1, replace=False))
    lam = np.repeat(rng.uniform(-0.12, 0.2, n_seg),
                    np.diff(np.concatenate([[0], bounds, [T]])))
    logx = np.log(10.0 ** rng.uniform(0, 2)) + np.cumsum(lam)
    span = logx.max() - logx.min()
    if span > 12.0:
        logx = logx * (12.0 / span)
    x = np.exp(logx + 10.0 ** rng.uniform(-3, -1) * rng.standard_normal(T))
    if allow_zeros:
        for _ in range(int(rng.integers(1, 4))):
            x[int(rng.integers(0, T))] = 0.0
    return x


@pytest.mark.parametrize("seed", range(6))
def test_rt_closedform_fuzz(seed):
    """Randomized series vs independent NumPy loop oracles for the two
    closed-form estimators (window conventions, prefill values, causal and
    non-causal variants), plus certificates for the windowed nonlinear LS:
    zero-windows map to (A=raw, r=0) exactly and every fitted window's SSE
    is no worse than its initial guess's (the LM accepts only improving
    steps; a window-indexing bug would break the mapping)."""
    rng = np.random.default_rng(4200 + seed)
    T = int(rng.integers(80, 220))
    x = _fuzz_series(rng, T)
    wlen = int(rng.integers(7, 22))
    gp = int(rng.integers(2, 8))
    tu = float(rng.choice([1.0, 0.5, 7.0]))

    got = rt_expfit_gen_ratios(x, wlen, gp, tu)
    ref = numpy_gen_ratios(x, wlen, gp, tu)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-9, atol=1e-12)

    for causal in (True, False):
        got = rt_expfit_log_lin_reg(jnp.asarray(x), wlen, tu, causal=causal)
        ref = numpy_log_lin_reg(x, wlen, tu, causal=causal)
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), r, rtol=1e-8,
                                       atol=1e-10)

    # nonlinear LS certificates on a zero-poked series (causal windows)
    xz = _fuzz_series(rng, T, allow_zeros=True)
    Rt, A, Lam, Fit = rt_expfit_nonlin_ls(jnp.asarray(xz), wlen, tu)
    A = np.asarray(A)
    r = np.asarray(Lam) * tu
    n = np.arange(-wlen + 1, 1, dtype=float)
    for s0 in range(0, T - wlen + 1):
        w = xz[s0:s0 + wlen]
        out = s0 + wlen - 1
        if np.any(w == 0):
            assert A[out] == w[-1] and r[out] == 0.0
            continue
        sse_fit = np.sum((w - A[out] * np.exp(r[out] * n / tu)) ** 2)
        sse_init = np.sum((w - xz[out]) ** 2)      # A0 = x[out], r0 = 0
        assert sse_fit <= sse_init * (1 + 1e-9) + 1e-12


@pytest.mark.parametrize("order", [1, 2])
def test_ekf_rt_tracks_exponential(order):
    lam = 0.025
    T = 150
    x = make_exp_series(T, lam, A0=5.0)
    res = rt_expfit_ekf(
        jnp.asarray(x), s_init=jnp.array([5.0, 0.0]), time_scale=1.0,
        alpha=1.0, sigma=1.0, w_bar=jnp.zeros(2), v_bar=jnp.zeros(1),
        Ps_init=jnp.diag(jnp.array([1.0, 0.1])),
        Q_w=jnp.diag(jnp.array([1e-2, 1e-4])), R_v=jnp.array([[1e-2]]),
        order=order)
    lam_est = np.asarray(res.s_smooth[:, 1])
    assert abs(np.median(lam_est[T // 2:]) - lam) < 5e-3


def test_cross_method_agreement():
    """All four estimators must agree on the growth rate of a clean
    exponential (test01FitExponential.m-style cross-validation)."""
    lam = 0.03
    T = 120
    x = make_exp_series(T, lam)
    _, l_gr, _, _ = rt_expfit_gen_ratios(x, 7, 3, 1.0)
    _, _, l_lr, _ = rt_expfit_log_lin_reg(jnp.asarray(x), 14, 1.0)
    _, _, l_ls, _ = rt_expfit_nonlin_ls(jnp.asarray(x), 14, 1.0)
    res = rt_expfit_ekf(
        jnp.asarray(x), s_init=jnp.array([10.0, 0.0]), time_scale=1.0,
        alpha=1.0, sigma=1.0, w_bar=jnp.zeros(2), v_bar=jnp.zeros(1),
        Ps_init=jnp.diag(jnp.array([1.0, 0.1])),
        Q_w=jnp.diag(jnp.array([1e-2, 1e-4])), R_v=jnp.array([[1e-2]]))
    sl = slice(T // 2, None)
    for est in (np.asarray(l_gr)[sl], np.asarray(l_lr)[sl],
                np.asarray(l_ls)[sl], np.asarray(res.s_smooth[sl, 1])):
        assert abs(np.median(est) - lam) < 5e-3


def test_second_order_ekf_matches_oracle():
    """Order-2 EKF golden parity: the JAX rt estimator (pre-generic options)
    vs the NumPy oracle running the same trace-based Hessian corrections."""
    from tests import oracle_ekf
    rng = np.random.default_rng(0)
    T = 80
    lam = 0.03
    x = 5.0 * np.exp(lam * np.arange(T)) * np.exp(
        0.02 * rng.standard_normal(T))
    ts, al, sg = 1.0, 1.0, 1.0
    s_init = np.array([5.0, 0.0])
    Ps_init = np.diag([1.0, 0.1])
    Q = np.diag([1e-2, 1e-4])
    R = np.array([[1e-2]])
    w_bar = np.zeros(2)
    v_bar = np.zeros(1)

    res = rt_expfit_ekf(jnp.asarray(x), s_init=jnp.asarray(s_init),
                        time_scale=ts, alpha=al, sigma=sg,
                        w_bar=jnp.asarray(w_bar), v_bar=jnp.asarray(v_bar),
                        Ps_init=jnp.asarray(Ps_init), Q_w=jnp.asarray(Q),
                        R_v=jnp.asarray(R), beta=1.0, gamma=1.0, order=2)

    handles = oracle_ekf.rt_expfit_handles(ts, al, sg)
    ref = oracle_ekf.generic_ekf(
        np.zeros((1, T)), x.reshape(1, -1), handles, None, s_init, Ps_init,
        np.full(2, np.nan), np.full((2, 2), np.nan), w_bar, v_bar, Q, R,
        1.0, 1.0, 21, 2)
    (u_opt, u_sm, S_MINUS, S_PLUS, S_SMOOTH, *_rest) = ref
    # forward states match tightly; the oracle smoother uses pinv while the
    # rt estimator uses the pre-generic solve, so smoothed states are looser
    np.testing.assert_allclose(np.asarray(res.s_plus), S_PLUS.T,
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.s_smooth), S_SMOOTH.T,
                               rtol=1e-4, atol=1e-7)
