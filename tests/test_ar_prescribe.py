"""AR model + standalone prescriptor tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.ops.ar import ar_fit, ar_fit_burg, ar_forecast
from epidemicmodeling_tpu.pipelines.prescribe import (
    new_case_ekf_optimal_npi, ar_alpha_prescription)
from epidemicmodeling_tpu.models import si_alpha_backward_ekf_system
from epidemicmodeling_tpu.ops import backward_ekf_smoother


def test_ar_fit_recovers_ar2():
    rng = np.random.default_rng(0)
    a_true = np.array([-1.5, 0.7])  # y[t] = 1.5 y[t-1] - 0.7 y[t-2] + e
    T = 4000
    y = np.zeros(T)
    e = 0.1 * rng.standard_normal(T)
    for t in range(2, T):
        y[t] = -a_true[0] * y[t - 1] - a_true[1] * y[t - 2] + e[t]
    a, nv = ar_fit(jnp.asarray(y), 2)
    np.testing.assert_allclose(np.asarray(a), a_true, atol=0.03)
    assert abs(float(nv) - 0.01) < 0.002
    a_b, nv_b = ar_fit_burg(jnp.asarray(y), 2)
    np.testing.assert_allclose(np.asarray(a_b), a_true, atol=0.03)


def test_ar_forecast_continues_sinusoid():
    # an AR(2) with complex poles models a damped oscillation exactly
    t = np.arange(200)
    y = np.cos(0.2 * t)
    a, nv = ar_fit(jnp.asarray(y), 2)
    pred = ar_forecast(jnp.asarray(y), a, 0.0, 20, key=None)
    truth = np.cos(0.2 * (200 + np.arange(20)))
    np.testing.assert_allclose(np.asarray(pred), truth, atol=1e-3)


def _stable_ar_poly(rng, p):
    """Draw a guaranteed-stable AR(p) polynomial via random reflection
    coefficients |k| < 1 run through the Levinson step-up recursion (the
    same update ar_fit_burg uses, so |roots| <= max|k| bound holds)."""
    a = np.zeros(p)
    for m in range(p):
        k = rng.uniform(-0.9, 0.9)
        a[:m] = a[:m] + k * a[:m][::-1]
        a[m] = k
    return a


def _simulate_ar(rng, a, T, noise_std):
    p = len(a)
    burn = 8 * p + 50
    e = noise_std * rng.standard_normal(T + burn)
    y = np.zeros(T + burn)
    for t in range(p, T + burn):
        y[t] = -np.dot(a, y[t - p:t][::-1]) + e[t]
    return y[burn:]


def _fb_design(y, p):
    """NumPy float64 twin of ar_fit's forward-backward stacked design
    (predict y[t] from y[t-1..t-p] forward AND y[t+1..t+p] backward)."""
    T = len(y)
    idx = np.arange(p, T)
    F = np.stack([y[idx - i] for i in range(1, p + 1)], axis=1)
    bf = y[idx]
    idx_b = np.arange(0, T - p)
    B = np.stack([y[idx_b + i] for i in range(1, p + 1)], axis=1)
    bb = y[idx_b]
    return np.concatenate([F, B], axis=0), np.concatenate([bf, bb], axis=0)


@pytest.mark.parametrize("seed", range(6))
def test_ar_fuzz(seed):
    """Randomized AR-layer fuzz: optimality certificates for the fb fit
    (regularized normal-equations residual + objective no worse than the
    true coefficients'), Burg stability (all roots inside the unit
    circle, nonnegative prediction-error power), and exact zero-noise
    forecast parity with a NumPy recursion. Mirrors the reference usage
    Tools/PrescribeNPI.m:202-214 (MATLAB ``ar`` default = fb LS)."""
    rng = np.random.default_rng(7000 + seed)
    p = int(rng.choice([2, 3, 4, 8, 12, 24]))
    T = int(rng.integers(10 * p + 40, 400))
    a_true = _stable_ar_poly(rng, p)
    noise_std = 10.0 ** rng.uniform(-2.0, 0.0)
    y = _simulate_ar(rng, a_true, T, noise_std)

    a_fit, nv = ar_fit(jnp.asarray(y), p, "fb")
    a_fit = np.asarray(a_fit, float)
    c_fit = -a_fit

    # (1) optimality certificate on the regularized normal equations:
    # c solves (G + lam I) c = X^T t with lam = 1e-12 tr(G)/p
    X, t_vec = _fb_design(y, p)
    G = X.T @ X
    lam = 1e-12 * np.trace(G) / p
    rhs = X.T @ t_vec
    res = (G + lam * np.eye(p)) @ c_fit - rhs
    scale = np.linalg.norm(G, ord=2) * np.linalg.norm(c_fit) + \
        np.linalg.norm(rhs)
    assert np.linalg.norm(res) <= 1e-9 * scale

    # (2) the fitted objective beats the true coefficients' (LS optimality)
    def obj(c):
        return np.sum((t_vec - X @ c) ** 2) + lam * np.sum(c ** 2)
    assert obj(c_fit) <= obj(-a_true) * (1 + 1e-12) + 1e-12

    # (3) noise_var is the mean squared residual of the stacked system
    np.testing.assert_allclose(float(nv), np.mean((t_vec - X @ c_fit) ** 2),
                               rtol=1e-10)

    # (4) Burg: stable poly (all roots of z^p + a1 z^{p-1} + .. + ap inside
    # the closed unit circle) and nonnegative prediction-error power
    a_b, E_b = ar_fit_burg(jnp.asarray(y), p)
    a_b = np.asarray(a_b, float)
    roots = np.roots(np.concatenate([[1.0], a_b]))
    assert np.max(np.abs(roots)) <= 1.0 + 1e-8
    assert float(E_b) >= -1e-15

    # (5) zero-noise forecast == NumPy recursion; keyed forecast is
    # deterministic in the key
    n_ahead = int(rng.integers(5, 40))
    pred = np.asarray(ar_forecast(jnp.asarray(y), a_fit, float(nv), n_ahead))
    state = list(y[-p:][::-1])
    ref = []
    for _ in range(n_ahead):
        y_t = -np.dot(a_fit, state)
        ref.append(y_t)
        state = [y_t] + state[:-1]
    np.testing.assert_allclose(pred, np.array(ref), rtol=1e-9,
                               atol=1e-12 * max(1.0, np.abs(y).max()))
    key = jax.random.PRNGKey(seed)
    p1 = np.asarray(ar_forecast(jnp.asarray(y), a_fit, float(nv), n_ahead,
                                key=key))
    p2 = np.asarray(ar_forecast(jnp.asarray(y), a_fit, float(nv), n_ahead,
                                key=key))
    np.testing.assert_array_equal(p1, p2)


def test_new_case_ekf_runs_and_prescribes():
    from epidemicmodeling_tpu.models import SIAlphaParams
    P = 12
    T, T_hist = 80, 60
    rng = np.random.default_rng(1)
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    obs = np.abs(rng.normal(1e-4, 2e-5, T))
    obs[T_hist:] = np.nan
    u = rng.integers(0, 3, (T, P)).astype(float)
    u[T_hist:] = np.nan
    pr = SIAlphaParams(dt=1.0, beta=0.2, gamma=1 / 7, a=0.004 * rng.random(P),
                       b=0.05, u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
                       i_min=1e-6, alpha_min=1e-8, alpha_max=100.0,
                       epsilon=0.3, w=np.ones(P), sigma=1e6)
    res = new_case_ekf_optimal_npi(
        jnp.asarray(u), jnp.asarray(obs), pr,
        jnp.array([0.999, 1e-4, 0.3, 0, 0, 0.0]),
        jnp.diag(jnp.array([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])),
        jnp.array([np.nan, np.nan, np.nan, 0, 0, 0.0]),
        jnp.full((6, 6), np.nan).at[3, 3].set(1e-8).at[4, 4].set(1e-8)
        .at[5, 5].set(1e-8),
        Q=jnp.diag(jnp.array([1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8])),
        R=jnp.full(T, 4e-10))
    u_pres = np.asarray(res.u_opt_smooth[T_hist:-1])
    assert np.all((u_pres == 0) | (u_pres == u_max[None, :]))
    assert np.isfinite(np.asarray(res.s_smooth)).all()


def test_ar_alpha_prescription_end_to_end():
    rng = np.random.default_rng(2)
    T = 200
    alpha_train = 0.2 + 0.05 * np.sin(0.05 * np.arange(T)) \
        + 0.005 * rng.standard_normal(T)
    P = 12
    res = ar_alpha_prescription(
        jnp.asarray(alpha_train), a_coef=0.004 * rng.random(P), b_coef=0.05,
        beta_model=0.2, gamma_model=1 / 7, npi_mins=np.zeros(P),
        npi_maxes=np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4]),
        npi_weights=np.ones(P), s0=0.99, i0=1e-3, n_ahead=30,
        n_monte_carlo=8, key=jax.random.PRNGKey(0))
    assert res.alpha_forecast.shape == (30,)
    assert res.J0_random.shape == (8,)
    assert np.isfinite(np.asarray(res.J0_random)).all()
    # forecast stays in a sane range around the training mean
    assert 0.0 < float(np.mean(np.asarray(res.alpha_forecast))) < 0.5


def test_backward_ekf_round_trip():
    """Backward filtering on a deterministic trajectory: given the terminal
    state as the (flipped) initial condition, the backward filter must track
    the trajectory in reverse."""
    from epidemicmodeling_tpu.models import si_alpha_controlled_rollout, \
        SIAlphaParams
    P = 12
    T = 150
    rng = np.random.default_rng(3)
    u = rng.integers(0, 3, (T, P)).astype(float)
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    a = 0.004 * rng.random(P)
    s, i, al = si_alpha_controlled_rollout(
        u, 0.99, 1e-3, 0.3, u_max, 1e-8, 100.0, 1 / 7, a, 0.15, 0.2,
        0.0, 0.0, 0.0, T, 1.0)
    obs = np.asarray(s * i * al)
    pr = SIAlphaParams(dt=1.0, beta=0.2, gamma=1 / 7, a=a, b=0.15,
                       u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
                       i_min=1e-6, alpha_min=1e-8, alpha_max=100.0)
    s_term = jnp.array([float(s[-1]), float(i[-1]), float(al[-1])])
    res = backward_ekf_smoother(
        si_alpha_backward_ekf_system(), jnp.asarray(u), jnp.asarray(obs),
        pr, s_init=jnp.full(3, jnp.nan), Ps_init=jnp.full((3, 3), jnp.nan),
        s_final=s_term, Ps_final=jnp.diag(jnp.array([1e-6, 1e-8, 1e-2])),
        Q=jnp.diag(jnp.array([1e-10, 1e-10, 1e-5])), R=jnp.full(T, 1e-12))
    # note: backward wrapper swaps init/final, so s_final acts as the
    # (time-flipped) initial condition. The filtered states tracked in
    # reverse must reproduce the trajectory.
    i_err = np.abs(np.asarray(res.s_plus[:, 1]) - np.asarray(i))
    assert np.median(i_err[20:-20] / np.asarray(i)[20:-20]) < 0.1


def test_backward_costate_prescribes_bang_bang():
    """Backward 6-state optimal-control filter: the time-reversed variant
    must also fill NaN inputs with bang-bang prescriptions
    (Tools/SIAlphaModelBackwardEKFOptControlled.m)."""
    from epidemicmodeling_tpu.models import (
        si_alpha_costate_backward_ekf_system, SIAlphaParams)
    P = 12
    T, T_hist = 90, 60
    rng = np.random.default_rng(5)
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    obs = np.abs(rng.normal(1e-4, 2e-5, T))
    u = rng.integers(0, 3, (T, P)).astype(float)
    u[T_hist:] = np.nan
    obs[T_hist:] = np.nan
    pr = SIAlphaParams(dt=1.0, beta=0.2, gamma=1 / 7,
                       a=0.004 * rng.random(P), b=0.05, u_min=np.zeros(P),
                       u_max=u_max, s_min=1e-6, i_min=1e-6, alpha_min=1e-8,
                       alpha_max=100.0, epsilon=0.3, w=np.ones(P), sigma=1e6)
    res = backward_ekf_smoother(
        si_alpha_costate_backward_ekf_system(), jnp.asarray(u),
        jnp.asarray(obs), pr,
        s_init=jnp.array([0.999, 1e-4, 0.3, 0, 0, 0.0]),
        Ps_init=jnp.diag(jnp.array([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])),
        s_final=jnp.array([0.99, 1e-4, 0.3, 0, 0, 0.0]),
        Ps_final=jnp.diag(jnp.array([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])),
        Q=jnp.diag(jnp.array([1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8])),
        R=jnp.full(T, 4e-10))
    # filled inputs over the NaN region sit at a bound; states finite
    u_filled = np.asarray(res.u_opt)[T_hist:]
    assert np.all((u_filled == 0.0) | (u_filled == u_max[None, :]))
    assert np.isfinite(np.asarray(res.s_plus)).all()


def test_backward_ekf_matches_oracle():
    """Backward 3-state wrapper vs the oracle's flip protocol + flipped
    handles (SIAlphaModelBackwardEKF.m transcription), 1e-9."""
    from tests import oracle_ekf
    from epidemicmodeling_tpu.models import SIAlphaParams

    P, T = 12, 80
    rng = np.random.default_rng(11)
    u = rng.integers(0, 3, (T, P)).astype(float)
    obs = np.abs(rng.normal(1e-4, 3e-5, T))
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    pr = dict(dt=1.0, beta=0.2, gamma=1 / 7, a=0.004 * rng.random(P),
              b=0.05, u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
              i_min=1e-6, alpha_min=1e-8, alpha_max=100.0)
    params = SIAlphaParams(**pr)
    s_init = np.array([0.99, 1e-3, 0.3])
    Ps_init = np.diag([1e-4, 1e-6, 0.1])
    s_final = np.array([0.9, 5e-3, 0.25])
    Ps_final = np.diag([1e-4, 1e-6, 0.1])
    Q = np.diag([1e-10, 1e-10, 1e-5])
    R_v = np.full((1, 1, T), 1e-12)

    res = backward_ekf_smoother(
        si_alpha_backward_ekf_system(), jnp.asarray(u), jnp.asarray(obs),
        params, s_init=jnp.asarray(s_init), Ps_init=jnp.asarray(Ps_init),
        s_final=jnp.asarray(s_final), Ps_final=jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.full(T, 1e-12), gamma_discount=0.995)

    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.backward_generic_ekf(
        u.T, obs.reshape(1, -1), oracle_ekf.si_alpha_backward_handles(),
        pr_np, s_init, Ps_init, s_final, Ps_final, np.zeros(3),
        np.zeros(1), Q, R_v, 1.0, 0.995, 21, 1)
    np.testing.assert_allclose(np.asarray(res.s_plus), ref[3].T,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.s_smooth), ref[4].T,
                               rtol=1e-9, atol=1e-12)


def test_backward_costate_ekf_matches_oracle():
    """Backward 6-state opt-controlled wrapper vs the oracle transcription
    of SIAlphaModelBackwardEKFOptControlled.m (incl. bang-bang fill)."""
    from tests import oracle_ekf
    from epidemicmodeling_tpu.models import (
        si_alpha_costate_backward_ekf_system, SIAlphaParams)

    P, T, T_hist = 12, 70, 50
    rng = np.random.default_rng(12)
    u = rng.integers(0, 3, (T, P)).astype(float)
    obs = np.abs(rng.normal(1e-4, 3e-5, T))
    u[T_hist:] = np.nan
    obs[T_hist:] = np.nan
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    pr = dict(dt=1.0, beta=0.2, gamma=1 / 7, a=0.004 * rng.random(P),
              b=0.05, u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
              i_min=1e-6, alpha_min=1e-8, alpha_max=100.0, epsilon=0.3,
              w=np.ones(P), sigma=1e6)
    params = SIAlphaParams(**pr)
    s_init = np.array([0.99, 1e-3, 0.3, 0, 0, 0.0])
    Ps_init = np.diag([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])
    s_final = np.array([0.95, 2e-3, 0.25, 0, 0, 0.0])
    Ps_final = np.diag([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])
    Q = np.diag([1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8])
    R_v = np.full((1, 1, T), 4e-10)

    res = backward_ekf_smoother(
        si_alpha_costate_backward_ekf_system(), jnp.asarray(u),
        jnp.asarray(obs), params, s_init=jnp.asarray(s_init),
        Ps_init=jnp.asarray(Ps_init), s_final=jnp.asarray(s_final),
        Ps_final=jnp.asarray(Ps_final), Q=jnp.asarray(Q),
        R=jnp.full(T, 4e-10), gamma_discount=0.995)

    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.backward_generic_ekf(
        u.T, obs.reshape(1, -1),
        oracle_ekf.si_alpha_costate_backward_handles(), pr_np, s_init,
        Ps_init, s_final, Ps_final, np.zeros(6), np.zeros(1), Q, R_v,
        1.0, 0.995, 21, 1)
    np.testing.assert_allclose(np.asarray(res.s_plus), ref[3].T,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.u_opt), ref[0].T,
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(res.u_opt_smooth), ref[1].T,
                               rtol=0, atol=0)
