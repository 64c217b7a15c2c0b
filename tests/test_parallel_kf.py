"""Parallel associative-scan KF/RTS vs a sequential reference filter on the
same linear-Gaussian system (including missing-observation gaps)."""

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.ops.parallel_kf import parallel_kalman


def sequential_kf(F, Q, H, R, y, m0, P0):
    T, m = F.shape[0], F.shape[1]
    mf = np.zeros((T, m))
    Pf = np.zeros((T, m, m))
    mean, cov = np.array(m0, float), np.array(P0, float)
    mp = np.zeros((T, m))
    Pp = np.zeros((T, m, m))
    for k in range(T):
        if k > 0:
            mean = F[k] @ mean
            cov = F[k] @ cov @ F[k].T + Q[k]
        mp[k], Pp[k] = mean, cov
        if not np.any(np.isnan(y[k])):
            S = H[k] @ cov @ H[k].T + R[k]
            K = cov @ H[k].T @ np.linalg.inv(S)
            mean = mean + K @ (y[k] - H[k] @ mean)
            cov = (np.eye(m) - K @ H[k]) @ cov
        mf[k], Pf[k] = mean, cov
    # RTS smoother
    ms = mf.copy()
    Ps = Pf.copy()
    for k in range(T - 2, -1, -1):
        G = Pf[k] @ F[k + 1].T @ np.linalg.inv(Pp[k + 1])
        ms[k] = mf[k] + G @ (ms[k + 1] - mp[k + 1])
        Ps[k] = Pf[k] + G @ (Ps[k + 1] - Pp[k + 1]) @ G.T
    return mf, Pf, ms, Ps


def build_system(T=200, m=4, n=2, seed=0, gap=None):
    rng = np.random.default_rng(seed)
    A0 = np.eye(m) + 0.05 * rng.standard_normal((m, m))
    A0 = 0.97 * A0 / np.max(np.abs(np.linalg.eigvals(A0)))
    F = np.tile(A0, (T, 1, 1))
    Q = np.tile(0.01 * np.eye(m), (T, 1, 1))
    H = np.tile(rng.standard_normal((n, m)), (T, 1, 1))
    R = np.tile(0.1 * np.eye(n), (T, 1, 1))
    x = rng.standard_normal(m)
    ys = []
    for k in range(T):
        if k > 0:
            x = F[k] @ x + rng.multivariate_normal(np.zeros(m), Q[k])
        ys.append(H[k] @ x + rng.multivariate_normal(np.zeros(n), R[k]))
    y = np.stack(ys)
    if gap:
        y[gap[0]:gap[1]] = np.nan
    m0 = np.zeros(m)
    P0 = np.eye(m)
    return F, Q, H, R, y, m0, P0


def _fuzz_system(seed):
    """Randomized LGSSM: dims, time-varying dynamics, noise scales, and
    0-3 interior NaN gaps plus an optional NaN forecast tail."""
    rng = np.random.default_rng(9000 + seed)
    m = int(rng.integers(2, 7))
    n = int(rng.integers(1, 4))
    T = int(rng.integers(64, 257))

    A0 = np.eye(m) + 0.08 * rng.standard_normal((m, m))
    A0 = float(rng.uniform(0.85, 0.99)) * A0 / np.max(
        np.abs(np.linalg.eigvals(A0)))
    # mild per-step jitter keeps the system genuinely time-varying
    F = A0[None] + 0.01 * rng.standard_normal((T, m, m))
    q = 10.0 ** rng.uniform(-3, -1)
    Q = np.tile(q * np.eye(m), (T, 1, 1))
    H = np.tile(rng.standard_normal((n, m)), (T, 1, 1)) \
        + 0.01 * rng.standard_normal((T, n, m))
    r = 10.0 ** rng.uniform(-2, 0)
    R = np.tile(r * np.eye(n), (T, 1, 1))

    x = rng.standard_normal(m)
    ys = []
    for k in range(T):
        if k > 0:
            x = F[k] @ x + rng.multivariate_normal(np.zeros(m), Q[k])
        ys.append(H[k] @ x + rng.multivariate_normal(np.zeros(n), R[k]))
    y = np.stack(ys)
    for _ in range(int(rng.integers(0, 4))):
        g0 = int(rng.integers(5, T - 20))
        y[g0:g0 + int(rng.integers(2, 15))] = np.nan
    if rng.random() < 0.4:
        y[-int(rng.integers(5, 25)):] = np.nan      # forecast tail
    m0 = rng.standard_normal(m)
    P0 = np.eye(m) * 10.0 ** rng.uniform(-1, 1)
    return F, Q, H, R, y, m0, P0


@pytest.mark.parametrize("seed", range(4))
def test_parallel_kf_fuzz(seed):
    """Associative-scan filter/smoother vs the sequential NumPy reference
    on randomized time-varying systems with missing-data gaps. Tolerances
    scale with each output's magnitude (the O(log T) combination reorders
    float ops relative to the sequential recursion)."""
    F, Q, H, R, y, m0, P0 = _fuzz_system(seed)
    mf, Pf, ms, Ps = sequential_kf(F, Q, H, R, y, m0, P0)
    res = parallel_kalman(jnp.asarray(F), jnp.asarray(Q), jnp.asarray(H),
                          jnp.asarray(R), jnp.asarray(y), jnp.asarray(m0),
                          jnp.asarray(P0))
    for got, ref, rtol in [(res.means_filt, mf, 1e-7),
                           (res.covs_filt, Pf, 1e-7),
                           (res.means_smooth, ms, 1e-5),
                           (res.covs_smooth, Ps, 1e-5)]:
        scale = max(1e-12, float(np.max(np.abs(ref))))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=rtol,
                                   atol=rtol * scale)


@pytest.mark.parametrize("gap", [None, (80, 120)])
def test_parallel_matches_sequential(gap):
    F, Q, H, R, y, m0, P0 = build_system(gap=gap)
    mf, Pf, ms, Ps = sequential_kf(F, Q, H, R, y, m0, P0)
    res = parallel_kalman(jnp.asarray(F), jnp.asarray(Q), jnp.asarray(H),
                          jnp.asarray(R), jnp.asarray(y), jnp.asarray(m0),
                          jnp.asarray(P0))
    np.testing.assert_allclose(np.asarray(res.means_filt), mf,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.covs_filt), Pf,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.means_smooth), ms,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.covs_smooth), Ps,
                               rtol=1e-6, atol=1e-8)
