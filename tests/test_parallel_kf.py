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
