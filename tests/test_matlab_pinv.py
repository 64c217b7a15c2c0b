"""Unit pins for the MATLAB-exact pinv tolerance in the smoother gain.

MATLAB pinv.m keeps singular values STRICTLY ABOVE
tol = max(size(A)) * eps(norm(A)), where eps(x) = spacing at x and
norm(A) = sigma_max. jnp.linalg.pinv's default cutoff
(10*max(m,n)*eps*sigma_max) is ~10x coarser; at cond(P-) ~ 1e15 the two
rules keep different singular-value sets and the smoother gain diverges
O(1) (GEKF.m:215 uses pinv; the divergence was found by the extended
fuzz soak — see PARITY.md). These tests pin the rule itself so a future
"simplification" back to library defaults fails immediately.
"""

import numpy as np
import jax.numpy as jnp

from epidemicmodeling_tpu.ops.ekf import _matlab_pinv
from tests.oracle_ekf import matlab_pinv


def _rand_spd(rng, n, cond):
    """SPD matrix with prescribed condition number (log-spaced spectrum)."""
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(cond), n)
    return (q * s) @ q.T


def test_matches_oracle_well_conditioned():
    rng = np.random.default_rng(0)
    for n in (3, 6):
        for _ in range(10):
            A = _rand_spd(rng, n, 1e6)
            got = np.asarray(_matlab_pinv(jnp.asarray(A)))
            ref = matlab_pinv(A)
            np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_matches_oracle_at_knife_edge_conditioning():
    """cond ~ 1/eps64: exactly where the cutoff rule decides the result."""
    rng = np.random.default_rng(1)
    for cond in (1e14, 1e15, 1e16):
        for k in range(5):
            A = _rand_spd(rng, 6, cond)
            got = np.asarray(_matlab_pinv(jnp.asarray(A)))
            ref = matlab_pinv(A)
            # the KEPT singular-value sets must be identical, so the two
            # pinvs agree to rounding relative to their norm
            scale = max(np.abs(ref).max(), 1.0)
            assert np.abs(got - ref).max() / scale < 1e-9, (cond, k)


def test_strict_cutoff_boundary():
    """A singular value EXACTLY at tol is dropped (strict >), just above
    it is kept — pin the boundary direction explicitly."""
    n = 4
    s_max = 1.0
    tol = n * np.spacing(s_max)
    for delta, kept in ((0.0, False), (2.0 * tol, True)):
        s = np.array([s_max, 0.5, 0.25, tol + delta])
        A = np.diag(s)
        got = np.asarray(_matlab_pinv(jnp.asarray(A)))
        ref = matlab_pinv(A)
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=0)
        if kept:
            # ~1/s4 = 1/(3*tol): the tiny value inverted, not zeroed
            assert got[3, 3] > 0.9 / (3.0 * tol)
        else:
            assert got[3, 3] == 0.0       # truncated direction zeroed


def test_rank_deficient_zero_directions():
    rng = np.random.default_rng(2)
    B = rng.standard_normal((6, 3))
    A = B @ B.T  # rank 3
    got = np.asarray(_matlab_pinv(jnp.asarray(A)))
    ref = matlab_pinv(A)
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)
    # Moore-Penrose identities on the rank-deficient input
    np.testing.assert_allclose(A @ got @ A, A, atol=1e-10)
    np.testing.assert_allclose(got @ A @ got, got, atol=1e-10)


def test_finer_than_library_default_at_high_cond():
    """Document the motivating difference: when sigma_min/sigma_max falls
    between MATLAB's cutoff (~max(size)*eps) and jnp.linalg.pinv's
    (~10*max(m,n)*eps), MATLAB keeps a direction the library default
    truncates — for 6x6 that window is cond in (7.5e13, 7.5e14)."""
    rng = np.random.default_rng(3)
    hit = 0
    for k in range(20):
        A = _rand_spd(rng, 6, 2e14)
        ours = np.asarray(_matlab_pinv(jnp.asarray(A)))
        lib = np.asarray(jnp.linalg.pinv(jnp.asarray(A)))
        ref = matlab_pinv(A)
        scale = max(np.abs(ref).max(), 1.0)
        assert np.abs(ours - ref).max() / scale < 1e-9
        if np.abs(lib - ref).max() / scale > 1e-3:
            hit += 1
    assert hit > 0, "expected the library default to diverge at cond~5e15"
