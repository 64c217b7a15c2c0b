"""Linear-systems analytics: observability/controllability, SEIRP
linearization, eigenstructure and the closed-form early-phase solution.

Reference behavior: testScripts/testSEIRP01.m:82-122 (obsv rank checks on the
reduced (e, i, r, p) system, full-state Jacobian, analytic eigenvalues
lambda_1..4 and early-phase I(t)/E(t)), testScripts/testModelRanks01/02.m
(observability & controllability ranks of the augmented SEIRP).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def obsv(A, C):
    """Observability matrix [C; CA; ...; CA^(n-1)] (MATLAB obsv)."""
    A = jnp.asarray(A)
    C = jnp.atleast_2d(jnp.asarray(C))
    n = A.shape[0]
    blocks = [C]
    for _ in range(n - 1):
        blocks.append(blocks[-1] @ A)
    return jnp.concatenate(blocks, axis=0)


def ctrb(A, B):
    """Controllability matrix [B, AB, ..., A^(n-1)B] (MATLAB ctrb)."""
    A = jnp.asarray(A)
    B = jnp.atleast_2d(jnp.asarray(B))
    if B.shape[0] != A.shape[0]:
        B = B.T
    n = A.shape[0]
    blocks = [B]
    for _ in range(n - 1):
        blocks.append(A @ blocks[-1])
    return jnp.concatenate(blocks, axis=1)


def seirp_early_phase_matrix(alpha_e, alpha_i, kappa, rho, beta, mu, gamma):
    """Reduced 4-state (e, i, r, p) system matrix for s ~= 1
    (testSEIRP01.m:84)."""
    return jnp.array([
        [alpha_e - kappa - rho, alpha_i, 0.0, 0.0],
        [kappa, -beta - mu, 0.0, 0.0],
        [rho, beta, -gamma, 0.0],
        [0.0, mu, 0.0, 0.0],
    ])


def seirp_jacobian(e, i, r, p, alpha_e, alpha_i, kappa, rho, beta, mu, gamma):
    """Jacobian of the reduced system at an arbitrary operating point with
    s = 1 - e - i - r - p (testSEIRP01.m:91-103)."""
    s = 1.0 - e - i - r - p
    A = np.zeros((4, 4))
    A[0, 0] = alpha_e * (s - e) - alpha_i * i - kappa - rho
    A[0, 1] = alpha_i * (s - i) - alpha_e * e
    A[0, 2] = -alpha_e * e - alpha_i * i
    A[0, 3] = -alpha_e * e - alpha_i * i
    A[1, 0] = kappa
    A[1, 1] = -beta - mu
    A[2, 0] = rho
    A[2, 1] = beta
    A[2, 2] = -gamma
    A[3, 1] = mu
    return jnp.asarray(A)


def seirp_early_eigen(alpha_e, alpha_i, kappa, rho, beta, mu, gamma):
    """Closed-form eigenvalues of the early-phase system
    (testSEIRP01.m:106-112): lambda1 = 0, lambda2 = -gamma,
    lambda3/4 = (delta - beta - mu +/- sqrt((beta+mu+delta)^2 +
    4*kappa*alpha_i)) / 2 with delta = alpha_e - kappa - rho."""
    delta = alpha_e - kappa - rho
    disc = jnp.sqrt((beta + mu + delta) ** 2 + 4.0 * kappa * alpha_i)
    lam3 = (delta - beta - mu + disc) / 2.0
    lam4 = (delta - beta - mu - disc) / 2.0
    return jnp.array([0.0, -gamma, lam3, lam4])


def seirp_early_closed_form(t, e0, alpha_e, alpha_i, kappa, rho, beta, mu,
                            gamma):
    """Closed-form early-phase I(t) and E(t) given e(0) = e0, i(0) = 0
    (testSEIRP01.m:120-122)."""
    t = jnp.asarray(t)
    delta = alpha_e - kappa - rho
    lam = seirp_early_eigen(alpha_e, alpha_i, kappa, rho, beta, mu, gamma)
    l3, l4 = lam[2], lam[3]
    ii = (e0 / alpha_i) * (l3 - delta) * (l4 - delta) / (l3 - l4) * (
        jnp.exp(l4 * t) - jnp.exp(l3 * t))
    ee = e0 / (l3 - l4) * ((l3 - delta) * jnp.exp(l4 * t)
                           + (delta - l4) * jnp.exp(l3 * t))
    return ii, ee
