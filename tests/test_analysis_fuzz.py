"""Analysis-layer fuzz: randomized configurations vs independent NumPy
loop oracles and closed-form certificates for the Hamiltonian shooting
studies, the SEIRP model family, the early-phase linear analysis, and the
country statistics.

Oracles transcribe the REFERENCE semantics
(testScripts/testSIModelOptimalControl01-03.m, testSEIRP01-03.m,
testCountryStatistics01-04.m) as per-step / per-sample Python loops —
structurally independent of the package's lax.scan implementations — and
the linear-analysis checks pit the package's closed forms against
numpy/scipy eigensolvers and matrix exponentials.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from epidemicmodeling_tpu.analysis import (
    si_alpha_hamiltonian_shooting, si_continuous_control,
    si_alpha_multiplicative_shooting, obsv, ctrb,
    seirp_early_phase_matrix, seirp_jacobian, seirp_early_eigen,
    seirp_early_closed_form)
from epidemicmodeling_tpu.analysis.country_stats import (
    mortality_rate, active_cases, r0_generation_ratio, lagged_case_rate)
from epidemicmodeling_tpu.models import seirp_rollout, seirp_saturated_rollout
from epidemicmodeling_tpu.models.seirp import seirp_linearized_matrices


# --------------------------------------------------------------- oracles

def _clip(x, lo, hi):
    return min(max(x, lo), hi)


def oracle_shooting(epsilon, w, a, u_min, u_max, gamma, beta, s0, i0,
                    alpha0, lam0, K, dt, alpha_min, alpha_max,
                    u_schedule=None):
    """Per-step loop transcription of the forward Hamiltonian shooting
    (testSIModelOptimalControl01.m:62-98)."""
    P = len(a)
    s, i, al = float(s0), float(i0), float(alpha0)
    l1, l2, l3 = (float(v) for v in lam0)
    out = {k: [] for k in "s i al lam u H Hscale J0 J1".split()}
    for t in range(K):
        w_t = w[t] if np.ndim(w) == 2 else np.asarray(w, float)
        rho = l1 - l2 - (1.0 - epsilon)
        phi = epsilon * w_t - gamma * l3 * a
        u_t = (np.where(phi >= 0, u_min, u_max) if u_schedule is None
               else np.asarray(u_schedule[t], float))
        terms = np.array([-rho * al * s * i, -beta * l2 * i,
                          epsilon * np.dot(w_t, u_t),
                          l3 * (-gamma * al
                                + gamma * np.dot(a, u_max - u_t))])
        H = terms.sum()
        out["s"].append(s); out["i"].append(i); out["al"].append(al)
        out["lam"].append([l1, l2, l3]); out["u"].append(u_t)
        out["H"].append(H); out["Hscale"].append(np.abs(terms).max())
        out["J0"].append(al * s * i); out["J1"].append(np.dot(w_t, u_t))
        l1n = l1 + dt * rho * al * i
        l2n = l2 + dt * (rho * al * s + beta * l2)
        l3n = l3 + dt * (rho * s * i + gamma * l3)
        sn = _clip(s - dt * al * s * i, 0.0, 1.0)
        i_n = _clip(i + dt * (al * s * i - beta * i), 0.0, 1.0)
        aln = _clip(al + dt * (-gamma * al + gamma * np.dot(a, u_max - u_t)),
                    alpha_min, alpha_max)
        s, i, al, l1, l2, l3 = sn, i_n, aln, l1n, l2n, l3n
    return {k: np.asarray(v) for k, v in out.items()}


def oracle_mult_shooting(epsilon, w, a, c, u_min, u_max, beta, s0, i0,
                         alpha0, lam0, K, dt, alpha_min, alpha_max):
    """Loop transcription of the multiplicative-input shooting
    (testSIModelOptimalControl03.m:64-94)."""
    s, i, al = float(s0), float(i0), float(alpha0)
    l1, l2, l3 = (float(v) for v in lam0)
    out = {k: [] for k in "s i al u H Hscale J0 J1".split()}
    for t in range(K):
        w_t = w[t] if np.ndim(w) == 2 else np.asarray(w, float)
        rho = l1 - l2 - (1.0 - epsilon)
        phi = epsilon * w_t - l3 * al * a
        u_t = np.where(phi >= 0, u_min, u_max)
        au = np.dot(a, u_t) + c
        terms = np.array([-rho * al * s * i, -beta * l2 * i,
                          epsilon * np.dot(w_t, u_t), -l3 * al * au])
        H = terms.sum()
        out["s"].append(s); out["i"].append(i); out["al"].append(al)
        out["u"].append(u_t); out["H"].append(H)
        out["Hscale"].append(np.abs(terms).max())
        out["J0"].append(al * s * i); out["J1"].append(np.dot(w_t, u_t))
        l1n = l1 + dt * rho * al * i
        l2n = l2 + dt * (rho * al * s + beta * l2)
        l3n = l3 + dt * (rho * s * i + l3 * au)
        sn = _clip(s - dt * al * s * i, 0.0, 1.0)
        i_n = _clip(i + dt * (al * s * i - beta * i), 0.0, 1.0)
        aln = _clip(al - dt * al * au, alpha_min, alpha_max)
        s, i, al, l1, l2, l3 = sn, i_n, aln, l1n, l2n, l3n
    return {k: np.asarray(v) for k, v in out.items()}


def oracle_seirp(rates, x0, K, dt):
    """Per-step loop transcription of the Euler SEIRP (Tools/SEIRP.m:26-32).
    rates: (K, 7) [alpha_e, alpha_i, kappa, rho, beta, mu, gamma]."""
    x = np.asarray(x0, float).copy()
    traj = []
    for t in range(K):
        traj.append(x.copy())
        s, e, i, r, p = x
        ae, ai, ka, ro, be, mu, ga = rates[t]
        x = x + dt * np.array([
            -ae * s * e - ai * s * i + ga * r,
            ae * s * e + ai * s * i - ka * e - ro * e,
            ka * e - be * i - mu * i,
            be * i + ro * e - ga * r,
            mu * i])
    return np.asarray(traj)


def oracle_causal_ma(x, w):
    """MATLAB filter(ones(1,w), w, x): y[t] = (1/w) * sum x[t-w+1..t],
    zero-prefilled."""
    x = np.asarray(x, float)
    y = np.zeros_like(x)
    for t in range(len(x)):
        lo = max(0, t - w + 1)
        y[t] = x[lo: t + 1].sum() / w
    return y


# ----------------------------------------------------------- subfamilies

@pytest.mark.parametrize("seed", range(6))
def test_shooting_fuzz(seed):
    """Random shooting problems vs the loop oracle, the pointwise
    Hamiltonian-minimization certificate of the bang-bang law (every
    single-coordinate flip of u can only raise H given the realized
    costates), and exact replication under a fixed random schedule."""
    rng = np.random.default_rng(9600 + seed)
    P = int(rng.integers(1, 8))
    K = int(rng.integers(30, 150))
    eps = float(rng.uniform(1e-6, 0.999))
    tv_w = rng.random() < 0.5
    w = rng.uniform(0.2, 2.0, (K, P)) if tv_w else rng.uniform(0.2, 2.0, P)
    a = rng.uniform(0.001, 0.05, P)
    u_min = np.zeros(P)
    u_max = rng.integers(1, 5, P).astype(float)
    gamma = float(rng.uniform(0.05, 0.3))
    beta = float(rng.uniform(0.05, 0.3))
    lam0 = rng.normal(scale=rng.choice([0.01, 1.0]), size=3)
    dt = float(rng.uniform(0.2, 1.0))
    kw = dict(alpha_min=0.0, alpha_max=float(rng.uniform(0.5, 100.0)))
    args = (eps, w, a, u_min, u_max, gamma, beta, 0.99, 1e-3, 0.2,
            lam0, K, dt)

    got = si_alpha_hamiltonian_shooting(*args, **kw)
    ref = oracle_shooting(*args, **kw)
    for k, g in (("s", got.s), ("i", got.i), ("al", got.alpha),
                 ("lam", got.lambdas), ("u", got.u),
                 ("J0", got.J0), ("J1", got.J1)):
        scale = max(np.abs(ref[k]).max(), 1e-12)
        np.testing.assert_allclose(np.asarray(g), ref[k], rtol=1e-12,
                                   atol=1e-12 * scale, err_msg=k)

    # H is a near-cancelling sum of terms carrying exponentially-growing
    # costates, so cross-implementation comparison cannot be graded
    # consistently with the lam series (r5 soak find, seeds 9/17/27/28:
    # 1e-10..1e-8 rel on H while states and costates match at 1e-12).
    # Certify it STRUCTURALLY instead: recompute H from the package's own
    # carried values with the independent numpy formula — a wrong term,
    # sign or coefficient still shows up at O(1), while op-ordering
    # roundoff stays at the term-scale ulp level.
    gs, gi, gal = (np.asarray(v) for v in (got.s, got.i, got.alpha))
    glam, gu, gH = (np.asarray(v) for v in (got.lambdas, got.u, got.H))
    w_full = w if tv_w else np.broadcast_to(w, (K, P))
    for t in range(K):
        rho = glam[t, 0] - glam[t, 1] - (1.0 - eps)
        terms = np.array([
            -rho * gal[t] * gs[t] * gi[t], -beta * glam[t, 1] * gi[t],
            eps * np.dot(w_full[t], gu[t]),
            glam[t, 2] * (-gamma * gal[t]
                          + gamma * np.dot(a, u_max - gu[t]))])
        # ulp scale rides the largest INTERMEDIATE product (e.g. rho*al
        # before the small s*i factors; the two cancelling halves of the
        # l3 term), not just the final terms
        hsc = max(np.abs(terms).max(), abs(rho) * gal[t],
                  beta * abs(glam[t, 1]),
                  abs(glam[t, 2]) * gamma
                  * (gal[t] + np.dot(a, u_max - gu[t])), 1e-300)
        assert abs(gH[t] - terms.sum()) <= 1e-11 * hsc, (
            f"t={t}: H inconsistent with carried values "
            f"({abs(gH[t] - terms.sum()) / hsc} of term scale)")

    # Hamiltonian-minimization certificate: H is linear in u with
    # coefficient phi_p, so u_opt must not beat any single flip
    for t in range(0, K, max(1, K // 16)):
        w_t = w[t] if tv_w else w
        l3 = ref["lam"][t, 2]
        phi = eps * w_t - gamma * l3 * a
        dH = phi * (u_max - u_min)          # H(flip_p) - H(u_opt) signed
        u_t = ref["u"][t]
        took_min = u_t == u_min
        assert (np.where(took_min, dH, -dH) >= -1e-11 * max(
            1.0, np.abs(dH).max())).all(), f"t={t}: a flip lowers H"

    # fixed random schedule replicates exactly
    sched = rng.integers(0, 3, (K, P)).astype(float)
    got_s = si_alpha_hamiltonian_shooting(*args, **kw, u_schedule=sched)
    ref_s = oracle_shooting(*args, **kw, u_schedule=sched)
    np.testing.assert_allclose(np.asarray(got_s.i), ref_s["i"], rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(got_s.u), sched)


@pytest.mark.parametrize("seed", range(6))
def test_multiplicative_shooting_fuzz(seed):
    """Multiplicative-input variant vs its loop oracle + the same
    H-minimization certificate with phi = eps*w - lambda3*alpha*a."""
    rng = np.random.default_rng(9700 + seed)
    P = int(rng.integers(1, 6))
    K = int(rng.integers(30, 120))
    eps = float(rng.uniform(1e-6, 0.999))
    w = rng.uniform(0.2, 2.0, P)
    a = rng.uniform(0.001, 0.05, P)
    c = float(rng.uniform(0.0, 0.05))
    u_min = np.zeros(P)
    u_max = rng.integers(1, 5, P).astype(float)
    beta = float(rng.uniform(0.05, 0.3))
    lam0 = rng.normal(scale=0.1, size=3)
    dt = float(rng.uniform(0.2, 1.0))
    args = (eps, w, a, c, u_min, u_max, beta, 0.99, 1e-3, 0.3, lam0, K, dt)

    got = si_alpha_multiplicative_shooting(*args, alpha_min=0.0,
                                           alpha_max=10.0)
    ref = oracle_mult_shooting(*args, alpha_min=0.0, alpha_max=10.0)
    for k, g in (("s", got.s), ("i", got.i), ("al", got.alpha),
                 ("u", got.u), ("J1", got.J1)):
        scale = max(np.abs(ref[k]).max(), 1e-12)
        np.testing.assert_allclose(np.asarray(g), ref[k], rtol=1e-12,
                                   atol=1e-12 * scale, err_msg=k)

    # structural H certificate from the package's own carried values
    # (see test_shooting_fuzz for why cross-implementation H comparison
    # cannot be graded consistently)
    gs, gi, gal = (np.asarray(v) for v in (got.s, got.i, got.alpha))
    glam, gu, gH = (np.asarray(v) for v in (got.lambdas, got.u, got.H))
    for t in range(K):
        rho = glam[t, 0] - glam[t, 1] - (1.0 - eps)
        au = np.dot(a, gu[t]) + c
        terms = np.array([
            -rho * gal[t] * gs[t] * gi[t], -beta * glam[t, 1] * gi[t],
            eps * np.dot(w, gu[t]), -glam[t, 2] * gal[t] * au])
        # ulp scale rides the largest INTERMEDIATE product (see above)
        hsc = max(np.abs(terms).max(), abs(rho) * gal[t],
                  beta * abs(glam[t, 1]),
                  abs(glam[t, 2]) * gal[t] * max(au, 1.0), 1e-300)
        assert abs(gH[t] - terms.sum()) <= 1e-11 * hsc, (
            f"t={t}: H inconsistent with carried values "
            f"({abs(gH[t] - terms.sum()) / hsc} of term scale)")

    lam = np.asarray(got.lambdas)
    for t in range(0, K, max(1, K // 16)):
        phi = eps * w - lam[t, 2] * ref["al"][t] * a
        dH = phi * (u_max - u_min)
        took_min = ref["u"][t] == u_min
        assert (np.where(took_min, dH, -dH) >= -1e-11 * max(
            1.0, np.abs(dH).max())).all(), f"t={t}: a flip lowers H"


@pytest.mark.parametrize("seed", range(6))
def test_continuous_control_fuzz(seed):
    """2-state quadratic-cost law vs its loop oracle: integer rounded
    controls inside the box, alpha = sum(A*(u_max^2 - u^2)) >= 0."""
    rng = np.random.default_rng(9800 + seed)
    P = int(rng.integers(1, 6))
    K = int(rng.integers(30, 120))
    A_coefs = rng.uniform(0.001, 0.05, P)
    w = rng.uniform(0.2, 2.0, P)
    u_min = np.zeros(P)
    u_max = rng.integers(1, 5, P).astype(float)
    gamma = float(rng.uniform(0.05, 0.5))
    beta = float(rng.uniform(0.05, 0.3))
    dt = float(rng.uniform(0.2, 1.0))
    rho0 = float(rng.normal(scale=0.5)) or -0.1
    l20 = float(rng.normal(scale=0.1))

    got = si_continuous_control(A_coefs, w, u_min, u_max, gamma, beta,
                                0.99, 1e-3, rho0, l20, K, dt)
    s, i, rho, l2 = 0.99, 1e-3, rho0, l20
    for t in range(K):
        denom = -2.0 * A_coefs * s * i * rho
        denom = np.where(np.abs(denom) > 1e-30, denom, 1e-30)
        u_t = np.round(np.clip(gamma * w / denom, u_min, u_max))
        al = float(np.sum(A_coefs * (u_max ** 2 - u_t ** 2)))
        np.testing.assert_allclose(np.asarray(got["u"][t]), u_t,
                                   err_msg=f"t={t}")
        np.testing.assert_allclose(float(got["alpha"][t]), al, rtol=1e-12)
        np.testing.assert_allclose(float(got["J0"][t]), al * s * i,
                                   rtol=1e-12, atol=1e-300)
        rho_n = rho + dt * rho * al * (i - s) - dt * beta * l2
        l2n = l2 + dt * rho * al * s + dt * beta * l2
        sn = _clip(s - dt * al * s * i, 0.0, 1.0)
        i_n = _clip(i + dt * al * s * i - dt * beta * i, 0.0, 1.0)
        s, i, rho, l2 = sn, i_n, rho_n, l2n
    u = np.asarray(got["u"])
    assert (u == np.round(u)).all()
    assert (u >= u_min - 1e-12).all() and (u <= u_max + 1e-12).all()
    assert (np.asarray(got["alpha"]) >= -1e-12).all()


@pytest.mark.parametrize("seed", range(6))
def test_seirp_fuzz(seed):
    """Random time-varying SEIRP problems vs the per-step loop oracle,
    population conservation, the saturated variant (oracle + the
    reduces-to-plain identity at beta_s=beta_0, mu_s=mu_0), and the
    early-phase linearization vs a finite-difference Jacobian."""
    rng = np.random.default_rng(9900 + seed)
    dt = float(rng.choice([0.05, 0.1, 0.5]))
    K = int(rng.integers(20, 200))
    T = K * dt
    rates = np.stack([
        rng.uniform(0.1, 0.8, K),      # alpha_e
        rng.uniform(0.0, 0.05, K),     # alpha_i
        rng.uniform(0.005, 0.1, K),    # kappa
        rng.uniform(0.01, 0.2, K),     # rho
        rng.uniform(0.02, 0.2, K),     # beta
        rng.uniform(0.001, 0.05, K),   # mu
        rng.uniform(0.0, 0.01, K),     # gamma
    ], axis=1)
    x0 = rng.dirichlet([50.0, 1.0, 1.0, 1.0, 1.0])

    got = np.stack(seirp_rollout(*(rates[:, j] for j in range(7)),
                                 *x0, T, dt), axis=1)
    ref = oracle_seirp(rates, x0, K, dt)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(got.sum(axis=1), x0.sum(), rtol=1e-11)

    # saturated variant: tanh-ramp oracle + reduces-to-plain identity
    b0, bs = float(rng.uniform(0.02, 0.1)), float(rng.uniform(0.005, 0.02))
    m0, ms = float(rng.uniform(0.001, 0.01)), float(rng.uniform(0.01, 0.1))
    sigma, i_0 = float(rng.uniform(0.001, 0.05)), float(rng.uniform(0.001, 0.1))
    sat = np.stack(seirp_saturated_rollout(
        *(rates[:, j] for j in (0, 1, 2, 3, 6)), *x0, T, dt,
        b0, bs, m0, ms, sigma, i_0), axis=1)
    x = x0.copy()
    for t in range(K):
        np.testing.assert_allclose(sat[t], x, rtol=1e-12, atol=1e-15)
        s, e, i, r, p = x
        ae, ai, ka, ro, ga = rates[t, [0, 1, 2, 3, 6]]
        h = (np.tanh((i - i_0) / sigma) + 1.0) / 2.0
        be = (bs - b0) * h + b0
        mu = (ms - m0) * h + m0
        x = x + dt * np.array([
            -ae * s * e - ai * s * i + ga * r,
            ae * s * e + ai * s * i - ka * e - ro * e,
            ka * e - be * i - mu * i,
            be * i + ro * e - ga * r,
            mu * i])
    same = np.stack(seirp_saturated_rollout(
        *(rates[:, j] for j in (0, 1, 2, 3, 6)), *x0, T, dt,
        b0, b0, m0, m0, sigma, i_0), axis=1)
    plain = np.stack(seirp_rollout(
        rates[:, 0], rates[:, 1], rates[:, 2], rates[:, 3],
        np.full(K, b0), np.full(K, m0), rates[:, 6], *x0, T, dt), axis=1)
    np.testing.assert_allclose(same, plain, rtol=1e-13, atol=1e-16)

    # 5-state linearization == finite-difference Jacobian at the DFE
    r7 = rates[0]
    A = np.asarray(seirp_linearized_matrices(*r7))
    h = 1e-7
    x_star = np.array([1.0, 0.0, 0.0, 0.0, 0.0])
    def f(x):
        s, e, i, r, p = x
        ae, ai, ka, ro, be, mu, ga = r7
        return np.array([
            -ae * s * e - ai * s * i + ga * r,
            ae * s * e + ai * s * i - ka * e - ro * e,
            ka * e - be * i - mu * i,
            be * i + ro * e - ga * r,
            mu * i])
    J = np.stack([(f(x_star + h * np.eye(5)[j]) - f(x_star - h * np.eye(5)[j]))
                  / (2 * h) for j in range(5)], axis=1)
    np.testing.assert_allclose(A, J, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_seirp_closedform_fuzz(seed):
    """Early-phase analysis vs numpy/scipy: closed-form eigenvalues vs
    numpy.linalg.eigvals of the reduced 4x4 (testSEIRP01.m:106-112),
    closed-form I(t)/E(t) vs the matrix exponential of the (e, i) block
    (:120-122), and the reduced Jacobian vs finite differences (:91-103)."""
    from scipy.linalg import expm
    rng = np.random.default_rng(10000 + seed)
    ae = float(rng.uniform(0.1, 0.9))
    ai = float(rng.uniform(0.001, 0.1))
    ka = float(rng.uniform(0.005, 0.2))
    ro = float(rng.uniform(0.01, 0.2))
    be = float(rng.uniform(0.02, 0.3))
    mu = float(rng.uniform(0.001, 0.05))
    ga = float(rng.uniform(0.0, 0.05))

    A4 = np.asarray(seirp_early_phase_matrix(ae, ai, ka, ro, be, mu, ga))
    lam_closed = np.sort(np.asarray(seirp_early_eigen(ae, ai, ka, ro, be,
                                                      mu, ga)))
    lam_num = np.sort(np.linalg.eigvals(A4).real)
    np.testing.assert_allclose(lam_closed, lam_num, rtol=1e-9, atol=1e-12)

    e0 = float(rng.uniform(1e-9, 1e-4))
    t = np.linspace(0.0, float(rng.uniform(5.0, 60.0)), 40)
    ii, ee = seirp_early_closed_form(t, e0, ae, ai, ka, ro, be, mu, ga)
    delta = ae - ka - ro
    M = np.array([[delta, ai], [ka, -be - mu]])
    ref = np.stack([expm(M * tk) @ np.array([e0, 0.0]) for tk in t])
    scale = max(np.abs(ref).max(), 1e-300)
    np.testing.assert_allclose(np.asarray(ee), ref[:, 0], rtol=1e-8,
                               atol=1e-12 * scale)
    np.testing.assert_allclose(np.asarray(ii), ref[:, 1], rtol=1e-8,
                               atol=1e-12 * scale)

    # reduced 4-state Jacobian at a random interior point vs finite diff
    pt = rng.dirichlet([5.0, 1.0, 1.0, 1.0, 1.0])[1:]  # (e, i, r, p)
    A = np.asarray(seirp_jacobian(*pt, ae, ai, ka, ro, be, mu, ga))
    def f4(x):
        e, i, r, p = x
        s = 1.0 - e - i - r - p
        return np.array([
            ae * s * e + ai * s * i - ka * e - ro * e,
            ka * e - be * i - mu * i,
            ro * e + be * i - ga * r,
            mu * i])
    h = 1e-7
    J = np.stack([(f4(pt + h * np.eye(4)[j]) - f4(pt - h * np.eye(4)[j]))
                  / (2 * h) for j in range(4)], axis=1)
    np.testing.assert_allclose(A, J, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_linear_systems_fuzz(seed):
    """obsv/ctrb vs power-iteration loop oracles on random systems,
    including multi-output C, vector B, and the rank drop of a
    structurally unobservable mode (a decoupled state C never sees)."""
    rng = np.random.default_rng(10100 + seed)
    n = int(rng.integers(2, 7))
    m = int(rng.integers(1, 3))
    q = int(rng.integers(1, 3))
    A = rng.normal(size=(n, n))
    C = rng.normal(size=(q, n))
    B = rng.normal(size=(n, m))

    O = np.asarray(obsv(A, C))
    blocks, row = [], C.copy()
    for _ in range(n):
        blocks.append(row.copy())
        row = row @ A
    np.testing.assert_allclose(O, np.concatenate(blocks, axis=0), rtol=1e-12)

    Ct = np.asarray(ctrb(A, B))
    blocks, col = [], B.copy()
    for _ in range(n):
        blocks.append(col.copy())
        col = A @ col
    np.testing.assert_allclose(Ct, np.concatenate(blocks, axis=1),
                               rtol=1e-12)
    # 1-D B handled like MATLAB's column vector
    b1 = rng.normal(size=n)
    Ct1 = np.asarray(ctrb(A, b1))
    assert Ct1.shape == (n, n)

    # random systems are generically full rank; a decoupled state drops it
    assert np.linalg.matrix_rank(O) == n
    A2 = A.copy()
    A2[0, 1:] = 0.0
    A2[1:, 0] = 0.0
    C2 = C.copy()
    C2[:, 0] = 0.0
    assert np.linalg.matrix_rank(np.asarray(obsv(A2, C2))) < n


@pytest.mark.parametrize("seed", range(6))
def test_country_stats_fuzz(seed):
    """Country statistics vs per-sample loop oracles: the generation-ratio
    R0 prefill/power conventions, mortality 0/0 and x/0 both mapping to 0,
    active-case arithmetic, and the lagged case rate's diff/lag/clamp
    alignment in both raw and 7-day-smoothed variants."""
    rng = np.random.default_rng(10200 + seed)
    T = int(rng.integers(30, 120))
    p = int(rng.integers(2, 10))
    infected = np.maximum(rng.exponential(1e3, T), 1e-6)
    got = np.asarray(r0_generation_ratio(infected, p))
    ref = np.ones(T)
    for t in range(p, T):
        ref[t] = (infected[t] / infected[t - p]) ** (1.0 / p)
    np.testing.assert_allclose(got, ref, rtol=1e-12)

    cases = rng.integers(0, 5, T).astype(float) * rng.integers(0, 2, T)
    deaths = np.minimum(cases, rng.integers(0, 3, T).astype(float))
    deaths[cases == 0] = rng.integers(0, 2)     # x/0 branch
    mr = np.asarray(mortality_rate(deaths, cases))
    for t in range(T):
        exp = deaths[t] / cases[t] if cases[t] else 0.0
        assert mr[t] == pytest.approx(exp, rel=1e-12), f"t={t}"

    rec = np.minimum(cases - deaths, rng.exponential(1.0, T))
    np.testing.assert_allclose(np.asarray(active_cases(cases, deaths, rec)),
                               cases - deaths - rec, rtol=1e-12)

    total = np.cumsum(rng.poisson(40, T)).astype(float)
    lag = int(rng.integers(0, 5))
    for smoothed in (False, True):
        got_r = np.asarray(lagged_case_rate(total, infected, lag=lag,
                                            smoothed=smoothed))
        nc = np.diff(total)
        inf = infected.copy()
        if smoothed:
            nc = oracle_causal_ma(nc, 7)
            inf = oracle_causal_ma(inf, 7)
        ref_r = np.maximum(nc[lag:] / inf[: len(nc) - lag], 0.0)
        np.testing.assert_allclose(got_r, ref_r, rtol=1e-10,
                                   err_msg=f"smoothed={smoothed}")
