"""Randomized-configuration fuzz: the JAX EKF/EKS core vs the NumPy
float64 oracle (tests/oracle_ekf.py, a from-spec transcription of
Tools/GenericExtendedKalmanFilter.m).

The directed tests in test_ekf.py pin one configuration each; this fuzz
draws joint configurations — interior NaN observation holes (missing
data mid-series, GEKF.m:122-135), NaN forecast tails, adaptive-R beta,
gain-discount gamma, monitor window length, partial terminal boundary
conditions (GEKF.m:194-202), Q/R scale jitter and both observation
types — and requires full-output parity at 1e-9 on every draw. Seeds are
fixed so failures reproduce.
"""

import numpy as np
import pytest

from tests.test_ekf import make_setup, run_both, assert_parity
from tests import oracle_ekf

from epidemicmodeling_tpu.models import si_alpha_ekf_system
from epidemicmodeling_tpu.ops import ekf_smoother

import jax.numpy as jnp


def _fuzz_case(seed):
    """Draw one joint configuration. Returns kwargs for run_both plus the
    mutated observation series."""
    rng = np.random.default_rng(1000 + seed)
    T = 110  # fixed shape: vary data/config, not trace shape
    u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=T, seed=seed)

    # interior NaN holes: up to 3 gaps of 1-9 days (missing reports)
    for _ in range(rng.integers(0, 4)):
        start = int(rng.integers(5, T - 15))
        obs[start:start + int(rng.integers(1, 10))] = np.nan
    # optional forecast tail
    if rng.random() < 0.5:
        obs[-int(rng.integers(5, 25)):] = np.nan

    beta = 1.0
    R_use = R_v
    if rng.random() < 0.4:       # adaptive R needs a fixed R prior
        beta = float(rng.uniform(0.7, 0.99))
        R_use = np.array([[float(R_v[0])]])
    gamma = float(rng.choice([1.0, 0.995, 0.98]))
    L = int(rng.choice([7, 21, 40]))

    s_final = Ps_final = None
    if rng.random() < 0.4:       # constrain a random subset of states
        s_final = np.full(3, np.nan)
        Ps_final = np.full((3, 3), np.nan)
        for j in np.nonzero(rng.random(3) < 0.6)[0]:
            s_final[j] = [0.9, 1e-4, 0.2][j]
            Ps_final[j, j] = 10.0 ** rng.uniform(-9, -6)

    Q = Q * 10.0 ** rng.uniform(-1, 1)
    if np.ndim(R_use) == 1:
        R_use = R_use * 10.0 ** rng.uniform(-1, 1)

    return dict(u=u, obs=obs, params=params, pr=pr, s_init=s_init,
                Ps_init=Ps_init, Q=Q, R_v=R_use, beta=beta, gamma=gamma,
                L=L, s_final=s_final, Ps_final=Ps_final)


@pytest.mark.parametrize("seed", range(8))
def test_ekf_fuzz_matches_oracle(seed):
    case = _fuzz_case(seed)
    res, ref = run_both(case["u"], case["obs"], case["params"], case["pr"],
                        case["s_init"], case["Ps_init"], case["Q"],
                        case["R_v"], beta=case["beta"], gamma=case["gamma"],
                        L=case["L"], s_final=case["s_final"],
                        Ps_final=case["Ps_final"])
    assert_parity(res, ref)


@pytest.mark.parametrize("seed", range(3))
def test_ekf_fuzz_time_varying_Q_and_vbar(seed):
    """Time-varying (T, l, l) process-noise schedule + nonzero observation
    noise mean v_bar (GEKF.m:64-91 input forms), with interior NaN holes,
    vs the oracle (which takes the MATLAB time-LAST (l, l, T) layout)."""
    rng = np.random.default_rng(5000 + seed)
    T = 90
    u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=T, seed=seed)
    obs[30:35] = np.nan
    # Q ramps over time: scale the base diagonal per-step
    scale = 10.0 ** rng.uniform(-0.5, 0.5, T)
    Q_t = Q[None, :, :] * scale[:, None, None]          # (T, 3, 3)
    v_bar = np.array([float(rng.normal(0.0, 0.2 * np.nanstd(obs)))])

    res = ekf_smoother(
        si_alpha_ekf_system("NEWCASES"), jnp.asarray(u), jnp.asarray(obs),
        params, jnp.asarray(s_init), jnp.asarray(Ps_init), None, None,
        v_bar=jnp.asarray(v_bar), Q=jnp.asarray(Q_t), R=jnp.asarray(R_v),
        gamma_discount=0.995, inv_monitor_len=21)
    handles = oracle_ekf.si_alpha_handles("NEWCASES")
    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.generic_ekf(
        u.T, obs.reshape(1, -1), handles, pr_np, s_init, Ps_init,
        np.full(3, np.nan), np.full((3, 3), np.nan), np.zeros(3), v_bar,
        np.moveaxis(Q_t, 0, 2), R_v, 1.0, 0.995, 21, 1)
    assert_parity(res, ref)


@pytest.mark.parametrize("seed", range(4))
def test_costate_fuzz_matches_oracle(seed):
    """6-state optimal-control system (bang-bang NaN-input fill,
    SIAlphaModelEKFOptControlled.m) vs the oracle under randomized
    epsilon / weights / sigma / horizons / gamma / adaptive R / interior
    observation holes."""
    from epidemicmodeling_tpu.models import (si_alpha_costate_ekf_system,
                                             SIAlphaParams)

    rng = np.random.default_rng(3000 + seed)
    P, T = 12, 100
    T_hist = int(rng.integers(55, 80))
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    u = rng.integers(0, 3, (T, P)).astype(float)
    obs = np.abs(rng.normal(1e-4, 2e-5, T))
    u[T_hist:] = np.nan
    obs[T_hist:] = np.nan
    if rng.random() < 0.6:                      # interior reporting gap
        start = int(rng.integers(10, T_hist - 15))
        obs[start:start + int(rng.integers(2, 8))] = np.nan

    pr = dict(dt=1.0, beta=0.2, gamma=1 / 7, a=0.004 * rng.random(P),
              b=0.05, u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
              i_min=1e-6, alpha_min=1e-8, alpha_max=100.0,
              epsilon=float(10.0 ** rng.uniform(-6, 0)),
              w=rng.uniform(0.5, 1.5, P),
              sigma=float(rng.choice([1e4, 1e6, 1e8])))
    params = SIAlphaParams(**pr)
    s_init = np.array([0.999, 1e-4, 0.25, 0, 0, 0.0])
    Ps_init = np.diag([1e-4, 1e-6, 0.1, 1e-7, 1e-7, 1e-7])
    s_final = np.array([np.nan, np.nan, np.nan, 0, 0, 0.0])
    Ps_final = np.full((6, 6), np.nan)
    Ps_final[3, 3] = Ps_final[4, 4] = Ps_final[5, 5] = 1e-8
    Q = np.diag([1e-8, 1e-8, 1e-4, 1e-8, 1e-8, 1e-8])
    gamma = float(rng.choice([1.0, 0.995]))
    beta = 1.0
    R_in = np.full(T, 4e-10)
    if rng.random() < 0.5:
        beta = float(rng.uniform(0.8, 0.95))
        R_in = np.array([[4e-10]])

    res = ekf_smoother(
        si_alpha_costate_ekf_system("NEWCASES"), jnp.asarray(u),
        jnp.asarray(obs), params, jnp.asarray(s_init),
        jnp.asarray(Ps_init), jnp.asarray(s_final), jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.asarray(R_in), beta=beta,
        gamma_discount=gamma, inv_monitor_len=21)

    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    R_orc = R_in                # (T,) schedule or (n, n) fixed prior
    ref = oracle_ekf.generic_ekf(
        u.T, obs.reshape(1, -1), oracle_ekf.si_alpha_costate_handles(),
        pr_np, s_init, Ps_init, s_final, Ps_final, np.zeros(6),
        np.zeros(1), Q, R_orc, beta, gamma, 21, 1)

    # forward pass: always 1e-9 (well-conditioned recursion)
    np.testing.assert_allclose(np.asarray(res.s_minus), ref[2].T,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.s_plus), ref[3].T,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.P_plus),
                               np.moveaxis(ref[6], 2, 0), rtol=1e-9,
                               atol=1e-12)
    # forward prescriptions: bit-exact in f64 regardless of conditioning
    np.testing.assert_array_equal(np.asarray(res.u_opt), ref[0].T)
    # smoother: tolerance graded by the conditioning of the P_minus the
    # gain pseudo-inverts. The sigma=1e6 Jacobian band can push the
    # forecast-tail covariance to cond ~1e15, where the RTS recursion is
    # chaotic across BLAS implementations (MATLAB included) — identical-
    # semantics parity is only falsifiable while the problem is
    # numerically determined. u_opt_smooth is recomputed FROM the
    # smoothed states, so its exactness gates on the same conditioning
    # (cells sitting on the switching surface flip with the chaos —
    # the same physics as the documented Mosaic bang-bang flips).
    conds = np.linalg.cond(np.asarray(res.P_minus))
    worst = float(np.nanmax(conds))
    if worst < 1e9:
        np.testing.assert_allclose(np.asarray(res.s_smooth), ref[4].T,
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(res.u_opt_smooth),
                                      ref[1].T)
    elif worst < 1e12:
        np.testing.assert_allclose(np.asarray(res.s_smooth), ref[4].T,
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(res.u_opt_smooth),
                                      ref[1].T)
    else:
        assert np.isfinite(np.asarray(res.s_smooth)).all()
        # At cond >= 1e12 the smoother gain is decided by pinv's singular-
        # value truncation. Both sides now implement MATLAB's exact pinv
        # tolerance (pinv.m: tol = max(size)*eps(norm); _matlab_pinv in
        # ops/ekf.py, matlab_pinv in tests/oracle_ekf.py), so parity stays
        # bounded even at cond ~1e21: the r5 soak sweep over 50 seeds
        # measured ZERO bang-bang flips and scaled state error <= 3e-2.
        # (Before the cutoffs were matched, jnp.linalg.pinv's 10x-coarser
        # default truncated singular values MATLAB keeps and the smoothed
        # costate diverged O(1) — soak seeds 14/20.) Residual error comes
        # from SVD rounding near the kept/dropped boundary, so the state
        # gate is loose-graded, and a flip is legal only where the
        # switching function phi = eps*w - gamma*lambda3*a
        # (SIAlphaModelEKFOptControlled.m:48-58) sits inside the
        # conditioning-implied uncertainty of its costate term — a flip at
        # decisively nonzero phi is a real bug regardless of conditioning.
        # Gate each state component against its own scale (same grading
        # as the backward fuzz's chaotic band): point-wise |d|/|ref|
        # explodes at near-zero dips — soak seed 88 reads "0.101" at a
        # lambda3 zero crossing (ref -7.1e-5 on a 0.40-scale component,
        # abs err 7.2e-6, component-norm 1.0e-4, zero flips). The pinv-
        # matched 50-seed sweep measured <= 3e-2 point-wise, which upper-
        # bounds the component-norm metric cell-for-cell.
        ss, rr = np.asarray(res.s_smooth), ref[4].T
        comp_scale = np.nanmax(np.abs(rr), axis=0) + 1e-300
        scaled = float(np.nanmax(np.abs(ss - rr) / comp_scale[None, :]))
        assert scaled < 5e-2, f"norm-scaled smoother err {scaled:.3e}"
        flip_mask = np.asarray(res.u_opt_smooth) != ref[1].T
        flip = flip_mask.mean()
        band = np.finfo(np.float64).eps * worst
        lam = ref[4].T[:, 5]
        phi = (pr["epsilon"] * pr["w"][None, :]
               - pr["gamma"] * lam[:, None] * pr["a"][None, :])
        delta = pr["gamma"] * np.abs(lam)[:, None] * pr["a"][None, :] * band
        tt, pp = np.where(flip_mask)
        decisive = np.abs(phi[tt, pp]) > delta[tt, pp]
        assert not decisive.any(), (
            f"{decisive.sum()} flips OUTSIDE the conditioning band "
            f"(cond={worst:.2e}, band={band:.2e}): "
            f"worst |phi|/delta = "
            f"{(np.abs(phi[tt, pp]) / np.maximum(delta[tt, pp], 1e-300)).max():.2e}")
        assert flip < 0.01, f"bang-bang flip fraction {flip}"


@pytest.mark.parametrize("order", [1, 2])
@pytest.mark.parametrize("seed", range(3))
def test_rt_ekf_fuzz_matches_pregeneric_oracle(seed, order):
    """The Rt exponential-fit EKF/EKS (the reference's only 2nd-order EKF)
    vs an independent transcription of Tools/Rt_ExpFitEKF.m — the
    PRE-generic numerics: simple covariance update, no symmetrization,
    mrdivide smoother gain, and a scalar adaptive R that CARRIES through
    NaN steps (:97-99), unlike the generic filter's reset-to-prior.
    Randomized: order, adaptive beta, interior NaN holes, nonzero noise
    means, gamma."""
    from epidemicmodeling_tpu.rt.estimators import rt_expfit_ekf
    from tests.oracle_rt import rt_expfit_ekf_oracle

    rng = np.random.default_rng(6000 + seed)
    T = 90
    lam = float(rng.uniform(0.01, 0.06))
    x = 5.0 * np.exp(lam * np.arange(T)) * np.exp(
        0.03 * rng.standard_normal(T))
    for _ in range(rng.integers(1, 3)):       # interior holes
        start = int(rng.integers(10, T - 15))
        x[start:start + int(rng.integers(2, 7))] = np.nan
    ts, al, sg = 1.0, float(rng.uniform(0.8, 1.0)), float(rng.choice([1.0, 5.0]))
    w_bar = np.array([0.0, float(rng.normal(0.0, 0.01))])
    v_bar = np.array([float(rng.normal(0.0, 0.05))])
    s_init = np.array([5.0, 0.0])
    Ps_init = np.diag([1.0, 0.1])
    Q = np.diag([1e-2, 1e-4]) * 10.0 ** rng.uniform(-0.5, 0.5)
    R = np.array([[1e-2]])
    beta = float(rng.choice([1.0, 0.9]))
    gamma = float(rng.choice([1.0, 0.995]))

    res = rt_expfit_ekf(jnp.asarray(x), s_init=jnp.asarray(s_init),
                        time_scale=ts, alpha=al, sigma=sg,
                        w_bar=jnp.asarray(w_bar), v_bar=jnp.asarray(v_bar),
                        Ps_init=jnp.asarray(Ps_init), Q_w=jnp.asarray(Q),
                        R_v=jnp.asarray(R), beta=beta, gamma=gamma,
                        order=order)
    (S_MINUS, S_PLUS, P_MINUS, P_PLUS, K_GAIN, S_SMOOTH, P_SMOOTH,
     innovations, rho) = rt_expfit_ekf_oracle(
        x, s_init, (ts, al, sg), w_bar, v_bar, Ps_init, Q, R, beta, gamma,
        21, order)
    np.testing.assert_allclose(np.asarray(res.s_minus), S_MINUS.T,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.s_plus), S_PLUS.T,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.P_plus),
                               np.moveaxis(P_PLUS, 2, 0), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.s_smooth), S_SMOOTH.T,
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(np.asarray(res.rho).reshape(-1), rho,
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("seed", range(3))
def test_backward_fuzz_matches_oracle(seed):
    """Backward 3-state wrapper (flip protocol) vs the oracle's
    backward_generic_ekf under randomized gamma / holes / terminal
    covariances."""
    from epidemicmodeling_tpu.models import (si_alpha_backward_ekf_system,
                                             SIAlphaParams)
    from epidemicmodeling_tpu.ops import backward_ekf_smoother

    rng = np.random.default_rng(4000 + seed)
    P, T = 12, 80
    u = rng.integers(0, 3, (T, P)).astype(float)
    obs = np.abs(rng.normal(1e-4, 3e-5, T))
    if rng.random() < 0.7:
        start = int(rng.integers(10, T - 20))
        obs[start:start + int(rng.integers(2, 8))] = np.nan
    u_max = np.array([3, 3, 2, 4, 2, 3, 2, 4, 2, 3, 2, 4], float)
    pr = dict(dt=1.0, beta=0.2, gamma=1 / 7, a=0.004 * rng.random(P),
              b=0.05, u_min=np.zeros(P), u_max=u_max, s_min=1e-6,
              i_min=1e-6, alpha_min=1e-8, alpha_max=100.0)
    params = SIAlphaParams(**pr)
    s_init = np.array([0.99, 1e-3, 0.3])
    Ps_init = np.diag([1e-4, 1e-6, 0.1])
    s_final = np.array([0.9, 5e-3, 0.25])
    Ps_final = np.diag(10.0 ** rng.uniform(-6, -3, 3))
    Q = np.diag([1e-10, 1e-10, 1e-5]) * 10.0 ** rng.uniform(-1, 1)
    R_scale = float(10.0 ** rng.uniform(-1, 1))
    gamma = float(rng.choice([1.0, 0.995, 0.98]))

    res = backward_ekf_smoother(
        si_alpha_backward_ekf_system(), jnp.asarray(u), jnp.asarray(obs),
        params, s_init=jnp.asarray(s_init), Ps_init=jnp.asarray(Ps_init),
        s_final=jnp.asarray(s_final), Ps_final=jnp.asarray(Ps_final),
        Q=jnp.asarray(Q), R=jnp.full(T, 1e-12 * R_scale),
        gamma_discount=gamma)

    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.backward_generic_ekf(
        u.T, obs.reshape(1, -1), oracle_ekf.si_alpha_backward_handles(),
        pr_np, s_init, Ps_init, s_final, Ps_final, np.zeros(3),
        np.zeros(1), Q, np.full((1, 1, T), 1e-12 * R_scale), 1.0, gamma,
        21, 1)
    # This family draws R ~ 1e-12*10^[-1,1]: the near-singular update
    # (S ~ R) amplifies jnp-vs-numpy f64 op-ordering by ~1e7 ulps over
    # the 80-step recursion. Soak-measured tail (seeds 22/25 of the
    # extended range): rel 1.4e-9 / 9.3e-9 on s~0.9 elements — widened
    # from 1e-9 to 1e-7 accordingly (real semantic bugs, e.g. the
    # adaptive-R reset-vs-carry split, show at >=1e-3 here).
    #
    # The FILTERED gate is additionally graded per step (soak seeds
    # 126/132): a NaN hole with i and alpha pinned at their clips blows
    # P- up to ~1e13 nearly rank-1; the next tiny-R update collapses it
    # by ~16 decades, and at cond(P-) >= 1e12 the P+ subtraction cancels
    # beyond f64 — the ORACLE's P+[0,0] went to -1.46e4 (negative
    # variance) on seed 126 while the impl's Joseph ordering stayed PSD,
    # and the oracle's filtered state stopped reproducing the
    # observation (|h(s+)-obs|/obs = 0.217 at R ~ 1e-12) while the
    # impl's tracked it at 4.7e-3. Elementwise parity is meaningless
    # past that point, so: strict rtol before the first cond >= 1e12
    # step of the backward recursion, and after it assert the physics
    # certificate instead — the filtered state must still reproduce the
    # observations at tiny R at least as well as the oracle does (with
    # an absolute 5% roof measured at 10x margin), states stay finite
    # and within one component-scale of the oracle, covariances finite.
    sp_i, sp_o = np.asarray(res.s_plus), ref[3].T
    conds_minus = np.linalg.cond(np.asarray(res.P_minus))
    ill = np.where(conds_minus >= 1e12)[0]
    # backward recursion processes k = T-1..0, so contamination starts
    # at the LARGEST ill k and affects every k at or below it
    kc = int(ill.max()) if ill.size else -1
    np.testing.assert_allclose(sp_i[kc + 1:], sp_o[kc + 1:],
                               rtol=1e-7, atol=1e-11)
    if kc >= 0:
        band = slice(0, kc + 1)
        assert np.isfinite(sp_i[band]).all()
        comp_scale = np.abs(sp_o).max(axis=0) + 1e-300
        scaled = (np.abs(sp_i[band] - sp_o[band])
                  / comp_scale[None, :]).max()
        assert scaled < 1.0, f"filtered chaotic-band scaled err {scaled:.3e}"
        h_i = sp_i[:, 0] * sp_i[:, 1] * sp_i[:, 2]
        h_o = sp_o[:, 0] * sp_o[:, 1] * sp_o[:, 2]
        m = ~np.isnan(obs)
        m[kc + 1:] = False
        if m.any():
            cons_i = float(np.max(np.abs(h_i[m] - obs[m]) / obs[m]))
            cons_o = float(np.max(np.abs(h_o[m] - obs[m]) / obs[m]))
            assert cons_i <= max(0.05, 1.5 * cons_o), (
                f"filtered obs consistency {cons_i:.3e} worse than "
                f"oracle's {cons_o:.3e} in the chaotic band")
        assert np.isfinite(np.asarray(res.P_plus)[band]).all()
    # smoother tolerance graded by conditioning (see the costate fuzz);
    # the strict branch rides the same tiny-R amplification as s_plus
    # above (soak seed 25: one element at rel 3.8e-9), so it sits at
    # 1e-8, not 1e-9
    worst = float(np.nanmax(np.linalg.cond(np.asarray(res.P_minus))))
    if worst < 1e12:
        rt, at = (1e-8, 1e-11) if worst < 1e9 else (1e-6, 1e-9)
        np.testing.assert_allclose(np.asarray(res.s_smooth), ref[4].T,
                                   rtol=rt, atol=at)
        # covariance elements below rt*||P|| are numerically zero at
        # this conditioning — a cross-covariance at 1e-9 inside a
        # matrix whose diagonal is 1e-1 carries no signal (soak seed
        # 365: 7/720 elements at abs <= 4.4e-8, rel 17.9, everything
        # else clean at 1e-6) — so the absolute floor scales with the
        # matrix magnitude
        P_ref = np.moveaxis(ref[7], 2, 0)
        atol_P = max(at, rt * float(np.abs(P_ref).max()))
        try:
            np.testing.assert_allclose(np.asarray(res.P_smooth), P_ref,
                                       rtol=rt, atol=atol_P)
        except AssertionError:
            # Smoothed-covariance ulp-chaos certificate (soak seed 769):
            # a 7-step observation hole inflates the backward P- to ~4e3
            # (sv spread over ~8 decades, though cond per-step stays
            # ~5e7); the smoother correction then cancels ~5 decades
            # back down to the 1e-1-scale smoothed covariance, so
            # ulp-level op-ordering differences amplify to ~5e-3
            # ABSOLUTE on P_smooth while the smoothed STATE stays
            # conditioned (measured 3.4e-7 scaled). The oracle ITSELF
            # moves 3.3e-3 at the same step under a one-ulp observation
            # scaling. Grade by that self-calibrating certificate:
            # the impl-oracle gap must sit within 8x the oracle's own
            # measured ulp response (a real covariance bug shows at the
            # matrix scale, 20x above seed 769's certified gap).
            f64_eps = np.finfo(np.float64).eps
            sens = 0.0
            for fac in (1 + f64_eps, 1 - f64_eps):
                refp = oracle_ekf.backward_generic_ekf(
                    u.T, (obs * fac).reshape(1, -1),
                    oracle_ekf.si_alpha_backward_handles(), pr_np,
                    s_init, Ps_init, s_final, Ps_final, np.zeros(3),
                    np.zeros(1), Q, np.full((1, 1, T), 1e-12 * R_scale),
                    1.0, gamma, 21, 1)
                sens = max(sens, float(np.abs(
                    np.moveaxis(refp[7], 2, 0) - P_ref).max()))
            assert sens > atol_P, (
                f"P_smooth diverges but the oracle is ulp-stable "
                f"(sens {sens:.3e} <= atol {atol_P:.3e}) — real bug")
            np.testing.assert_allclose(
                np.asarray(res.P_smooth), P_ref, rtol=rt,
                atol=max(atol_P, 8 * sens),
                err_msg=f"P_smooth gap exceeds 8x the oracle's own "
                        f"ulp sensitivity ({sens:.3e})")
    else:
        # cond >= 1e12: the RTS recursion is BLAS-chaotic (same regime
        # as the costate fuzz's third band). Elementwise rel blows up at
        # near-zero dips of the i series (soak seed 22: i_ref = 4e-9 on
        # a 1e-3-scale component reads as "rel 8.3"), so gate each state
        # component against its own scale. The bound follows first-order
        # perturbation theory: quantities computed through a cancellation
        # at condition kappa carry O(eps*kappa) relative error, and the
        # backward filter's smoother (which runs forward from k=0)
        # spreads the collapse everywhere. Soak calibration: seed 22
        # measured 3.4e-5 near the 1e-12 threshold (floor 1e-3); seed
        # 132 (cond 7.1e14, eps*kappa = 0.16) measured 4.2e-3; seed 126
        # (cond 2.6e16, the oracle's own P+ diagonal at -1.46e4 —
        # negative variance) measured 0.33, capped at one component
        # scale. The filtered gate above certifies the impl against the
        # observations in that regime, so this is a containment bound,
        # not a parity claim.
        bound = min(1.0, max(1e-3, np.finfo(np.float64).eps * worst))
        ss, rr = np.asarray(res.s_smooth), ref[4].T
        comp_scale = np.abs(rr).max(axis=0) + 1e-300
        scaled = (np.abs(ss - rr) / comp_scale[None, :]).max()
        assert scaled < bound, (
            f"norm-scaled smoother err {scaled:.3e} "
            f"(bound {bound:g} at cond {worst:.2e})")
        assert np.isfinite(np.asarray(res.P_smooth)).all()


def test_bl_adaptive_R_interior_nan_holes_match_generic():
    """Adaptive R (beta=0.9) with NaN holes MID-series: GEKF.m:180-185
    resets the adapted R to the fixed prior after every hole (the array
    write is skipped on NaN steps). Pins the lanes core == generic core
    on exactly that path; a carry-through-the-hole implementation fails
    this at ~1e-3."""
    import jax
    from tests.test_ekf_bl import build_lanes, to_bl
    from epidemicmodeling_tpu.models.batch_last import \
        si_alpha_costate_ekf_system_bl
    from epidemicmodeling_tpu.models import si_alpha_costate_ekf_system
    from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl

    B, T = 4, 90
    (u, obs, params_b, s_init, Ps_init, s_final, Ps_final, Q,
     R) = build_lanes(B, T, nan_tail=20, with_costates=True, seed=7)
    obs = np.asarray(obs)
    obs[:, 25:31] = np.nan            # interior reporting gap, all lanes
    obs[1, 45:48] = np.nan            # and a lane-specific one
    R_prior = 4e-10

    system = si_alpha_costate_ekf_system()

    def one(u_, x_, p_, si, Pi, sf, Pf, Q_):
        return ekf_smoother(system, u_, x_, p_, si, Pi, sf, Pf, Q=Q_,
                            R=jnp.asarray(R_prior), beta=0.9,
                            gamma_discount=0.995, inv_monitor_len=21,
                            smoother_gain="solve")

    ref = jax.vmap(one)(jnp.asarray(u), jnp.asarray(obs)[..., None],
                        params_b, jnp.asarray(s_init), jnp.asarray(Ps_init),
                        jnp.asarray(s_final), jnp.asarray(Ps_final),
                        jnp.asarray(Q))
    params_bl = jax.tree.map(to_bl, params_b)
    res = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(),
        jnp.moveaxis(jnp.asarray(u), 0, -1), jnp.asarray(obs).T, params_bl,
        to_bl(s_init), to_bl(Ps_init), to_bl(s_final), to_bl(Ps_final),
        Q=to_bl(Q), R=jnp.full((T, B), R_prior), gamma_discount=0.995,
        beta=0.9, inv_monitor_len=21)
    np.testing.assert_allclose(np.moveaxis(np.asarray(res.s_plus), -1, 0),
                               np.asarray(ref.s_plus), rtol=1e-9,
                               atol=1e-12)
    np.testing.assert_allclose(np.moveaxis(np.asarray(res.s_smooth), -1, 0),
                               np.asarray(ref.s_smooth), rtol=1e-7,
                               atol=1e-10)


def test_kernels_adaptive_R_interior_nan_holes_match_bl():
    """The fused 6-state Pallas kernel keeps an immutable-prior VMEM row
    and resets R to it on NaN steps; bit-parity with the lanes core on a
    series with interior holes (interpret mode: same arithmetic)."""
    import jax
    from tests.test_ekf6_kernel import build, pack_params_for_kernel
    from epidemicmodeling_tpu.models.batch_last import \
        si_alpha_costate_ekf_system_bl
    from epidemicmodeling_tpu.ops.ekf_bl import ekf_smoother_bl
    from epidemicmodeling_tpu.ops.pallas.ekf6_kernel import ekf6_pallas

    u, x, Rv, params, s_init, Ps_init, Q, s_final, Ps_final = build(seed=11)
    x = np.array(x)                   # writable copy
    x[20:26] = np.nan                 # interior gap across all lanes
    x = jnp.asarray(x)

    ref = ekf_smoother_bl(
        si_alpha_costate_ekf_system_bl(), u, x, params, s_init, Ps_init,
        s_final, Ps_final, Q=Q, R=Rv, gamma_discount=0.995, beta=0.9,
        inv_monitor_len=21)
    scal, vecs = pack_params_for_kernel(params, Q)
    ssm, usm, s_plus = ekf6_pallas(
        u, x, Rv, scal, vecs, s_init, Ps_init.reshape(36, -1),
        s_final, Ps_final.reshape(36, -1), gamma_discount=0.995,
        beta=0.9, inv_monitor_len=21,
        interpret=jax.default_backend() not in ("tpu", "axon"))
    sp_err = (np.abs(np.asarray(s_plus) - np.asarray(ref.s_plus))
              / (np.abs(np.asarray(ref.s_plus)) + 1.0)).max()
    assert sp_err < 1e-3
    np.testing.assert_array_equal(np.asarray(usm[64:-1]),
                                  np.asarray(ref.u_opt_smooth[64:-1]))


@pytest.mark.parametrize("seed", [0, 3])
def test_ekf_fuzz_totalcases_interior_nans(seed):
    """TOTALCASES observation model with interior NaN holes, vs oracle."""
    rng = np.random.default_rng(2000 + seed)
    T = 100
    u, obs, params, pr, s_init, Ps_init, Q, R_v = make_setup(T=T, seed=seed)
    # rebuild the observation as cumulative (1 - s): integrate new cases
    s_path = 0.999 - np.nancumsum(np.nan_to_num(obs))
    obs_tc = np.clip(1.0 - s_path, 0.0, 1.0)
    obs_tc += 0.02 * obs_tc.std() * rng.standard_normal(T)
    for _ in range(2):
        start = int(rng.integers(5, T - 15))
        obs_tc[start:start + int(rng.integers(2, 8))] = np.nan

    res = ekf_smoother(
        si_alpha_ekf_system("TOTALCASES"), jnp.asarray(u),
        jnp.asarray(obs_tc), params, jnp.asarray(s_init),
        jnp.asarray(Ps_init), None, None, Q=jnp.asarray(Q),
        R=jnp.asarray(R_v), beta=1.0, gamma_discount=0.995,
        inv_monitor_len=21)
    handles = oracle_ekf.si_alpha_handles("TOTALCASES")
    pr_np = {k: np.asarray(v, float) for k, v in pr.items()}
    ref = oracle_ekf.generic_ekf(
        u.T, obs_tc.reshape(1, -1), handles, pr_np, s_init, Ps_init,
        np.full(3, np.nan), np.full((3, 3), np.nan), np.zeros(3),
        np.zeros(1), Q, R_v, 1.0, 0.995, 21, 1)
    assert_parity(res, ref)
