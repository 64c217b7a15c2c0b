"""Cross-backend parity fuzz on jointly-pathological (real-artifact) data.

test_ekf_bl.py pins vmap==lanes and test_ekf6_kernel.py pins lanes==pallas
on CLEAN synthetic epidemics, one seed each; the realistic fixture's golden
(test_realistic_data.py) runs the lanes backend only. This file closes the
gap in between: several seeds of data.realistic_oxford_frame — weekend
dips, reporting gaps, negative revisions, NaN holes, a late-starting
region, all at once (TrainPredictPrescribeNPI.m:121-170 cleaning rules) —
must produce the SAME trained coefficients, costs and prescriptions from
all three backends. Pathological observations are exactly where a backend
might diverge (NaN-hole select paths, clip orders, short effective
histories), and none of the clean-data parity tests would see it.

Grading (calibrated on 53 seeds — CI {3,11,29} + soak 100-149 — r5):

* f64 vmap vs lanes: same math at full precision, so coefficients pin at
  1e-9 and prescriptions exactly — EXCEPT when the NNLS active set hits a
  degenerate optimum: a ~1-ulp layout-ordering difference in the smoothed
  alpha (measured 1.5e-16 rel on soak seed 117) can flip which support the
  active-set iteration selects when two supports achieve the SAME minimum
  (cross-substituted SSEs agree to 3e-16 rel; the same knife-edge family
  as CLAUDE.md's mesh-placement rule). Those regions get a co-optimality
  certificate (each backend's (a, b) must be optimal on the other's
  problem), and the parity claim is FACTORIZED: co-optimal models
  legitimately re-simulate even identical policies to different costs
  (soak seed 605: zero u-flips, 7.8% cost reldiff), so instead of
  bounding own-model cost differences the test re-runs the pareto stage
  on the vmap backend with LANES' trained params and requires lanes'
  prescriptions exactly and costs at 1e-9 — downstream bit-parity,
  isolated from the certified training flip. A second carve-out applies
  at the eps-GRID ENDPOINT (eps = 1.0 exactly, where the control-cost
  weight is zero and branch choice is degenerate) — see
  _assert_f64_pareto_parity (soak seed 815). A third fires WITHOUT a
  support flip: the same ~1-ulp layout-ordering residue can land
  directly on a bang-bang switching surface and flip one prescription
  cell even though every trained coefficient agrees at f64 roundoff
  (soak offset-23 seeds 1263/1287: 1/2520 cells, costs within 0.17%) —
  see _certify_f64_knife_edge, which also requires the matched-inputs
  factorization to reproduce lanes exactly.

* f32 lanes vs pallas (the kernels' precision): exact equality is too
  strong even in interpret mode — where the bang-bang switching function
  crosses zero, a 1-ulp fma-ordering difference flips the branch and the
  closed-loop rollout amplifies it (the hardware family bench.py's
  hw_closed_loop leg bounds on the real chip). Banded, SCALE-FLOORED
  metrics: relative cost denominators are floored at 5% of the per-region
  median best cost, because at the eps-grid extremes the scalarized cost
  itself is near zero (eps→0: J0-only with control fully on; eps→1:
  J1-only with control off) and a plain relative ratio of two tiny
  near-zero costs is noise, not divergence (soak seed 108: front "43%"
  = 2.4e-3 vs 1.4e-3 against a 9.2e-2 cost scale). The front comparison
  additionally excludes joint bifurcation cells — see _divergence
  (soak seed 442: an eps=1.0 ENDPOINT bifurcation put a J0-better branch
  in only one family and front_max read 0.71 while every non-bifurcated
  cell agreed exactly). Recalibrated green on 403 seeds (CI {3,11,29} +
  soak offsets 0-7, seeds 100-499). A bound exceedance is excused ONLY
  by the upstream-precision-chaos certificate — matched-inputs pareto
  parity plus comparable error against the f64 truth — see
  _certify_f32_upstream_chaos (soak seed 815).

Shapes are identical across seeds so each backend compiles once.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from epidemicmodeling_tpu.data import realistic_oxford_frame
from epidemicmodeling_tpu.data.oxford import (
    load_oxford_data, load_populations, region_arrays)
from epidemicmodeling_tpu.data.preprocess import (
    preprocess_region, build_region_batch, NPI_MAXES_DEFAULT)
from epidemicmodeling_tpu.pipelines import PipelineConfig
from epidemicmodeling_tpu.pipelines.core import (
    train_regions, forecast_scenarios, pareto_prescribe)
from epidemicmodeling_tpu.control import epsilon_grid

T_TRAIN, HORIZON = 130, 15
E_FUZZ = 16
_EPS = np.asarray(epsilon_grid(E_FUZZ))
_SMALL = _EPS < 1e-3
_MID = (_EPS >= 1e-3) & (_EPS < 0.99)
_TOP = _EPS >= 0.99
_SCALE_FLOOR = 0.05

# f32 lanes-vs-pallas per-seed envelope, region-aggregated. Calibrated
# max over the 53 seeds in parentheses; bounds carry ~2x headroom so a
# systematic kernel divergence fails while knife-edge physics passes.
F32_BOUNDS = dict(
    flip_small=0.10,    # (0.0485) u-flip rate, eps < 1e-3
    flip_mid=0.05,      # (0.0215, seed 713: one region's whole
                        # trajectory rides the switching surface — 1-2
                        # cells flip on an early day and the closed loop
                        # cascades them, at equivalent cost (med 0.25%);
                        # same family the bench hw leg bounds at 0.03 on
                        # the real chip. 53-seed calibration was 0.0011)
    flip_top=0.50,      # (0.3333) eps >= 0.99 — unlike clean data, the
                        # pathological fixtures keep knife edges active
                        # at eps=1 (gamma*lambda3*a crossing w)
    cost_med=0.01,      # (0.0000) median same-eps realized-cost reldiff
    cost_tail7=0.20,    # (0.0833) fraction of cells with reldiff > 7%
    cost_max=0.50,      # (0.3507, seed 847: ONE bifurcation branch-pair
                        # cell — flip_small 0.0079 and every other metric
                        # tiny; branch pairs land 18-35% by measurement
                        # (bench hw leg: 18-24% on chip, seed 442: 20.7%).
                        # The median + tail metrics are the teeth against
                        # systematic divergence; max only catches blowups)
    front_max=0.35,     # (0.2237) best-achievable-cost reldiff per eps
)

# Regions whose NNLS support flipped at a certified degenerate optimum
# carry NO own-model cost bounds: co-optimal models re-simulate even an
# identical policy to different costs (soak seed 605: zero u-flips, 7.8%
# cost reldiff), so model multiplicity is unbounded by design. The teeth
# are the co-optimality certificate plus the factorized downstream-parity
# check (vmap's pareto on lanes' trained params == lanes' pareto exactly)
# in the test body.


def _batches(tmp_path, seed):
    df, pops, _ = realistic_oxford_frame(n_regions=3, n_days=160, seed=seed)
    p = tmp_path / f"ox_{seed}.csv"
    df.to_csv(p, index=False)
    pp = tmp_path / f"pops_{seed}.csv"
    pops.to_csv(pp, index=False)
    ox = load_oxford_data(p)
    pop_by_geo = load_populations(pp)["Population2020"]
    sers, names = [], []
    for geo in ox["GeoID"].unique():
        confirmed, deaths, npis = region_arrays(ox, geo)
        pop = float(pop_by_geo[geo])
        sers.append(preprocess_region(confirmed[:T_TRAIN], deaths[:T_TRAIN],
                                      npis[:T_TRAIN], pop))
        names.append(geo)
    return (build_region_batch(sers, names),
            build_region_batch(sers, names, horizon=HORIZON))


def _run(bt, bf, backend, dtype):
    cfg = PipelineConfig(smoother_gain="solve", backend=backend,
                         pareto_chunk=2)
    to = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, T_TRAIN, cfg,
                       dtype=dtype)
    scen, s_hist = forecast_scenarios(
        bf, to.trained, to.init, np.ones(12), np.zeros(12),
        NPI_MAXES_DEFAULT, T_TRAIN, cfg, dtype=dtype)
    par = pareto_prescribe(bf, to.trained, to.init, s_hist, _EPS,
                           np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT,
                           T_TRAIN, cfg, dtype=dtype)
    return to, scen, par, s_hist


def _costs(par):
    j0, j1 = np.asarray(par["J0"]), np.asarray(par["J1"])
    # same-eps realized scalarized cost (E, R) and the whole policy
    # family's scalarized cost (E_eval, E_policy, R)
    c = (1.0 - _EPS)[:, None] * j0 + _EPS[:, None] * j1
    w0, w1 = (1.0 - _EPS)[:, None, None], _EPS[:, None, None]
    fam = w0 * j0[None] + w1 * j1[None]
    return c, fam


def _divergence(par_a, par_b):
    """Banded scale-floored closed-loop divergence metrics, per region
    (each value an (R,) array). Mirrors bench.measure_hw_closed_loop but
    floors the relative-cost denominators at 5% of the per-region median
    best cost — see module docstring.

    The front comparison excludes JOINT BIFURCATION CELLS — cells where
    the backends landed on different bang-bang branches (policy flip
    fraction > 5%, already bounded per band) or realized materially
    different costs (same-eps reldiff > 7%, already bounded by the tail
    metric) — from both families. Reason: when a branch pair lands on a
    grid ENDPOINT (eps = 1 exactly), only one family contains each
    branch — there is no shifted epsilon beyond the endpoint to restore
    symmetry — and because the J0 coordinate carries ZERO weight at
    eps = 1, a branch's J0 is arbitrary among J1-ties, so best-of-family
    at every OTHER eps inherits an unoptimized one-sided coordinate and
    reads as front divergence. Soak seed 442: one eps=1.0 branch pair at
    cost reldiff 0.207 made front_max 0.71 at eps -> 0; soak seed 694:
    a branch pair whose same-eps costs differed only 5.8% (below the
    cost threshold — hence the flip criterion) made front_max 0.35,
    and 0.0 exactly once excluded. Exclusion is skipped for a region
    when fewer than half its cells survive (a systematic divergence
    must stay visible; the flip/cost metrics fire on it regardless)."""
    ua = np.asarray(par_a["u_prescribed"])[:, :, :-1]
    ub = np.asarray(par_b["u_prescribed"])[:, :, :-1]
    flips = (ua != ub).mean(axis=(2, 3))                      # (E, R)
    ca, fam_a = _costs(par_a)
    cb, fam_b = _costs(par_b)
    ca_best_raw = fam_a.min(axis=1)
    cb_best_raw = fam_b.min(axis=1)
    scale = np.median(np.maximum(ca_best_raw, cb_best_raw), axis=0)  # (R,)
    den_c = np.maximum(np.maximum(np.abs(ca), np.abs(cb)),
                       _SCALE_FLOOR * scale)
    cost_rel = np.abs(ca - cb) / den_c
    bif = (cost_rel > 0.07) | (flips > 0.05)                  # (E, R)
    excl = bif[None, :, :] & (bif.mean(axis=0) < 0.5)[None, None, :]
    ca_best = np.where(excl, np.inf, fam_a).min(axis=1)
    cb_best = np.where(excl, np.inf, fam_b).min(axis=1)
    den_f = np.maximum(np.maximum(ca_best, cb_best), _SCALE_FLOOR * scale)
    front_rel = np.abs(ca_best - cb_best) / den_f
    return dict(flips_all=flips.mean(axis=0),
                flip_small=flips[_SMALL].mean(axis=0),
                flip_mid=flips[_MID].mean(axis=0),
                flip_top=flips[_TOP].mean(axis=0),
                cost_med=np.median(cost_rel, axis=0),
                cost_tail7=(cost_rel > 0.07).mean(axis=0),
                cost_max=cost_rel.max(axis=0),
                front_max=front_rel.max(axis=0))


_ENDPOINT_J1_BOUND = 0.25   # soak seed 815: measured 0.1359

# f64 vmap-vs-lanes knife-edge carve-out (soak offset-23 seeds 1263/1287)
_F64_KNIFE_UPSTREAM_MAX = 1e-12  # measured 5.2e-15
_F64_KNIFE_FLIP_MAX = 0.005      # of non-endpoint u cells; measured 4.0e-4
_F64_KNIFE_COST_MAX = 0.02       # floored same-eps cost reldiff; measured 1.7e-3


def _certify_f64_knife_edge(u_a, u_b, j0_a, j0_b, j1_a, j1_b,
                            upstream_rel, tag):
    """Certify that a NON-ENDPOINT f64 vmap-vs-lanes prescription flip in
    a region whose NNLS supports MATCHED is switching-surface physics,
    not a backend divergence (soak offset-23 seeds 1263/1287): trained
    params and the smoothed history agree at f64 roundoff (~2e-15 rel),
    yet ONE bang-bang cell sits within an ulp of the switching surface
    (gamma*lambda3*a crossing the weight) and the layout-ordering residue
    picks different branches; the closed loop then realizes
    near-identical costs (measured ≤0.17%). Three claims, each of which a
    real divergence fails: (1) every upstream input is at roundoff scale;
    (2) flips are isolated (≤0.5% of non-endpoint cells, vs whole-branch
    divergence); (3) same-eps scalarized costs stay equivalent at 2%
    under the 5% scale floor. The test body additionally runs the
    matched-inputs factorization (vmap's pareto on lanes' inputs must
    equal lanes' EXACTLY — measured 0 differing cells on both seeds), so
    a prescription-kernel divergence cannot hide behind this
    certificate."""
    assert upstream_rel <= _F64_KNIFE_UPSTREAM_MAX, (
        f"{tag}: upstream inputs differ {upstream_rel:.3e} — not an "
        f"ulp-scale knife edge")
    ne = ~_TOP
    frac = float((u_a[ne] != u_b[ne]).mean())
    assert frac <= _F64_KNIFE_FLIP_MAX, (
        f"{tag}: {frac:.4f} of non-endpoint cells flipped — systematic "
        f"divergence, not a knife edge")
    c_a = (1.0 - _EPS) * j0_a + _EPS * j1_a
    c_b = (1.0 - _EPS) * j0_b + _EPS * j1_b
    scale = float(np.median(np.maximum(c_a, c_b)))
    den = np.maximum(np.maximum(np.abs(c_a), np.abs(c_b)),
                     _SCALE_FLOOR * scale)
    rel = float((np.abs(c_a - c_b) / den)[ne].max())
    assert rel <= _F64_KNIFE_COST_MAX, (
        f"{tag}: knife-edge flip realized {rel:.4f} cost reldiff")
    for e in np.where(_TOP)[0]:
        if (u_a[e] == u_b[e]).all():
            np.testing.assert_allclose(j0_a[e], j0_b[e], rtol=1e-9,
                                       atol=1e-12, err_msg=tag)
            np.testing.assert_allclose(j1_a[e], j1_b[e], rtol=1e-9,
                                       atol=1e-12, err_msg=tag)
        else:
            rel_e = abs(j1_a[e] - j1_b[e]) / max(abs(j1_a[e]),
                                                 abs(j1_b[e]), 1e-300)
            assert rel_e <= _ENDPOINT_J1_BOUND, (
                f"{tag}: endpoint branch pair J1 reldiff {rel_e:.4f} > "
                f"{_ENDPOINT_J1_BOUND}")


def _assert_f64_pareto_parity(u_a, u_b, j0_a, j0_b, j1_a, j1_b, tag):
    """f64 prescription parity with the eps-grid ENDPOINT carved out.

    At eps = 1.0 exactly the control-cost weight (1 - eps) is ZERO, so
    the bang-bang switching problem is degenerate: ~1e-15 op-ordering
    noise in the smoothed costate picks between whole branch pairs (soak
    seed 815: 73% of one region's u cells flip from day 0 at eps = 1.0
    ONLY, while every eps < 0.99 row stays bit-exact — the same endpoint
    family as _divergence's bifurcation exclusion). Neither branch is an
    argmin — the prescription replays the smoother's costate — so the
    branches' realized costs need not tie. The claim is therefore split:
    non-endpoint rows EXACT (u) / 1e-9 (costs); an endpoint row either
    matches exactly (then costs pin at 1e-9) or is a branch pair whose
    eps=1-scalarized cost (J1) reldiff is bounded at 0.25 (measured
    0.136). Systematic divergence still fails: it would break the
    non-endpoint exactness."""
    ne = ~_TOP
    np.testing.assert_array_equal(u_a[ne], u_b[ne], err_msg=tag)
    np.testing.assert_allclose(j0_a[ne], j0_b[ne], rtol=1e-9, atol=1e-12,
                               err_msg=tag)
    np.testing.assert_allclose(j1_a[ne], j1_b[ne], rtol=1e-9, atol=1e-12,
                               err_msg=tag)
    for e in np.where(_TOP)[0]:
        if (u_a[e] == u_b[e]).all():
            np.testing.assert_allclose(j0_a[e], j0_b[e], rtol=1e-9,
                                       atol=1e-12, err_msg=tag)
            np.testing.assert_allclose(j1_a[e], j1_b[e], rtol=1e-9,
                                       atol=1e-12, err_msg=tag)
        else:
            rel = abs(j1_a[e] - j1_b[e]) / max(abs(j1_a[e]),
                                               abs(j1_b[e]), 1e-300)
            assert rel <= _ENDPOINT_J1_BOUND, (
                f"{tag}: endpoint branch pair J1 reldiff {rel:.4f} > "
                f"{_ENDPOINT_J1_BOUND}")


def _certify_f32_upstream_chaos(seed, bf, to_lf, s_lf, s_pf, s_f64,
                                par_lf, failed):
    """Certify that an f32 lanes-vs-pallas bound exceedance is UPSTREAM
    PRECISION CHAOS, not a kernel divergence (soak seed 815: one region's
    smoothed-alpha history out of the f32 filter/smoother differs 6.3%
    between the backends — 31% of elements beyond 1% rel — and every
    realized small-eps cost inherits a uniform 5.7% offset with ZERO
    policy flips; trained params agree at f32 roundoff, 3e-7).

    Two claims, each of which a real kernel bug would fail:

    1. Matched-inputs factorization — pallas' pareto stage fed LANES' f32
       (trained, init, s_hist) must meet EVERY F32 bound against lanes'
       own pareto (seed 815 measured: cost_med 0.0184 -> 0.0 exactly,
       front_max 0.057 -> 0.0008). A prescription-kernel divergence
       cannot hide here.
    2. Comparable error against the f64 truth — in every region where the
       two f32 s_hist disagree materially, BOTH must sit at least a
       quarter of that disagreement away from the f64 reference: f32
       simply cannot resolve the region (seed 815 r0: |l32-f64| = 0.41,
       |p32-f64| = 0.50, cross 0.089, all per-region-scale-normalized).
       A filter-kernel bug makes lanes hug f64 while pallas strays —
       min(el, ep) collapses and the certificate fails."""
    cfg = PipelineConfig(smoother_gain="solve", backend="pallas",
                         pareto_chunk=2)
    par_x = pareto_prescribe(bf, to_lf.trained, to_lf.init, s_lf, _EPS,
                             np.ones(12), np.zeros(12), NPI_MAXES_DEFAULT,
                             T_TRAIN, cfg, dtype=jnp.float32)
    dx = {k: (v.max() if k in ("cost_max", "front_max") else v.mean())
          for k, v in _divergence(par_lf, par_x).items()}
    for k, bound in F32_BOUNDS.items():
        assert dx[k] <= bound, (
            f"seed {seed}: matched-inputs pallas pareto still exceeds "
            f"{k} = {dx[k]:.4f} > {bound} — prescription-kernel "
            f"divergence, not upstream chaos (own-inputs exceedances: "
            f"{failed})")
    s64 = np.asarray(s_f64, dtype=np.float64)
    sl = np.asarray(s_lf, dtype=np.float64)
    sp = np.asarray(s_pf, dtype=np.float64)
    for r in range(s64.shape[0]):
        scale = max(float(np.abs(s64[r]).max()), 1e-300)
        cross = float(np.abs(sl[r] - sp[r]).max()) / scale
        if cross < 1e-4:
            continue
        el = float(np.abs(sl[r] - s64[r]).max()) / scale
        ep = float(np.abs(sp[r] - s64[r]).max()) / scale
        assert min(el, ep) >= cross / 4, (
            f"seed {seed} r{r}: f32 backends disagree (cross {cross:.3e}) "
            f"but one hugs the f64 truth (lanes {el:.3e}, pallas {ep:.3e})"
            f" — filter-kernel divergence, not precision chaos")


def _sse(x, y, a, b):
    return float(np.sum((y - x @ np.asarray(a) - np.asarray(b)) ** 2))


def _certify_degenerate_nnls(x, y_a, y_b, a_a, b_a, a_b, b_b, tag):
    """Certify that a support difference between two NNLS+intercept
    solutions is a DEGENERATE OPTIMUM, not a divergence: the regression
    inputs must be layout-ordering-close and each backend's solution must
    be optimal on the other's problem (cross-substituted SSE equal).
    Measured on soak seed 117: y reldiff 1.5e-16, SSE gaps <= 5e-16."""
    y_rel = np.abs(y_a - y_b).max() / max(np.abs(y_a).max(), 1e-300)
    assert y_rel < 1e-9, f"{tag}: regression inputs differ {y_rel:.2e}"
    s_aa, s_bb = _sse(x, y_a, a_a, b_a), _sse(x, y_b, a_b, b_b)
    s_ab, s_ba = _sse(x, y_a, a_b, b_b), _sse(x, y_b, a_a, b_a)
    base = max(s_aa, s_bb, 1e-300)
    gap = max(s_ab - s_aa, s_ba - s_bb) / base
    assert gap < 1e-9, (
        f"{tag}: support flip is NOT co-optimal (cross-SSE gap {gap:.2e}; "
        f"sse a={s_aa:.6e} b={s_bb:.6e}) — real backend divergence")


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_backends_agree_on_pathological_data(seed, tmp_path):
    bt, bf = _batches(tmp_path, seed)
    x_win = np.asarray(NPI_MAXES_DEFAULT)[None, None, :] - np.asarray(
        bt.npis)   # regression window == full T_TRAIN here

    # ---- vmap vs lanes at full (f64 on CPU) precision ----
    to_v, scen_v, par_v, s_hist_v = _run(bt, bf, "vmap", None)
    to_l, scen_l, par_l, s_hist_l = _run(bt, bf, "lanes", None)
    a2_v = np.asarray(to_v.trained.a2)
    assert np.isfinite(a2_v).all() and (a2_v >= 0).all()

    rounds = {
        1: (np.asarray(to_v.s_smooth_round1)[:, :, 2],
            np.asarray(to_l.s_smooth_round1)[:, :, 2],
            np.asarray(to_v.trained.a1), np.asarray(to_v.trained.b1),
            np.asarray(to_l.trained.a1), np.asarray(to_l.trained.b1)),
        2: (np.asarray(to_v.s_smooth_round2)[:, :, 2],
            np.asarray(to_l.s_smooth_round2)[:, :, 2],
            a2_v, np.asarray(to_v.trained.b2),
            np.asarray(to_l.trained.a2), np.asarray(to_l.trained.b2)),
    }
    n_regions = a2_v.shape[0]
    flipped = np.zeros(n_regions, dtype=bool)
    for r in range(n_regions):
        for rnd in (1, 2):
            y_v, y_l, av, bv, al, bl = (arr[r] for arr in rounds[rnd])
            if ((av > 0) == (al > 0)).all():
                np.testing.assert_allclose(
                    av, al, rtol=1e-9, atol=1e-12,
                    err_msg=f"seed {seed} r{r} round {rnd}")
                continue
            _certify_degenerate_nnls(x_win[r], y_v, y_l, av, bv, al, bl,
                                     f"seed {seed} r{r} round {rnd}")
            flipped[r] = True
            break   # a round-1 flip makes round-2 inputs incomparable

    j0_v, j1_v = np.asarray(par_v["J0"]), np.asarray(par_v["J1"])
    j0_l, j1_l = np.asarray(par_l["J0"]), np.asarray(par_l["J1"])
    u_v = np.asarray(par_v["u_prescribed"])
    u_l = np.asarray(par_l["u_prescribed"])

    def _relto(a, b, scale):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return float(np.abs(a - b).max() / max(scale, 1e-300))

    sv64 = np.asarray(s_hist_v, float)
    sl64 = np.asarray(s_hist_l, float)
    b1_v, b1_l = np.asarray(to_v.trained.b1), np.asarray(to_l.trained.b1)
    b2_v, b2_l = np.asarray(to_v.trained.b2), np.asarray(to_l.trained.b2)
    a1_v, a1_l = np.asarray(to_v.trained.a1), np.asarray(to_l.trained.a1)
    a2_l = np.asarray(to_l.trained.a2)
    # residue scales: each regression round's target magnitude is the
    # common scale for its (a, b) — a zero intercept at roundoff
    # (seed 1287 r2: b2 = 4.7e-16) has no own scale to measure against
    y1sc = np.abs(rounds[1][0]).max(axis=1)
    y2sc = np.abs(rounds[2][0]).max(axis=1)
    knife = np.zeros(n_regions, dtype=bool)
    for r in range(n_regions):
        if flipped[r]:
            continue
        if (u_v[~_TOP, r] == u_l[~_TOP, r]).all():
            _assert_f64_pareto_parity(
                u_v[:, r], u_l[:, r], j0_v[:, r], j0_l[:, r],
                j1_v[:, r], j1_l[:, r], f"seed {seed} r{r}")
        else:
            # supports matched and params pinned at 1e-9 above, yet a
            # non-endpoint bang-bang cell flipped: certify it as an
            # ulp-scale switching-surface knife edge (+ the factorized
            # matched-inputs check below)
            knife[r] = True
            s1 = max(float(np.abs(a1_v[r]).max()), float(y1sc[r]))
            s2 = max(float(np.abs(a2_v[r]).max()), float(y2sc[r]))
            up = max(_relto(a1_v[r], a1_l[r], s1),
                     _relto(a2_v[r], a2_l[r], s2),
                     _relto(b1_v[r], b1_l[r], s1),
                     _relto(b2_v[r], b2_l[r], s2),
                     _relto(sv64[r], sl64[r],
                            float(np.abs(sv64[r]).max())))
            _certify_f64_knife_edge(
                u_v[:, r], u_l[:, r], j0_v[:, r], j0_l[:, r],
                j1_v[:, r], j1_l[:, r], up, f"seed {seed} r{r}")
    if flipped.any() or knife.any():
        # Certified-degenerate regions: the two backends trained
        # CO-OPTIMAL BUT DIFFERENT models, and even an identical policy
        # re-simulates to different costs under them (soak seed 605:
        # zero u-flips yet 7.8% cost reldiff — a2's weight sits on NPI
        # column 7 in one support, column 10 in the other). Any bound on
        # own-model cost differences measures MODEL MULTIPLICITY, which
        # the degeneracy leaves unbounded — so factorize instead: the
        # downstream pipeline fed LANES' trained params must reproduce
        # lanes' pareto from the vmap backend exactly (u) / at 1e-9
        # (costs), for every region. This isolates the certified
        # training flip from everything after it. Knife-edge regions
        # (supports matched, one ulp-scale switching-surface flip) ride
        # the same check: matched inputs MUST reproduce lanes exactly,
        # so the flip is pinned on the certified upstream residue.
        cfg_x = PipelineConfig(smoother_gain="solve", backend="vmap",
                               pareto_chunk=2)
        par_x = pareto_prescribe(bf, to_l.trained, to_l.init, s_hist_l,
                                 _EPS, np.ones(12), np.zeros(12),
                                 NPI_MAXES_DEFAULT, T_TRAIN, cfg_x)
        u_x = np.asarray(par_x["u_prescribed"])
        j0_x, j1_x = np.asarray(par_x["J0"]), np.asarray(par_x["J1"])
        for r in range(n_regions):
            _assert_f64_pareto_parity(
                u_x[:, r], u_l[:, r], j0_x[:, r], j0_l[:, r],
                j1_x[:, r], j1_l[:, r],
                f"seed {seed} r{r}: vmap-on-lanes-params")

    # ---- lanes vs pallas at matched f32 (the kernels' precision) ----
    to_lf, _, par_lf, s_lf = _run(bt, bf, "lanes", jnp.float32)
    _, _, par_pf, s_pf = _run(bt, bf, "pallas", jnp.float32)
    d = {k: (v.max() if k in ("cost_max", "front_max") else v.mean())
         for k, v in _divergence(par_lf, par_pf).items()}
    failed = {k: (round(float(d[k]), 4), bound)
              for k, bound in F32_BOUNDS.items() if d[k] > bound}
    if failed:
        # An ill-conditioned region can be unresolvable at f32 — both
        # backends drift from the f64 truth by more than they differ
        # from each other, and every downstream cost inherits the offset
        # (soak seed 815). Certify chaos or fail as a real divergence.
        _certify_f32_upstream_chaos(seed, bf, to_lf, s_lf, s_pf,
                                    s_hist_l, par_lf, failed)
