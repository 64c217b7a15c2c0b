"""Produce the reference's headline figures from a pipeline run: state
estimates with sigma envelopes, the scenario comparison, and the Pareto
cloud (TrainPredictPrescribeNPI.m plotting sections; Figures/*.png in the
reference repo). Writes PNGs to ./figures/."""

import os

import numpy as np


def main(outdir="figures"):
    import jax
    from epidemicmodeling_tpu.data import synthetic_oxford_frame, \
        NPI_MAXES_DEFAULT
    from epidemicmodeling_tpu.data.preprocess import (preprocess_region,
                                                      build_region_batch)
    from epidemicmodeling_tpu.pipelines import PipelineConfig
    from epidemicmodeling_tpu.pipelines.train_predict_prescribe import \
        run_pipeline
    from epidemicmodeling_tpu.control import epsilon_grid
    from epidemicmodeling_tpu.pipelines.core import train_regions
    from epidemicmodeling_tpu.viz import (plot_state_estimates,
                                          plot_scenarios, plot_pareto_cloud,
                                          plot_training_diagnostic,
                                          plot_npi_schedule,
                                          select_optimal_index)

    os.makedirs(outdir, exist_ok=True)
    _, _, truth = synthetic_oxford_frame(n_regions=3, n_days=260, seed=4)
    T_hist, H = 220, 40
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc)[:T_hist], None,
                                      tr["u"][:T_hist], tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=H)

    cfg = PipelineConfig(num_monte_carlo=200, pareto_chunk=16)
    # train separately so the per-region diagnostic (rho monitor, round-1/2
    # smoothed fits) is available, then reuse the trained params
    tr_out = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, T_hist, cfg)
    res = run_pipeline(bt, bf, None, T_hist, np.ones(12),
                       np.asarray(epsilon_grid(32)), np.zeros(12),
                       NPI_MAXES_DEFAULT, T_hist, cfg,
                       key=jax.random.PRNGKey(0), trained=tr_out.trained)

    r = 0
    pop = float(res.trained.population[r])
    sh = np.asarray(res.s_hist[r])
    plot_state_estimates(s_smooth=sh, title=f"{names[r]} smoothed states",
                         path=f"{outdir}/states.png")

    scen = res.scenarios
    cases = {}
    for label in ("fixed", "zero", "max"):
        sc = scen[label]
        cases[f"{label} NPI"] = np.asarray(sc.s[r] * sc.i[r] * sc.alpha[r])
    J0 = np.asarray(res.pareto["J0"][:, r])
    J1 = np.asarray(res.pareto["J1"][:, r])
    i_opt = select_optimal_index(J0, J1)
    cases["optimal NPI"] = np.asarray(
        res.pareto["s"][i_opt, r] * res.pareto["i"][i_opt, r]
        * res.pareto["alpha"][i_opt, r])
    plot_scenarios(cases, population=pop,
                   title=f"{names[r]} scenario comparison",
                   path=f"{outdir}/scenarios.png")

    plot_pareto_cloud(
        np.asarray(res.monte_carlo["J0"][:, r]),
        np.asarray(res.monte_carlo["J1"][:, r]), J0, J1,
        front_mask=res.pareto_front[:, r],
        J0_fixed=float(scen["fixed"].J0[r]),
        J1_fixed=float(scen["fixed"].J1[r]), population=pop,
        title=f"{names[r]} Pareto tradeoff",
        path=f"{outdir}/pareto.png")
    # per-region training diagnostic: new-case fits, rho monitor,
    # alpha-vs-regression-fit, NPI schedule (the reference's 4-panel
    # debug figure, TrainPredictPrescribeNPI.m:697-733)
    plot_training_diagnostic(
        bt.new_cases_norm[r], np.asarray(tr_out.s_smooth_round1[r]),
        np.asarray(tr_out.s_smooth_round2[r]),
        np.asarray(tr_out.rho_round1[r]), np.asarray(tr_out.rho_round2[r]),
        bt.npis[r],
        a1=np.asarray(res.trained.a1[r]), b1=float(res.trained.b1[r]),
        a2=np.asarray(res.trained.a2[r]), b2=float(res.trained.b2[r]),
        npi_maxes=NPI_MAXES_DEFAULT, num_regression_days=T_hist,
        population=pop, title=f"{names[r]} training diagnostic",
        path=f"{outdir}/training_diagnostic.png")

    # NPI-schedule overlay: history + the optimal-epsilon prescription
    plot_npi_schedule(
        bt.npis[r],
        u_prescribed=np.asarray(res.pareto["u_prescribed"])[i_opt, r],
        npi_maxes=NPI_MAXES_DEFAULT,
        title=f"{names[r]} NPI schedule (optimal eps index {i_opt})",
        path=f"{outdir}/npi_schedule.png")

    print(f"wrote {outdir}/states.png, scenarios.png, pareto.png, "
          f"training_diagnostic.png, npi_schedule.png "
          f"(optimal index {i_opt})")


if __name__ == "__main__":
    main()
