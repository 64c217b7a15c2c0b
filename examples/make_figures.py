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
    from epidemicmodeling_tpu.viz import (plot_state_estimates,
                                          plot_scenarios, plot_pareto_cloud,
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
    res = run_pipeline(bt, bf, None, T_hist, np.ones(12),
                       np.asarray(epsilon_grid(32)), np.zeros(12),
                       NPI_MAXES_DEFAULT, T_hist, cfg,
                       key=jax.random.PRNGKey(0))

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
    print(f"wrote {outdir}/states.png, scenarios.png, pareto.png "
          f"(optimal index {i_opt})")


if __name__ == "__main__":
    main()
