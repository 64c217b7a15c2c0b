"""Prescribe from a saved checkpoint without retraining — the
testScripts/testPrescribeXPRIZE01.m flow: load trained (a, b) coefficients,
rebuild the historic state, sweep epsilon, score against random policies.

Usage: python examples/prescribe_from_checkpoint.py [params.npz]
(no argument: trains once on synthetic data, saves, then reloads)."""

import sys

import numpy as np


def main(argv):
    import jax
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.data.preprocess import (preprocess_region,
                                                      build_region_batch,
                                                      NPI_MAXES_DEFAULT)
    from epidemicmodeling_tpu.pipelines import (PipelineConfig,
                                                save_trained_params,
                                                load_trained_params)
    from epidemicmodeling_tpu.pipelines.core import (train_regions,
                                                     forecast_scenarios)
    from epidemicmodeling_tpu.pipelines.prescribe import \
        prescribe_from_checkpoint
    from epidemicmodeling_tpu.control import epsilon_grid, \
        pareto_front_mask_batched

    T_hist, H = 180, 40
    _, _, truth = synthetic_oxford_frame(n_regions=3, n_days=T_hist, seed=6)
    sers, names = [], []
    for name, tr in truth.items():
        nc = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
        sers.append(preprocess_region(np.cumsum(nc), None, tr["u"],
                                      tr["pop"]))
        names.append(name)
    bt = build_region_batch(sers, names)
    bf = build_region_batch(sers, names, horizon=H)
    cfg = PipelineConfig(pareto_chunk=16)

    if len(argv) > 1:
        trained = load_trained_params(argv[1])
        print(f"loaded checkpoint {argv[1]}: {len(trained.names)} regions")
        out = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, T_hist, cfg)
        init = out.init
    else:
        out = train_regions(bt, np.zeros(12), NPI_MAXES_DEFAULT, T_hist, cfg)
        save_trained_params("trained_params", out.trained)
        trained = load_trained_params("trained_params")
        init = out.init
        print("trained + checkpointed + reloaded")

    scen, s_hist = forecast_scenarios(bf, trained, init, np.ones(12),
                                      np.zeros(12), NPI_MAXES_DEFAULT,
                                      T_hist, cfg)
    # the paper-scale 2000-point epsilon sweep (testPrescribeXPRIZE01.m:160)
    eps = np.asarray(epsilon_grid(2000))
    par, mc = prescribe_from_checkpoint(
        trained, bf, s_hist, init, eps, np.ones(12), np.zeros(12),
        NPI_MAXES_DEFAULT, T_hist, cfg, key=jax.random.PRNGKey(0))
    front = np.asarray(pareto_front_mask_batched(par["J0"], par["J1"]))
    print(f"swept {len(eps)} epsilon values; front sizes: "
          f"{front.sum(axis=0)}; MC baseline {mc['J0'].shape[0]} policies")


if __name__ == "__main__":
    main(sys.argv)
