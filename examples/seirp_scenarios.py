"""SEIRP scenario study driver (testScripts/testSEIRP01-03.m): run the five
named scenarios, print peak infections/final deaths, check observability and
the analytic eigenvalues, and compare saturated vs unlimited healthcare."""

import numpy as np


def main():
    # scalar sequential ODE rollouts + eigenanalysis: no batch axis, so the
    # TPU gains nothing and per-scenario XLA compiles dominate (~2 min each
    # through the axon remote-compile tunnel). Run on CPU in float64.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from epidemicmodeling_tpu.analysis import (
        SEIRP_SCENARIOS, run_seirp_scenario, seirp_early_phase_matrix,
        seirp_early_eigen, obsv)
    from epidemicmodeling_tpu.models import seirp_saturated_rollout

    print("scenario | peak i | final deaths (fraction) | eig3 (growth rate)")
    for name in SEIRP_SCENARIOS:
        res = run_seirp_scenario(name, dt=0.5)
        rates = {k: float(v[0]) for k, v in res["rates"].items()}
        lam = np.asarray(seirp_early_eigen(**rates))
        print(f"   {name}     | {float(max(res['i'])):.4f} | "
              f"{float(res['p'][-1]):.5f}            | {lam[2]:+.4f}")

    A = seirp_early_phase_matrix(
        alpha_e=0.65, alpha_i=0.005, kappa=0.05, rho=0.08, beta=0.1,
        mu=0.02, gamma=0.0)
    C = np.concatenate([np.zeros((3, 1)), np.eye(3)], axis=1)
    rank = np.linalg.matrix_rank(np.asarray(obsv(A, C)))
    print(f"observability rank (observing i, r, p): {rank} / 4")

    # saturated-resource breakdown (testSEIRP03)
    K = 4000
    r5 = [np.full(K, v) for v in (0.9, 0.5, 0.3, 0.0, 0.0)]
    args = (0.99, 0.005, 0.005, 0.0, 0.0, 400.0, 0.1)
    _, _, _, _, p_sat = seirp_saturated_rollout(
        *r5, *args, 0.1, 0.05, 0.02, 0.2, 0.01, 0.05)
    _, _, _, _, p_nom = seirp_saturated_rollout(
        *r5, *args, 0.1, 0.1, 0.02, 0.02, 0.01, 0.05)
    print(f"healthcare breakdown deaths: saturated {float(p_sat[-1]):.4f} "
          f"vs unlimited {float(p_nom[-1]):.4f}")


if __name__ == "__main__":
    main()
