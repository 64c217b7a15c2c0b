"""Rt estimator cross-comparison driver (testScripts/test01FitExponential.m):
run the four growth-rate estimators on the same new-case series and print
their agreement."""

import numpy as np


def main():
    import jax.numpy as jnp
    from epidemicmodeling_tpu.data import synthetic_oxford_frame
    from epidemicmodeling_tpu.rt import (rt_expfit_gen_ratios,
                                         rt_expfit_log_lin_reg,
                                         rt_expfit_nonlin_ls, rt_expfit_ekf)

    _, _, truth = synthetic_oxford_frame(n_regions=1, n_days=200, seed=1)
    tr = next(iter(truth.values()))
    cases = tr["s"] * tr["i"] * tr["alpha"] * tr["pop"]
    cases = np.maximum(cases, 1e-3)

    _, lam_gr, _, lam_gr_s = rt_expfit_gen_ratios(cases, 7, 3, 1.0)
    _, _, lam_lr, _ = rt_expfit_log_lin_reg(jnp.asarray(cases), 14, 1.0)
    _, _, lam_ls, _ = rt_expfit_nonlin_ls(jnp.asarray(cases), 14, 1.0)
    res = rt_expfit_ekf(
        jnp.asarray(cases), s_init=jnp.array([float(cases[0]), 0.0]),
        time_scale=1.0, alpha=1.0, sigma=1.0, w_bar=jnp.zeros(2),
        v_bar=jnp.zeros(1), Ps_init=jnp.diag(jnp.array([1.0, 0.1])),
        Q_w=jnp.diag(jnp.array([1e-1, 1e-4])),
        R_v=jnp.array([[1e-1]]), order=2)
    lam_ekf = np.asarray(res.s_smooth[:, 1])

    print("day | gen-ratios | log-lin | nonlin-LS | EKF(2nd)")
    for t in range(30, 200, 30):
        print(f"{t:4d} | {float(lam_gr_s[t]):10.4f} | "
              f"{float(lam_lr[t]):7.4f} | {float(lam_ls[t]):9.4f} | "
              f"{lam_ekf[t]:8.4f}")


if __name__ == "__main__":
    main()
