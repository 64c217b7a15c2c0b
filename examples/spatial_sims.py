"""Spatial simulation driver (testScripts/testCellularAutomataForPDESolution*.m
+ testPopulation2DMotionDynamics.m): diffusion method comparison, walking
sources, and the social-force population sim."""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from epidemicmodeling_tpu.spatial import (diffusion_rollout,
                                              PopulationSimConfig,
                                              population_motion_sim)
    from epidemicmodeling_tpu.spatial.walkers import walking_sources_sim

    # two-point-source diffusion, both discretizations (reference grid 51x51)
    C0 = np.zeros((51, 51))
    C0[25, 25] = 1.0
    C0[16, 12] = 1.0
    c4 = diffusion_rollout(C0, 1e-1, 0.01, 0.1, 0.1, 249, neighborhood=4)
    c8 = diffusion_rollout(C0, 1e-1, 0.01, 0.1, 0.1, 249, neighborhood=8)
    corr = np.corrcoef(np.asarray(c4[-1]).ravel(),
                       np.asarray(c8[-1]).ravel())[0, 1]
    print(f"diffusion: 4- vs 8-neighbor field correlation after 249 steps: "
          f"{corr:.4f}; peaks {float(c4[-1].max()):.4e} / "
          f"{float(c8[-1].max()):.4e}")

    C, traj = walking_sources_sim(51, 51, n_walkers=2, n_steps=250, D=1e-2,
                                  dt=0.01, dx=0.1, dy=0.1, exhale=1.0,
                                  key=jax.random.PRNGKey(0))
    print(f"walking sources: total exhaled mass in field {float(C.sum()):.1f}"
          f" after 250 steps")

    cfg = PopulationSimConfig(n_subjects=150)
    res = population_motion_sim(cfg, n_steps=500, key=jax.random.PRNGKey(1))
    speed = np.linalg.norm(np.asarray(res.v[-1]), axis=1)
    print(f"population sim: 150 agents x 500 steps; mean speed "
          f"{speed.mean():.2f} m/s; particle field total "
          f"{float(res.C.sum()):.0f}")


if __name__ == "__main__":
    main()
