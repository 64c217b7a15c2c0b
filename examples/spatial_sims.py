"""Spatial simulation driver (testScripts/testCellularAutomataForPDESolution*.m
+ testPopulation2DMotionDynamics.m): diffusion method comparison, walking
sources, and the social-force population sim.

--video OUT.mp4 (or .gif) additionally renders the walker-CA field and the
population-motion agents as animations — the reference writes AVI videos of
both (testCellularAutomataForPDESolutionWalking.m:65-101,
testPopulation2DMotionDynamics.m rendering loop). Two files are written,
suffixed _walkers and _agents; without ffmpeg the writer falls back to gif.
"""

import argparse
import os

import numpy as np


def main(video=None):
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

    C, traj, fields = walking_sources_sim(
        51, 51, n_walkers=2, n_steps=250, D=1e-2, dt=0.01, dx=0.1, dy=0.1,
        exhale=1.0, key=jax.random.PRNGKey(0), return_fields=True)
    print(f"walking sources: total exhaled mass in field {float(C.sum()):.1f}"
          f" after 250 steps")

    # at the reference's N=150 the XLA broadcast is fine; pass
    # force_backend="pallas" to scale to N ~ 1e5 (tiled VMEM pairwise
    # kernel, O(N) HBM per step — ops/pallas/pairwise.py)
    cfg = PopulationSimConfig(n_subjects=150)
    res = population_motion_sim(cfg, n_steps=500, key=jax.random.PRNGKey(1))
    speed = np.linalg.norm(np.asarray(res.v[-1]), axis=1)
    print(f"population sim: 150 agents x 500 steps; mean speed "
          f"{speed.mean():.2f} m/s; particle field total "
          f"{float(res.C.sum()):.0f}")

    if video:
        from epidemicmodeling_tpu.spatial.agents import default_environment
        from epidemicmodeling_tpu.viz import animate_field, animate_agents
        stem, ext = os.path.splitext(video)
        p1 = animate_field(np.asarray(fields), f"{stem}_walkers{ext}",
                           points=np.asarray(traj), every=2,
                           title="walking exhalation sources")
        _, obstacle_xy = default_environment(cfg)
        p2 = animate_agents(np.asarray(res.p), f"{stem}_agents{ext}",
                            obstacle_xy=np.asarray(obstacle_xy), every=4,
                            bounds=(cfg.x_min, cfg.x_max,
                                    cfg.y_min, cfg.y_max),
                            title="population motion (social forces)")
        print(f"videos written: {p1}, {p2}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=None,
                    help="render animations to this path "
                         "(.mp4 with ffmpeg, .gif otherwise); two files "
                         "are written, suffixed _walkers and _agents")
    main(video=ap.parse_args().video)
