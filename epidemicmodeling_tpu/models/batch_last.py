"""Batch-last (lanes-minor) SI-alpha system equations for the TPU fast path.

Same semantics as models/si_alpha.py (Tools/SIAlphaModelEKF.m) and
models/costate.py (Tools/SIAlphaModelEKFOptControlled.m), but every callback
carries a trailing lane axis B: states (m, B), inputs (p, B), params leaves
scalar/(B,)/(p, B). See ops/ekf_bl.py for why this layout matters on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import clip_lo_hi, clip_hi_lo
from ..ops.ekf_bl import EKFSystemBL


def _dot_p(a, v):
    """sum over the NPI axis: a (p, B) or (p,), v (p, B) -> (B,)."""
    return jnp.sum(a * v, axis=0)


def si_alpha_ekf_system_bl(obs_type: str = "NEWCASES",
                           input_dim: int = 12) -> EKFSystemBL:
    """3-state batch-last system (Tools/SIAlphaModelEKF.m:27-89)."""

    def state_hard_margins(s, params, k):
        return jnp.stack([
            clip_hi_lo(s[0], params["s_min"], 1.0),
            clip_hi_lo(s[1], params["i_min"], 1.0),
            clip_hi_lo(s[2], params["alpha_min"], params["alpha_max"]),
        ])

    def obs_hard_margins(x, params, k):
        return jnp.maximum(x, 0.0)

    def nlin_state_update(u, s, params, k):
        dt = params["dt"]
        s1 = clip_lo_hi(s[0] - dt * s[2] * s[0] * s[1], params["s_min"], 1.0)
        i1 = clip_lo_hi(s[1] + dt * (s[2] * s[0] * s[1]
                                     - params["beta"] * s[1]),
                        params["i_min"], 1.0)
        drive = (-params["gamma"] * s[2] + params["gamma"] * params["b"]
                 + params["gamma"] * _dot_p(params["a"],
                                            params["u_max"] - u))
        a1 = clip_lo_hi(s[2] + dt * drive, params["alpha_min"],
                        params["alpha_max"])
        return u, jnp.stack([s1, i1, a1])

    def state_jacobian(u, s, params, k):
        dt = params["dt"]
        B = s.shape[-1]
        one = jnp.ones_like(s[0])
        zero = jnp.zeros_like(s[0])
        return jnp.stack([
            jnp.stack([one - dt * s[2] * s[1], -dt * s[2] * s[0],
                       -dt * s[0] * s[1]]),
            jnp.stack([dt * s[1] * s[2],
                       one + dt * (s[0] * s[2] - params["beta"]),
                       dt * s[0] * s[1]]),
            jnp.stack([zero, zero, one - dt * params["gamma"]]),
        ])

    if obs_type == "NEWCASES":
        def nlin_obs_update(s, params, k):
            return s[0] * s[1] * s[2]

        def obs_jacobian_row(s, params, k):
            return jnp.stack([s[1] * s[2], s[0] * s[2], s[0] * s[1]])
    elif obs_type == "TOTALCASES":
        def nlin_obs_update(s, params, k):
            return 1.0 - s[0]

        def obs_jacobian_row(s, params, k):
            zero = jnp.zeros_like(s[0])
            return jnp.stack([-jnp.ones_like(s[0]), zero, zero])
    else:
        raise ValueError(f"unknown observation type {obs_type!r}")

    return EKFSystemBL(
        state_dim=3, input_dim=input_dim,
        nlin_state_update=nlin_state_update,
        state_jacobian=state_jacobian,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian_row=obs_jacobian_row,
        state_hard_margins=state_hard_margins,
        obs_hard_margins=obs_hard_margins,
    )


def si_alpha_costate_ekf_system_bl(obs_type: str = "NEWCASES",
                                   input_dim: int = 12) -> EKFSystemBL:
    """6-state optimal-control batch-last system
    (Tools/SIAlphaModelEKFOptControlled.m:27-148)."""

    def state_hard_margins(s, params, k):
        return jnp.stack([
            clip_hi_lo(s[0], 0.0, 1.0),
            clip_hi_lo(s[1], 0.0, 1.0),
            clip_hi_lo(s[2], params["alpha_min"], params["alpha_max"]),
            s[3], s[4], s[5],
        ])

    def obs_hard_margins(x, params, k):
        return jnp.maximum(x, 0.0)

    def _phi(s5, params):
        # (p, B): switching function epsilon*w - gamma*lambda3*a
        return (params["epsilon"] * params["w"]
                - params["gamma"] * s5[None, :] * params["a"])

    def nlin_state_update(u, s, params, k):
        dt = params["dt"]
        phi = _phi(s[5], params)
        u_cand = jnp.where(phi > 0,
                           jnp.broadcast_to(params["u_min"], u.shape),
                           jnp.broadcast_to(params["u_max"], u.shape))
        u_filled = jnp.where(jnp.isnan(u), u_cand, u)
        rho = s[3] - s[4] - (1.0 - params["epsilon"])

        s1 = clip_lo_hi(s[0] - dt * s[2] * s[0] * s[1], 0.0, 1.0)
        i1 = clip_lo_hi(s[1] + dt * (s[2] * s[0] * s[1]
                                     - params["beta"] * s[1]), 0.0, 1.0)
        drive = (-params["gamma"] * s[2] + params["gamma"] * params["b"]
                 + params["gamma"] * _dot_p(params["a"],
                                            params["u_max"] - u_filled))
        a1 = clip_lo_hi(s[2] + dt * drive, params["alpha_min"],
                        params["alpha_max"])
        l1 = s[3] + dt * rho * s[2] * s[1]
        l2 = s[4] + dt * (rho * s[2] * s[0] + params["beta"] * s[4])
        l3 = s[5] + dt * (rho * s[0] * s[1] + params["gamma"] * s[5])
        return u_filled, jnp.stack([s1, i1, a1, l1, l2, l3])

    def state_jacobian(u, s, params, k):
        dt = params["dt"]
        one = jnp.ones_like(s[0])
        zero = jnp.zeros_like(s[0])
        rho = s[3] - s[4] - (1.0 - params["epsilon"])

        phi = _phi(s[5], params)
        inv_sigma = 1.0 / params["sigma"]
        band = jnp.isnan(u) & (phi > -inv_sigma) & (phi < inv_sigma)
        umax = jnp.broadcast_to(params["u_max"], u.shape)
        umin = jnp.broadcast_to(params["u_min"], u.shape)
        a_b = jnp.broadcast_to(params["a"], u.shape)
        a36 = -jnp.sum(
            jnp.where(band,
                      params["gamma"] * dt * (params["sigma"] / 2.0)
                      * a_b * (umax - umin), 0.0), axis=0)

        row0 = jnp.stack([one - dt * s[2] * s[1], -dt * s[2] * s[0],
                          -dt * s[0] * s[1], zero, zero, zero])
        row1 = jnp.stack([dt * s[1] * s[2],
                          one + dt * (s[0] * s[2] - params["beta"]),
                          dt * s[0] * s[1], zero, zero, zero])
        row2 = jnp.stack([zero, zero, one - dt * params["gamma"],
                          zero, zero, a36])
        row3 = jnp.stack([zero, dt * s[2] * rho, dt * s[1] * rho,
                          one + dt * s[1] * s[2], -dt * s[1] * s[2], zero])
        row4 = jnp.stack([dt * s[2] * rho, zero, dt * s[0] * rho,
                          dt * s[0] * s[2],
                          one - dt * (s[0] * s[2] - params["beta"]), zero])
        row5 = jnp.stack([dt * s[1] * rho, dt * s[0] * rho, zero,
                          dt * s[0] * s[1], -dt * s[0] * s[1],
                          one + dt * params["gamma"]])
        return jnp.stack([row0, row1, row2, row3, row4, row5])

    if obs_type == "NEWCASES":
        def nlin_obs_update(s, params, k):
            return s[0] * s[1] * s[2]

        def obs_jacobian_row(s, params, k):
            zero = jnp.zeros_like(s[0])
            return jnp.stack([s[1] * s[2], s[0] * s[2], s[0] * s[1],
                              zero, zero, zero])
    elif obs_type == "TOTALCASES":
        def nlin_obs_update(s, params, k):
            return 1.0 - s[0]

        def obs_jacobian_row(s, params, k):
            zero = jnp.zeros_like(s[0])
            return jnp.stack([-jnp.ones_like(s[0]), zero, zero,
                              zero, zero, zero])
    else:
        raise ValueError(f"unknown observation type {obs_type!r}")

    return EKFSystemBL(
        state_dim=6, input_dim=input_dim,
        nlin_state_update=nlin_state_update,
        state_jacobian=state_jacobian,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian_row=obs_jacobian_row,
        state_hard_margins=state_hard_margins,
        obs_hard_margins=obs_hard_margins,
    )
