"""Time-reversed SI-alpha EKF systems (backward filtering).

Reference behavior: Tools/SIAlphaModelBackwardEKF.m and
Tools/SIAlphaModelBackwardEKFOptControlled.m — flip the input/observation
sequences, swap initial and terminal conditions, run the generic EKF with
SIGN-FLIPPED dynamics (the Euler step integrated backward in time,
BackwardEKF.m:65-67), then flip the results back. Noise schedules (Q_w, R_v)
are passed through UNFLIPPED, matching the reference exactly
(BackwardEKF.m:27 passes R_v as-is).

Note the backward 3-state margins clip s, i to [0, 1] (not [s_min, 1]) —
a deliberate difference from the forward model (BackwardEKF.m:48-52).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import EKFSystem
from ..utils.math import clip_lo_hi, clip_hi_lo
from .si_alpha import _obs_update, _obs_jacobian_row, check_obs_type
from .costate import bang_bang_fill


def si_alpha_backward_ekf_system(obs_type: str = "NEWCASES",
                                 input_dim: int = 12) -> EKFSystem:
    """3-state time-reversed system (SIAlphaModelBackwardEKF.m:48-110)."""
    check_obs_type(obs_type)

    def state_hard_margins(s_k, params, k):
        return jnp.stack([
            clip_hi_lo(s_k[0], 0.0, 1.0),
            clip_hi_lo(s_k[1], 0.0, 1.0),
            clip_hi_lo(s_k[2], params["alpha_min"], params["alpha_max"]),
        ])

    def obs_hard_margins(x_k, params, k):
        return jnp.maximum(x_k, 0.0)

    def nlin_state_update(u, s_k, w_bar, params, k):
        dt = params["dt"]
        s1 = clip_lo_hi(s_k[0] + dt * s_k[2] * s_k[0] * s_k[1], 0.0, 1.0)
        i1 = clip_lo_hi(
            s_k[1] - dt * (s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1]),
            0.0, 1.0)
        drive = (-params["gamma"] * s_k[2] + params["gamma"] * params["b"]
                 + params["gamma"] * jnp.dot(params["a"],
                                             params["u_max"] - u))
        a1 = clip_lo_hi(s_k[2] - dt * drive,
                        params["alpha_min"], params["alpha_max"])
        return u, jnp.stack([s1, i1, a1])

    def state_jacobians(u, s_k, w_bar, params, k):
        dt = params["dt"]
        z = jnp.zeros((), s_k.dtype)
        A = jnp.array([
            [1.0 + dt * s_k[2] * s_k[1], dt * s_k[2] * s_k[0],
             dt * s_k[0] * s_k[1]],
            [-dt * s_k[1] * s_k[2],
             1.0 - dt * (s_k[0] * s_k[2] - params["beta"]),
             -dt * s_k[0] * s_k[1]],
            [z, z, 1.0 + dt * params["gamma"]],
        ])
        return A, jnp.eye(3, dtype=s_k.dtype)

    def nlin_obs_update(u, s_k, v_bar, params, k):
        return _obs_update(obs_type, s_k, v_bar)

    def obs_jacobian(u, s_k, v_bar, params, k):
        return _obs_jacobian_row(obs_type, s_k, 3), jnp.eye(1, dtype=s_k.dtype)

    return EKFSystem(
        state_dim=3, obs_dim=1, input_dim=input_dim,
        nlin_state_update=nlin_state_update,
        state_jacobians=state_jacobians,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian=obs_jacobian,
        state_hard_margins=state_hard_margins,
        obs_hard_margins=obs_hard_margins,
    )


def si_alpha_costate_backward_ekf_system(obs_type: str = "NEWCASES",
                                         input_dim: int = 12) -> EKFSystem:
    """6-state time-reversed optimal-control system
    (SIAlphaModelBackwardEKFOptControlled.m:81-156): sign-flipped SI-alpha +
    costate dynamics with the same in-filter bang-bang NaN replacement."""
    check_obs_type(obs_type)

    def state_hard_margins(s_k, params, k):
        return jnp.concatenate([
            jnp.stack([
                clip_hi_lo(s_k[0], 0.0, 1.0),
                clip_hi_lo(s_k[1], 0.0, 1.0),
                clip_hi_lo(s_k[2], params["alpha_min"], params["alpha_max"]),
            ]),
            s_k[3:6],
        ])

    def obs_hard_margins(x_k, params, k):
        return jnp.maximum(x_k, 0.0)

    def nlin_state_update(u, s_k, w_bar, params, k):
        dt = params["dt"]
        u_filled, _ = bang_bang_fill(u, s_k[5], params)
        rho = s_k[3] - s_k[4] - (1.0 - params["epsilon"])
        s1 = clip_lo_hi(s_k[0] + dt * s_k[2] * s_k[0] * s_k[1], 0.0, 1.0)
        i1 = clip_lo_hi(
            s_k[1] - dt * (s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1]),
            0.0, 1.0)
        drive = (-params["gamma"] * s_k[2] + params["gamma"] * params["b"]
                 + params["gamma"] * jnp.dot(params["a"],
                                             params["u_max"] - u_filled))
        a1 = clip_lo_hi(s_k[2] - dt * drive,
                        params["alpha_min"], params["alpha_max"])
        l1 = s_k[3] - dt * rho * s_k[2] * s_k[1]
        l2 = s_k[4] - dt * (rho * s_k[2] * s_k[0] + params["beta"] * s_k[4])
        l3 = s_k[5] - dt * (rho * s_k[0] * s_k[1] + params["gamma"] * s_k[5])
        return u_filled, jnp.stack([s1, i1, a1, l1, l2, l3])

    def state_jacobians(u, s_k, w_bar, params, k):
        dt = params["dt"]
        dtype = s_k.dtype
        rho = s_k[3] - s_k[4] - (1.0 - params["epsilon"])
        phi = (params["epsilon"] * params["w"]
               - params["gamma"] * s_k[5] * params["a"])
        inv_sigma = 1.0 / params["sigma"]
        band = jnp.isnan(u) & (phi > -inv_sigma) & (phi < inv_sigma)
        a36 = jnp.sum(jnp.where(
            band,
            params["gamma"] * dt * (params["sigma"] / 2.0) * params["a"]
            * (params["u_max"] - params["u_min"]),
            jnp.zeros_like(params["a"])))

        A = jnp.zeros((6, 6), dtype)
        A = A.at[0, 0].set(1.0 + dt * s_k[2] * s_k[1])
        A = A.at[0, 1].set(dt * s_k[2] * s_k[0])
        A = A.at[0, 2].set(dt * s_k[0] * s_k[1])
        A = A.at[1, 0].set(-dt * s_k[1] * s_k[2])
        A = A.at[1, 1].set(1.0 - dt * (s_k[0] * s_k[2] - params["beta"]))
        A = A.at[1, 2].set(-dt * s_k[0] * s_k[1])
        A = A.at[2, 2].set(1.0 + dt * params["gamma"])
        A = A.at[2, 5].set(a36)
        A = A.at[3, 1].set(-dt * s_k[2] * rho)
        A = A.at[3, 2].set(-dt * s_k[1] * rho)
        A = A.at[3, 3].set(1.0 - dt * s_k[1] * s_k[2])
        A = A.at[3, 4].set(dt * s_k[1] * s_k[2])
        A = A.at[4, 0].set(-dt * s_k[2] * rho)
        A = A.at[4, 2].set(-dt * s_k[0] * rho)
        A = A.at[4, 3].set(-dt * s_k[0] * s_k[2])
        A = A.at[4, 4].set(1.0 + dt * (s_k[0] * s_k[2] - params["beta"]))
        A = A.at[5, 0].set(-dt * s_k[1] * rho)
        A = A.at[5, 1].set(-dt * s_k[0] * rho)
        A = A.at[5, 3].set(-dt * s_k[0] * s_k[1])
        A = A.at[5, 4].set(dt * s_k[0] * s_k[1])
        A = A.at[5, 5].set(1.0 - dt * params["gamma"])
        return A, jnp.eye(6, dtype=dtype)

    def nlin_obs_update(u, s_k, v_bar, params, k):
        return _obs_update(obs_type, s_k, v_bar)

    def obs_jacobian(u, s_k, v_bar, params, k):
        return _obs_jacobian_row(obs_type, s_k, 6), jnp.eye(1, dtype=s_k.dtype)

    return EKFSystem(
        state_dim=6, obs_dim=1, input_dim=input_dim,
        nlin_state_update=nlin_state_update,
        state_jacobians=state_jacobians,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian=obs_jacobian,
        state_hard_margins=state_hard_margins,
        obs_hard_margins=obs_hard_margins,
    )
