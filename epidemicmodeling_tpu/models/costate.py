"""6-state SI-alpha + Pontryagin costate EKF system with in-filter bang-bang
optimal control.

Reference behavior: Tools/SIAlphaModelEKFOptControlled.m —
- State vector (s, i, alpha, lambda1, lambda2, lambda3).
- NaN entries of the input u are replaced in-filter by the bang-bang optimal
  control: switching function phi = epsilon*w - gamma*lambda3*a; u = u_min
  where phi > 0 else u_max (:48-58). This "NaN requests optimal control"
  convention is what lets one EKF pass smooth over history (known u) and
  prescribe over the future (NaN u).
- Costate dynamics (:69-72) with rho = lambda1 - lambda2 - (1 - epsilon).
- Jacobian includes a finite-slope (width 2/sigma) approximation of the
  bang-bang switch in A[2, 5] (:106-114).

All branches are expressed as jnp.where masks, so the whole system runs
branch-free inside lax.scan and vmaps across the Pareto epsilon axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import EKFSystem
from ..utils.math import clip_lo_hi, clip_hi_lo
from .si_alpha import _obs_update, _obs_jacobian_row, check_obs_type


def bang_bang_fill(u, s6, params):
    """Replace NaN inputs by the bang-bang optimal control law
    (SIAlphaModelEKFOptControlled.m:48-58).

    u: (p,) possibly containing NaN; s6: scalar costate lambda3.
    Returns (u_filled, phi).
    """
    phi = params["epsilon"] * params["w"] - params["gamma"] * s6 * params["a"]
    u_candidate = jnp.where(phi > 0, params["u_min"], params["u_max"])
    return jnp.where(jnp.isnan(u), u_candidate, u), phi


def si_alpha_costate_ekf_system(obs_type: str = "NEWCASES",
                                input_dim: int = 12) -> EKFSystem:
    """Build the 6-state optimal-control EKF system."""
    check_obs_type(obs_type)

    def state_hard_margins(s_k, params, k):
        # SIAlphaModelEKFOptControlled.m:27-31 — costates are unconstrained
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
        # SIAlphaModelEKFOptControlled.m:39-74
        dt = params["dt"]
        u_filled, _ = bang_bang_fill(u, s_k[5], params)
        rho = s_k[3] - s_k[4] - (1.0 - params["epsilon"])

        s1 = clip_lo_hi(s_k[0] - dt * s_k[2] * s_k[0] * s_k[1], 0.0, 1.0)
        i1 = clip_lo_hi(
            s_k[1] + dt * (s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1]),
            0.0, 1.0)
        drive = (-params["gamma"] * s_k[2] + params["gamma"] * params["b"]
                 + params["gamma"] * jnp.dot(params["a"],
                                             params["u_max"] - u_filled))
        a1 = clip_lo_hi(s_k[2] + dt * drive,
                        params["alpha_min"], params["alpha_max"])
        l1 = s_k[3] + dt * rho * s_k[2] * s_k[1]
        l2 = s_k[4] + dt * (rho * s_k[2] * s_k[0] + params["beta"] * s_k[4])
        l3 = s_k[5] + dt * (rho * s_k[0] * s_k[1] + params["gamma"] * s_k[5])
        return u_filled, jnp.stack([s1, i1, a1, l1, l2, l3])

    def state_jacobians(u, s_k, w_bar, params, k):
        # SIAlphaModelEKFOptControlled.m:88-135
        dt = params["dt"]
        dtype = s_k.dtype
        rho = s_k[3] - s_k[4] - (1.0 - params["epsilon"])

        # finite-slope band approximation of the bang-bang switch (:106-114):
        # contributes to A[2, 5] only for NaN inputs with |phi| < 1/sigma.
        phi = params["epsilon"] * params["w"] - params["gamma"] * s_k[5] * params["a"]
        inv_sigma = 1.0 / params["sigma"]
        band = jnp.isnan(u) & (phi > -inv_sigma) & (phi < inv_sigma)
        a36 = -jnp.sum(
            jnp.where(
                band,
                params["gamma"] * dt * (params["sigma"] / 2.0) * params["a"]
                * (params["u_max"] - params["u_min"]),
                jnp.zeros_like(params["a"]),
            ))

        A = jnp.zeros((6, 6), dtype)
        A = A.at[0, 0].set(1.0 - dt * s_k[2] * s_k[1])
        A = A.at[0, 1].set(-dt * s_k[2] * s_k[0])
        A = A.at[0, 2].set(-dt * s_k[0] * s_k[1])
        A = A.at[1, 0].set(dt * s_k[1] * s_k[2])
        A = A.at[1, 1].set(1.0 + dt * (s_k[0] * s_k[2] - params["beta"]))
        A = A.at[1, 2].set(dt * s_k[0] * s_k[1])
        A = A.at[2, 2].set(1.0 - dt * params["gamma"])
        A = A.at[2, 5].set(a36)
        A = A.at[3, 1].set(dt * s_k[2] * rho)
        A = A.at[3, 2].set(dt * s_k[1] * rho)
        A = A.at[3, 3].set(1.0 + dt * s_k[1] * s_k[2])
        A = A.at[3, 4].set(-dt * s_k[1] * s_k[2])
        A = A.at[4, 0].set(dt * s_k[2] * rho)
        A = A.at[4, 2].set(dt * s_k[0] * rho)
        A = A.at[4, 3].set(dt * s_k[0] * s_k[2])
        A = A.at[4, 4].set(1.0 - dt * (s_k[0] * s_k[2] - params["beta"]))
        A = A.at[5, 0].set(dt * s_k[1] * rho)
        A = A.at[5, 1].set(dt * s_k[0] * rho)
        A = A.at[5, 3].set(dt * s_k[0] * s_k[1])
        A = A.at[5, 4].set(-dt * s_k[0] * s_k[1])
        A = A.at[5, 5].set(1.0 + dt * params["gamma"])
        B = jnp.eye(6, dtype=dtype)
        return A, B

    def nlin_obs_update(u, s_k, v_bar, params, k):
        return _obs_update(obs_type, s_k, v_bar)

    def obs_jacobian(u, s_k, v_bar, params, k):
        C = _obs_jacobian_row(obs_type, s_k, 6)
        D = jnp.eye(1, dtype=s_k.dtype)
        return C, D

    return EKFSystem(
        state_dim=6, obs_dim=1, input_dim=input_dim,
        nlin_state_update=nlin_state_update,
        state_jacobians=state_jacobians,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian=obs_jacobian,
        state_hard_margins=state_hard_margins,
        obs_hard_margins=obs_hard_margins,
    )
