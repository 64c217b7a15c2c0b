"""EKF system-equation plug-in interface.

The reference wires model callbacks into its generic EKF through a struct of
eight function handles (Tools/GenericExtendedKalmanFilter.m:9-34). Here the
same contract is a frozen dataclass of pure functions. All callbacks must be
jittable and branch-free over traced values; `params` is an arbitrary pytree
closed over by `jax.jit` at trace time.

Conventions (time-major, batch-free signatures; batching is done with vmap):
    s : (m,)  state vector
    u : (p,)  control/input vector at one time step (may contain NaN to request
              in-filter optimal control — see models/costate.py)
    x : (n,)  observation vector
    A : (m, m)   state Jacobian      B : (m, l)  process-noise Jacobian
    C : (n, m)   obs Jacobian        D : (n, q)  obs-noise Jacobian
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional


@dataclasses.dataclass(frozen=True)
class EKFSystem:
    """Pluggable system equations for the generic EKF/EKS.

    Mirrors the handle struct of Tools/GenericExtendedKalmanFilter.m:9-34.
    ``state_hessian_terms``/``obs_hessian_terms`` are only consulted when the
    filter is run with order=2 (second-order EKF, as in Tools/Rt_ExpFitEKF.m).
    """

    state_dim: int
    obs_dim: int
    input_dim: int

    # (u, s, w_bar, params, k) -> (u_opt, s_next)
    nlin_state_update: Callable[..., Any]
    # (u, s, w_bar, params, k) -> (A, B)
    state_jacobians: Callable[..., Any]
    # (u, s, v_bar, params, k) -> x
    nlin_obs_update: Callable[..., Any]
    # (u, s, v_bar, params, k) -> (C, D)
    obs_jacobian: Callable[..., Any]
    # (s, params, k) -> s
    state_hard_margins: Callable[..., Any]
    # (x, params, k) -> x
    obs_hard_margins: Callable[..., Any]
    # (u, s, P, w_bar, Q, params, k) -> (fs, Fsp, fw, Fwp)   [order-2 only]
    state_hessian_terms: Optional[Callable[..., Any]] = None
    # (u, s, P, v_bar, R, params, k) -> (gs, Gsp, gv, Gvp)   [order-2 only]
    obs_hessian_terms: Optional[Callable[..., Any]] = None
