"""SI and SI-alpha contact-rate models + the 3-state EKF system plug-in.

Reference behavior:
- Tools/SI_Controlled.m:19-22 — 2-state SI Euler with time-varying alpha(t),
  states clipped to [0, 1].
- Tools/SIalpha_Controlled.m:24-28 — 3-state (s, i, alpha) stochastic Euler;
  alpha follows a first-order relaxation driven by the NPI input u:
  alpha' = -gamma*alpha + gamma*b + gamma*a'(u_max - u); optional Gaussian
  process noise per state; outputs drop the initial condition (:30-32).
- Tools/SIAlphaModelEKF.m:27-89 — EKF system equations (state update, Jacobian,
  observation models NEWCASES: x = s*i*alpha and TOTALCASES: x = 1 - s, hard
  margins).

Params convention: a flat dict of (possibly batched) arrays so the same system
vmaps over regions (per-region beta, a, b) and over the Pareto epsilon axis.
Keys: dt, beta, gamma, a (p,), b, u_min (p,), u_max (p,), s_min, i_min,
alpha_min, alpha_max, epsilon, w (p,), sigma.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import EKFSystem
from ..utils.math import clip_lo_hi, clip_hi_lo


def si_controlled_rollout(alpha, beta, s0, i0, K, dt):
    """SI model with prescribed alpha(t): returns (s, i), each (K,), first
    sample = initial condition (Tools/SI_Controlled.m)."""
    fdtype = jnp.result_type(float)
    alpha = jnp.broadcast_to(jnp.asarray(alpha, fdtype), (K,))
    x0 = jnp.stack([jnp.asarray(s0, fdtype), jnp.asarray(i0, fdtype)])

    def body(carry, a_t):
        s, i = carry[0], carry[1]
        s1 = clip_lo_hi(s - dt * a_t * s * i, 0.0, 1.0)
        i1 = clip_lo_hi(i + dt * (a_t * s * i - beta * i), 0.0, 1.0)
        return jnp.stack([s1, i1]), carry

    _, traj = jax.lax.scan(body, x0, alpha[:K], length=K)
    return traj[:, 0], traj[:, 1]


def si_alpha_step_fields(s, i, al, u_t, n_s, n_i, n_al, params):
    """One Euler step of the controlled SI-alpha model on unpacked state
    fields (Tools/SIalpha_Controlled.m:25-27). Everything broadcasts: the
    fields and noise draws are (...,) batches, u_t and params["a"]/["u_max"]
    are (..., p). Batched callers carry plain (B,) arrays through lax.scan
    instead of a stacked (..., 3) state — a trailing 3-wide axis pads to the
    128-lane TPU tile (~43x HBM waste inside the scan)."""
    dt = params["dt"]
    s1 = clip_lo_hi(
        s - dt * (al * s * i + n_s * params["s_noise_std"]), 0.0, 1.0)
    i1 = clip_lo_hi(
        i + dt * (al * s * i - params["beta"] * i
                  + n_i * params["i_noise_std"]), 0.0, 1.0)
    drive = (-params["gamma"] * al + params["gamma"] * params["b"]
             + params["gamma"] * jnp.sum(
                 params["a"] * (params["u_max"] - u_t), axis=-1)
             + n_al * params["alpha_noise_std"])
    a1 = clip_lo_hi(al + dt * drive, params["alpha_min"], params["alpha_max"])
    return s1, i1, a1


def si_alpha_step(state, u_t, noise_t, params):
    """One Euler step of the controlled SI-alpha model with additive process
    noise inside the derivative (Tools/SIalpha_Controlled.m:25-27).

    state: (3,) [s, i, alpha]; u_t: (p,) NPI input; noise_t: (3,) standard
    normal draws (pass zeros for the deterministic model).
    """
    s1, i1, a1 = si_alpha_step_fields(state[0], state[1], state[2], u_t,
                                      noise_t[0], noise_t[1], noise_t[2],
                                      params)
    return jnp.stack([s1, i1, a1])


def si_alpha_controlled_rollout(u, s0, i0, alpha0, u_max, alpha_min, alpha_max,
                                gamma, a, b, beta, s_noise_std, i_noise_std,
                                alpha_noise_std, K, dt, key=None):
    """Roll the controlled SI-alpha model for K steps, dropping the initial
    condition from the outputs exactly like Tools/SIalpha_Controlled.m:30-32.

    u: (p, K) NPI schedule (input-major like the reference) or (K, p).
    key: optional PRNG key for the stochastic model; None => noise-free.
    Returns (s, i, alpha), each (K,).
    """
    fdtype = jnp.result_type(float)
    u = jnp.asarray(u, fdtype)
    if u.ndim == 2 and u.shape[1] == K and u.shape[0] != K:
        u = u.T  # accept reference-style (p, K)
    params = {
        "dt": dt, "beta": beta, "gamma": gamma,
        "a": jnp.asarray(a, fdtype).reshape(-1),
        "b": b, "u_max": jnp.asarray(u_max, fdtype).reshape(-1),
        "alpha_min": alpha_min, "alpha_max": alpha_max,
        "s_noise_std": s_noise_std, "i_noise_std": i_noise_std,
        "alpha_noise_std": alpha_noise_std,
    }
    if key is None:
        noise = jnp.zeros((K, 3), fdtype)
    else:
        noise = jax.random.normal(key, (K, 3), fdtype)
    x0 = jnp.stack([jnp.asarray(s0, fdtype), jnp.asarray(i0, fdtype),
                    jnp.asarray(alpha0, fdtype)])

    def body(carry, inp):
        u_t, n_t = inp
        nxt = si_alpha_step(carry, u_t, n_t, params)
        return nxt, nxt  # outputs exclude the initial condition

    _, traj = jax.lax.scan(body, x0, (u[:K], noise), length=K)
    return traj[:, 0], traj[:, 1], traj[:, 2]


def SIAlphaParams(*, dt, beta, gamma, a, b, u_min, u_max, s_min, i_min,
                  alpha_min, alpha_max, epsilon=jnp.nan, w=jnp.nan,
                  sigma=1e6, dtype=None):
    """Build the params dict for the SI-alpha EKF systems (mirrors the params
    struct assembled at Tools/TrainPredictPrescribeNPI.m:202-224)."""
    fdtype = dtype or jnp.result_type(float)

    def arr(v):
        return jnp.asarray(v, fdtype)

    return {
        "dt": arr(dt), "beta": arr(beta), "gamma": arr(gamma),
        "a": arr(a).reshape(-1), "b": arr(b),
        "u_min": arr(u_min).reshape(-1), "u_max": arr(u_max).reshape(-1),
        "s_min": arr(s_min), "i_min": arr(i_min),
        "alpha_min": arr(alpha_min), "alpha_max": arr(alpha_max),
        "epsilon": arr(epsilon), "w": arr(w), "sigma": arr(sigma),
    }


def check_obs_type(obs_type):
    """Validate eagerly at system-construction time (SIAlphaModelEKF.m:51-59
    errors on unknown types) so a typo fails before tracing, not mid-scan."""
    if obs_type not in ("NEWCASES", "TOTALCASES"):
        raise ValueError(f"unknown observation type {obs_type!r}; "
                         "expected 'NEWCASES' or 'TOTALCASES'")


def _obs_update(obs_type, s_k, v_bar):
    if obs_type == "NEWCASES":
        return (s_k[0] * s_k[1] * s_k[2] + v_bar).reshape(1)
    elif obs_type == "TOTALCASES":
        return (1.0 - s_k[0] + v_bar).reshape(1)
    raise ValueError(f"unknown observation type {obs_type!r}")


def _obs_jacobian_row(obs_type, s_k, m):
    if obs_type == "NEWCASES":
        row = jnp.zeros((m,), s_k.dtype).at[0].set(s_k[1] * s_k[2])
        row = row.at[1].set(s_k[0] * s_k[2]).at[2].set(s_k[0] * s_k[1])
    elif obs_type == "TOTALCASES":
        row = jnp.zeros((m,), s_k.dtype).at[0].set(-1.0)
    else:
        raise ValueError(f"unknown observation type {obs_type!r}")
    return row.reshape(1, m)


def si_alpha_ekf_system(obs_type: str = "NEWCASES",
                        input_dim: int = 12) -> EKFSystem:
    """3-state (s, i, alpha) EKF system — Tools/SIAlphaModelEKF.m.

    obs_type is static: NEWCASES (x = s*i*alpha) or TOTALCASES (x = 1-s),
    SIAlphaModelEKF.m:51-59.
    """
    check_obs_type(obs_type)

    def state_hard_margins(s_k, params, k):
        # SIAlphaModelEKF.m:27-31
        return jnp.stack([
            clip_hi_lo(s_k[0], params["s_min"], 1.0),
            clip_hi_lo(s_k[1], params["i_min"], 1.0),
            clip_hi_lo(s_k[2], params["alpha_min"], params["alpha_max"]),
        ])

    def obs_hard_margins(x_k, params, k):
        return jnp.maximum(x_k, 0.0)  # SIAlphaModelEKF.m:34-36

    def nlin_state_update(u, s_k, w_bar, params, k):
        # SIAlphaModelEKF.m:39-48 (margins are applied inside the update too)
        dt = params["dt"]
        s1 = clip_lo_hi(s_k[0] - dt * s_k[2] * s_k[0] * s_k[1],
                        params["s_min"], 1.0)
        i1 = clip_lo_hi(
            s_k[1] + dt * (s_k[2] * s_k[0] * s_k[1] - params["beta"] * s_k[1]),
            params["i_min"], 1.0)
        drive = (-params["gamma"] * s_k[2] + params["gamma"] * params["b"]
                 + params["gamma"] * jnp.dot(params["a"],
                                             params["u_max"] - u))
        a1 = clip_lo_hi(s_k[2] + dt * drive,
                        params["alpha_min"], params["alpha_max"])
        return u, jnp.stack([s1, i1, a1])

    def state_jacobians(u, s_k, w_bar, params, k):
        # SIAlphaModelEKF.m:62-76
        dt = params["dt"]
        z = jnp.zeros((), s_k.dtype)
        A = jnp.array([
            [1.0 - dt * s_k[2] * s_k[1], -dt * s_k[2] * s_k[0],
             -dt * s_k[0] * s_k[1]],
            [dt * s_k[1] * s_k[2],
             1.0 + dt * (s_k[0] * s_k[2] - params["beta"]),
             dt * s_k[0] * s_k[1]],
            [z, z, 1.0 - dt * params["gamma"]],
        ])
        B = jnp.eye(3, dtype=s_k.dtype)
        return A, B

    def nlin_obs_update(u, s_k, v_bar, params, k):
        return _obs_update(obs_type, s_k, v_bar)

    def obs_jacobian(u, s_k, v_bar, params, k):
        C = _obs_jacobian_row(obs_type, s_k, 3)
        D = jnp.eye(1, dtype=s_k.dtype)
        return C, D

    return EKFSystem(
        state_dim=3, obs_dim=1, input_dim=input_dim,
        nlin_state_update=nlin_state_update,
        state_jacobians=state_jacobians,
        nlin_obs_update=nlin_obs_update,
        obs_jacobian=obs_jacobian,
        state_hard_margins=state_hard_margins,
        obs_hard_margins=obs_hard_margins,
    )
