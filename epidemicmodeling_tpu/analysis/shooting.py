"""Forward Hamiltonian shooting for the SI-alpha optimal control theory
studies.

Reference behavior:
- testScripts/testSIModelOptimalControl01.m:62-98 — 3-state model with
  costates integrated FORWARD from guessed initial costates, bang-bang law
  phi = epsilon*w - gamma*lambda3*a (u = u_min where phi >= 0 else u_max),
  Hamiltonian and (J0, J1) cost tracking; random-vs-optimal Pareto clouds
  over epsilon instances.
- testScripts/testSIModelOptimalControl02.m:45-70 — 2-state variant with a
  continuous quadratic-cost control law
  u = round(clip(gamma*w / (-2 A s i rho))) and alpha = A.(u_max^2 - u^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math import clip_lo_hi


class ShootingResult(NamedTuple):
    """Forward Hamiltonian-shooting trajectories: states, costates, the
    bang-bang schedule and cost densities (testSIModelOptimalControl01.m:
    62-98)."""
    s: jnp.ndarray
    i: jnp.ndarray
    alpha: jnp.ndarray
    lambdas: jnp.ndarray   # (K, 3)
    u: jnp.ndarray         # (K, P)
    H: jnp.ndarray         # Hamiltonian
    J0: jnp.ndarray        # (K,) human cost density
    J1: jnp.ndarray        # (K,) NPI cost density


def si_alpha_hamiltonian_shooting(epsilon, w, a, u_min, u_max, gamma, beta,
                                  s0, i0, alpha0, lambda_init, K, dt,
                                  alpha_min=0.0, alpha_max=jnp.inf,
                                  u_schedule=None):
    """Forward-integrate states + costates with the bang-bang law (or a fixed
    input schedule for the random baseline). lambda_init: (3,).
    w: (P,) or (K, P) weights. Returns ShootingResult with (K,) series."""
    P = jnp.asarray(a).shape[0]
    w = jnp.asarray(w, jnp.result_type(float))
    if w.ndim == 1:
        w = jnp.broadcast_to(w[None, :], (K, P))
    a = jnp.asarray(a).reshape(P)
    u_min = jnp.asarray(u_min, w.dtype).reshape(P)
    u_max = jnp.asarray(u_max, w.dtype).reshape(P)
    if u_schedule is not None:
        u_schedule = jnp.asarray(u_schedule, w.dtype).reshape(K, P)

    def step(carry, inp):
        s, i, al, l1, l2, l3 = carry
        w_t, u_fixed = inp
        rho = l1 - l2 - (1.0 - epsilon)
        phi = epsilon * w_t - gamma * l3 * a
        u_opt = jnp.where(phi >= 0, u_min, u_max)
        u_t = u_opt if u_schedule is None else u_fixed

        H = (-rho * al * s * i - beta * l2 * i
             + epsilon * jnp.dot(w_t, u_t)
             + l3 * (-gamma * al + gamma * jnp.dot(a, u_max - u_t)))
        J0 = al * s * i
        J1 = jnp.dot(w_t, u_t)

        l1n = l1 + dt * rho * al * i
        l2n = l2 + dt * (rho * al * s + beta * l2)
        l3n = l3 + dt * (rho * s * i + gamma * l3)
        sn = clip_lo_hi(s - dt * al * s * i, 0.0, 1.0)
        i_n = clip_lo_hi(i + dt * (al * s * i - beta * i), 0.0, 1.0)
        aln = clip_lo_hi(al + dt * (-gamma * al
                                    + gamma * jnp.dot(a, u_max - u_t)),
                         alpha_min, alpha_max)
        out = (s, i, al, jnp.stack([l1, l2, l3]), u_t, H, J0, J1)
        return (sn, i_n, aln, l1n, l2n, l3n), out

    init = (jnp.asarray(s0, w.dtype), jnp.asarray(i0, w.dtype),
            jnp.asarray(alpha0, w.dtype),
            jnp.asarray(lambda_init[0], w.dtype),
            jnp.asarray(lambda_init[1], w.dtype),
            jnp.asarray(lambda_init[2], w.dtype))
    u_xs = (u_schedule if u_schedule is not None
            else jnp.zeros((K, P), w.dtype))
    _, (s, i, al, lam, u, H, J0, J1) = jax.lax.scan(step, init, (w, u_xs))
    return ShootingResult(s, i, al, lam, u, H, J0, J1)


def si_continuous_control(A_coefs, w, u_min, u_max, gamma, beta, s0, i0,
                          rho0, lambda20, K, dt):
    """2-state continuous (quadratic-cost) control law variant
    (testSIModelOptimalControl02.m:45-70):
      u_t = round(clip(gamma*w / (-2 A s i rho), u_min, u_max))
      alpha_t = sum(A * (u_max^2 - u^2))
    Returns dict with s, i, alpha, u, J0, J1."""
    P = jnp.asarray(A_coefs).shape[0]
    fdtype = jnp.result_type(float)
    A_coefs = jnp.asarray(A_coefs, fdtype).reshape(P)
    w = jnp.asarray(w, fdtype)
    if w.ndim == 1:
        w = jnp.broadcast_to(w[None, :], (K, P))
    u_min = jnp.asarray(u_min, fdtype).reshape(P)
    u_max = jnp.asarray(u_max, fdtype).reshape(P)

    def step(carry, w_t):
        s, i, rho, l2 = carry
        denom = -2.0 * A_coefs * s * i * rho
        u_t = jnp.round(jnp.clip(
            gamma * w_t / jnp.where(jnp.abs(denom) > 1e-30, denom, 1e-30),
            u_min, u_max))
        al = jnp.sum(A_coefs * (u_max ** 2 - u_t ** 2))
        J0 = al * s * i
        J1 = jnp.dot(w_t, u_t)
        rho_n = rho + dt * rho * al * (i - s) - dt * beta * l2
        l2n = l2 + dt * rho * al * s + dt * beta * l2
        sn = clip_lo_hi(s - dt * al * s * i, 0.0, 1.0)
        i_n = clip_lo_hi(i + dt * al * s * i - dt * beta * i, 0.0, 1.0)
        return (sn, i_n, rho_n, l2n), (s, i, al, u_t, J0, J1)

    init = (jnp.asarray(s0, fdtype), jnp.asarray(i0, fdtype),
            jnp.asarray(rho0, fdtype), jnp.asarray(lambda20, fdtype))
    _, (s, i, al, u, J0, J1) = jax.lax.scan(step, init, w)
    return dict(s=s, i=i, alpha=al, u=u, J0=J0, J1=J1)


def si_alpha_multiplicative_shooting(epsilon, w, a, c, u_min, u_max, beta,
                                     s0, i0, alpha0, lambda_init, K, dt,
                                     alpha_min=0.0, alpha_max=jnp.inf,
                                     u_schedule=None):
    """Modified multiplicative-input model
    (testScripts/testSIModelOptimalControl03.m:64-94): the contact rate decays
    proportionally to the applied NPIs, alpha' = -alpha*(a.u + c), with
    switching function phi = epsilon*w - lambda3*alpha*a and matching costate
    dynamics. Returns ShootingResult."""
    P = jnp.asarray(a).shape[0]
    fdtype = jnp.result_type(float)
    w = jnp.asarray(w, fdtype)
    if w.ndim == 1:
        w = jnp.broadcast_to(w[None, :], (K, P))
    a = jnp.asarray(a, fdtype).reshape(P)
    u_min = jnp.asarray(u_min, fdtype).reshape(P)
    u_max = jnp.asarray(u_max, fdtype).reshape(P)
    if u_schedule is not None:
        u_schedule = jnp.asarray(u_schedule, fdtype).reshape(K, P)

    def step(carry, inp):
        s, i, al, l1, l2, l3 = carry
        w_t, u_fixed = inp
        rho = l1 - l2 - (1.0 - epsilon)
        phi = epsilon * w_t - l3 * al * a
        u_opt = jnp.where(phi >= 0, u_min, u_max)
        u_t = u_opt if u_schedule is None else u_fixed
        au = jnp.dot(a, u_t) + c

        H = (-rho * al * s * i - beta * l2 * i
             + epsilon * jnp.dot(w_t, u_t) - l3 * al * au)
        J0 = al * s * i
        J1 = jnp.dot(w_t, u_t)

        l1n = l1 + dt * rho * al * i
        l2n = l2 + dt * (rho * al * s + beta * l2)
        l3n = l3 + dt * (rho * s * i + l3 * au)
        sn = clip_lo_hi(s - dt * al * s * i, 0.0, 1.0)
        i_n = clip_lo_hi(i + dt * (al * s * i - beta * i), 0.0, 1.0)
        aln = clip_lo_hi(al - dt * al * au, alpha_min, alpha_max)
        out = (s, i, al, jnp.stack([l1, l2, l3]), u_t, H, J0, J1)
        return (sn, i_n, aln, l1n, l2n, l3n), out

    init = tuple(jnp.asarray(v, fdtype) for v in
                 (s0, i0, alpha0, lambda_init[0], lambda_init[1],
                  lambda_init[2]))
    u_xs = (u_schedule if u_schedule is not None
            else jnp.zeros((K, P), fdtype))
    _, (s, i, al, lam, u, H, J0, J1) = jax.lax.scan(step, init, (w, u_xs))
    return ShootingResult(s, i, al, lam, u, H, J0, J1)
