"""Bi-objective NPI cost (Tools/NPICost.m:5-10).

J0 (human cost)   = mean of the new-case series
J1 (NPI burden)   = mean over all (npi, day) entries of weights .* inputs

Vectorized over arbitrary leading batch axes so the full Pareto sweep and the
Monte-Carlo cloud are scored in one call.
"""

from __future__ import annotations

import jax.numpy as jnp


def npi_cost(newcases, inputs, weights):
    """newcases: (..., T); inputs: (..., P, T) or (..., T, P); weights
    broadcastable to inputs. Returns (J0, J1) with the batch shape."""
    newcases = jnp.asarray(newcases)
    inputs = jnp.asarray(inputs)
    weights = jnp.asarray(weights)
    J0 = jnp.mean(newcases, axis=-1)
    w_in = weights * inputs
    J1 = jnp.mean(w_in, axis=(-2, -1))
    return J0, J1
