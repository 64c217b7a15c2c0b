"""Small numeric utilities shared across the framework.

These mirror the numerical-stability guards and smoothing filters scattered
through the reference (symmetrization at Tools/GenericExtendedKalmanFilter.m:138,
causal moving-average at Tools/TrainPredictPrescribeNPI.m:173, zero-phase
filtering at :174) but are implemented as pure JAX transforms over time-major
arrays so they batch and jit cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def symmetrize(P: jnp.ndarray) -> jnp.ndarray:
    """Force symmetry of (..., m, m) covariance stacks: (P + P^T)/2."""
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def clip01(x: jnp.ndarray) -> jnp.ndarray:
    """Clip to the [0, 1] interval (compartment fractions)."""
    return jnp.clip(x, 0.0, 1.0)


def clip_lo_hi(x, lo, hi):
    """MATLAB ``max(lo, min(hi, x))`` with MATLAB NaN semantics.

    MATLAB's min/max ignore NaN operands, so a NaN state is sanitized to a
    bound instead of propagating. jnp.fmin/fmax reproduce that exactly, and
    the composition order matters for which bound a NaN maps to (hi here).
    Used where the reference writes max(lo, min(hi, .)), e.g.
    Tools/SIalpha_Controlled.m:25-27 and the state updates in
    Tools/SIAlphaModelEKF.m:44-46.
    """
    return jnp.fmax(lo, jnp.fmin(hi, x))


def clip_hi_lo(x, lo, hi):
    """MATLAB ``min(hi, max(lo, x))`` (NaN maps to lo); used by the hard
    margins, e.g. Tools/SIAlphaModelEKF.m:28-30."""
    return jnp.fmin(hi, jnp.fmax(lo, x))


def causal_moving_average(x: jnp.ndarray, win: int, axis: int = -1) -> jnp.ndarray:
    """Causal length-``win`` moving average matching MATLAB
    ``filter(ones(1,w), w, x)`` semantics (zero initial conditions).

    Equivalent to an FIR filter with taps 1/w: y[t] = mean of the last w samples,
    with implicit zero padding before t=0.
    """
    x = jnp.moveaxis(x, axis, -1)
    kernel = jnp.ones((win,), dtype=x.dtype) / win
    pad = [(0, 0)] * (x.ndim - 1) + [(win - 1, 0)]
    xp = jnp.pad(x, pad)
    shape = x.shape[:-1]
    y = _corr_last(xp.reshape((-1, xp.shape[-1])), kernel)
    return jnp.moveaxis(y.reshape(shape + (x.shape[-1],)), -1, axis)


def _corr_last(x2d: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Batched 'valid' correlation along the last axis via conv_general_dilated."""
    import jax.lax as lax

    w = kernel.shape[0]
    lhs = x2d[:, None, :]  # (B, C=1, T+w-1)
    rhs = kernel[None, None, ::-1]  # (O=1, I=1, w) — flip for correlation
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[:, 0, :]


def filtfilt_ma(x: jnp.ndarray, win: int, axis: int = -1) -> jnp.ndarray:
    """Zero-phase FIR moving-average filtering approximating MATLAB
    ``filtfilt(ones(1,w), w, x)`` for a length-``w`` boxcar.

    filtfilt applies the filter forward then backward. For an FIR boxcar this is
    a symmetric smoother of effective length 2w-1. MATLAB's filtfilt also
    applies reflective edge padding (length 3*(w-1)) to suppress transients; we
    replicate that padding scheme so interior and edge samples agree closely.
    Used only for observation-noise variance estimation
    (Tools/TrainPredictPrescribeNPI.m:174), where exact edge parity is not
    load-bearing.
    """
    x = jnp.moveaxis(x, axis, -1)
    T = x.shape[-1]
    nfact = 3 * (win - 1)
    if nfact >= T:
        nfact = T - 1
    # reflective (odd) extension as in filtfilt: 2*x[0]-x[nfact:0:-1] etc.
    pre = 2 * x[..., :1] - x[..., nfact:0:-1] if nfact > 0 else x[..., :0]
    post = 2 * x[..., -1:] - x[..., -2 : -2 - nfact : -1] if nfact > 0 else x[..., :0]
    xe = jnp.concatenate([pre, x, post], axis=-1)
    fwd = causal_moving_average(xe, win, axis=-1)
    bwd = causal_moving_average(fwd[..., ::-1], win, axis=-1)[..., ::-1]
    y = bwd[..., nfact : nfact + T]
    return jnp.moveaxis(y, -1, axis)
