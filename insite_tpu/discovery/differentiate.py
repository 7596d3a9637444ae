"""Derivative estimation for discovery: Savitzky-Golay smoothing and
finite differences as a single batched "clamped sliding window × coefficient
matrix" primitive.

Replaces scipy ``savgol_filter(mode='interp')`` and pysindy
``(Smoothed)FiniteDifference`` (reference: pkpd/utils.py:24-25,49;
sindy.py:190-215 uses SmoothedFiniteDifference(window=5, polyorder=3,
order=4) for EQ_4 and FiniteDifference(order=1) for cancer/EQ_5).

The primitive: for output position ``j`` in a trajectory of valid length
``L``, take the window starting at ``s = clip(j - (w-1)//2, 0, L - w)`` and
emit ``W[j - s] @ x[s:s+w]``.  Choosing ``W`` as the polynomial-projection
matrix gives savgol-with-interp-edges; choosing Fornberg derivative weights
gives centred finite differences with one-sided boundary stencils.  Ragged
batches are handled by the per-row clamp — one gather + one einsum for the
whole cohort, no per-trajectory host loops.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def savgol_coeffs_matrix(window: int, polyorder: int) -> np.ndarray:
    """W[r, k]: value at in-window position r of the degree-``polyorder``
    least-squares fit through the ``window`` samples.  Row ``(window-1)//2``
    is the classic savgol smoothing kernel; other rows reproduce scipy's
    ``mode='interp'`` edge behaviour."""
    x = np.arange(window, dtype=np.float64)
    V = np.vander(x, polyorder + 1, increasing=True)      # [w, p+1]
    # projection onto the polynomial space: P = V (V^T V)^-1 V^T
    P = V @ np.linalg.solve(V.T @ V, V.T)
    return P                                              # [w, w]


@lru_cache(maxsize=None)
def fornberg_matrix(window: int, deriv: int = 1) -> np.ndarray:
    """W[r, k]: weight of sample k for the ``deriv``-th derivative evaluated
    at in-window position r, on a unit-spaced window (Fornberg weights via
    Vandermonde solve).  Scale by 1/dt**deriv for a grid of spacing dt."""
    import math
    x = np.arange(window, dtype=np.float64)
    W = np.zeros((window, window))
    fact = float(math.factorial(deriv))
    for r in range(window):
        A = np.vander(x - x[r], window, increasing=True).T   # A[m,k]=(xk-xr)^m
        b = np.zeros(window)
        b[deriv] = fact
        W[r] = np.linalg.solve(A, b)
    return W


def windowed_filter(x, lengths, W, axis_len: int = None):
    """Apply the clamped-window primitive along the last axis.

    x:       [..., T]  (padded)
    lengths: [...]     valid lengths per row (int); positions >= L produce
                        garbage the caller must mask.
    W:       [w, w]    coefficient matrix.
    """
    w = W.shape[0]
    T = x.shape[-1]
    half = (w - 1) // 2
    j = jnp.arange(T)
    L = jnp.maximum(jnp.asarray(lengths)[..., None], w)    # guard short rows
    s = jnp.clip(j - half, 0, L - w)                       # [..., T]
    r = j - s                                              # in-window position
    idx = s[..., None] + jnp.arange(w)                     # [..., T, w]
    windows = jnp.take_along_axis(x[..., None, :],
                                  idx, axis=-1)            # [..., T, w]
    Wj = jnp.asarray(W, x.dtype)[r]                        # [..., T, w]
    return jnp.sum(windows * Wj, axis=-1)


def savgol_smooth(x, lengths, window: int = 5, polyorder: int = 3):
    """Batched scipy-compatible ``savgol_filter(..., mode='interp')``."""
    return windowed_filter(x, lengths, savgol_coeffs_matrix(window,
                                                            polyorder))


def finite_difference(x, lengths, dt, order: int = 2, deriv: int = 1):
    """Batched pysindy-compatible ``FiniteDifference(order=order)``:
    stencil of ``order+1`` points, centred where possible, one-sided at the
    boundaries."""
    W = fornberg_matrix(order + 1, deriv)
    return windowed_filter(x, lengths, W) / (dt ** deriv)


def smoothed_finite_difference(x, lengths, dt, order: int = 4,
                               window: int = 5, polyorder: int = 3):
    """pysindy ``SmoothedFiniteDifference``: savgol smooth, then FD."""
    return finite_difference(savgol_smooth(x, lengths, window, polyorder),
                             lengths, dt, order=order)
