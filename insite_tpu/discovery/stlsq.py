"""Sequentially-thresholded least squares (STLSQ) as fixed-iteration masked
ridge in pure JAX — the discovery optimizer replacing pysindy's
STLSQ/LSQIntialMask (reference semantics: pkpd/utils.py:96-335 and pysindy's
SINDyOptimizer unbias step).

Design: the support set is a boolean mask updated by thresholding; each
iteration solves the masked ridge normal equations.  Masked columns get a
unit diagonal and zero RHS, so their coefficients are exactly zero while the
system stays full-rank and static-shape — jit/vmap-friendly, which makes the
per-trajectory "individualised equations" path a single batched solve.

The iteration is a fixed point once the mask stabilises (identical ridge
solution -> identical mask), so running a fixed ``max_iter`` reproduces the
reference's converge-or-break loop (pkpd/utils.py:274-310) without
data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _masked_solve(gram, rhs, mask, alpha):
    """Solve (Θ'Θ + αI) c = Θ'y restricted to ``mask`` columns."""
    m = mask.astype(gram.dtype)
    A = gram * jnp.outer(m, m)
    A = A + jnp.diag(alpha * m + (1.0 - m))
    b = rhs * m
    return jnp.linalg.solve(A, b)


@partial(jax.jit, static_argnames=('max_iter',))
def stlsq(theta, y, threshold, alpha, sample_weight=None, max_iter: int = 20,
          initial_mask=None, unbias: bool = True):
    """STLSQ with optional unbiasing OLS refit on the final support.

    theta: [N, F] feature matrix; y: [N] target; sample_weight: [N] 0/1 mask
    for padded rows (masked accumulation keeps ragged cohorts static-shape).
    Returns (coefs [F], support mask [F]).

    Matches pysindy STLSQ(threshold, alpha, ridge) + SINDyOptimizer(unbias)
    used at sindy.py:190-215; with ``initial_mask`` it matches the
    ``LSQIntialMask`` initial-guess variant (pkpd/utils.py:244-327).
    """
    dtype = theta.dtype
    if sample_weight is not None:
        w = sample_weight.astype(dtype)
        gram = jnp.einsum('nf,ng,n->fg', theta, theta, w)
        rhs = jnp.einsum('nf,n->f', theta, y * w)
    else:
        gram = theta.T @ theta
        rhs = theta.T @ y

    F = theta.shape[-1]
    mask0 = (jnp.ones(F, bool) if initial_mask is None
             else jnp.asarray(initial_mask, bool))

    def body(carry, _):
        mask, _ = carry
        c = _masked_solve(gram, rhs, mask, alpha)
        new_mask = (jnp.abs(c) >= threshold) & mask
        # degenerate guard: if thresholding kills everything, keep zeros
        # (reference warns and zeroes out, pkpd/utils.py:275-281)
        c = jnp.where(new_mask, c, 0.0)
        return (new_mask, c), None

    (mask, coefs), _ = lax.scan(body, (mask0, jnp.zeros(F, dtype)),
                                None, length=max_iter)
    if unbias:
        ols = _masked_solve(gram, rhs, mask, jnp.asarray(0.0, dtype))
        coefs = jnp.where(mask, ols, 0.0)
    return coefs, mask


def masked_ridge(theta, y, alpha, mask=None, sample_weight=None):
    """One masked ridge solve (building block, exposed for tests)."""
    dtype = theta.dtype
    if sample_weight is not None:
        w = sample_weight.astype(dtype)
        gram = jnp.einsum('nf,ng,n->fg', theta, theta, w)
        rhs = jnp.einsum('nf,n->f', theta, y * w)
    else:
        gram = theta.T @ theta
        rhs = theta.T @ y
    if mask is None:
        mask = jnp.ones(theta.shape[-1], bool)
    return _masked_solve(gram, rhs, mask, jnp.asarray(alpha, dtype))
