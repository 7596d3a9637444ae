"""Fused Euler-step + candidate-library rollout as a Pallas TPU kernel
(SURVEY.md §7 build-plan step 10: the inner rollout of the discovered model).

The XLA version (`models.sindy.batched_rollout`) is a `lax.scan` whose body
stacks inputs to [..., n_inputs], evaluates the polynomial library, and
contracts with per-arm coefficients — every step materialises [B, F]
feature tensors in registers scheduled by XLA.  This kernel keeps the whole
integration resident in VMEM with a *plane* layout: the batch is folded to
``[rows, 128]`` (sublane x lane) tiles and every monomial is an unrolled
product of [8, 128] planes on the VPU, so one grid program integrates 1024
patients for all T steps with zero HBM traffic in between.

Used for the forward prediction paths (global SINDy/WSINDy rollouts over
the exploded counterfactual test sets — hundreds of thousands of rows).
The INSITE fine-tune keeps the XLA rollout: it needs JVPs through the
integrator, which XLA differentiates for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from insite_tpu.core.constants import STEPS_FOR_DT

LANES = 128
SUBLANES = 8
BLOCK_B = LANES * SUBLANES  # 1024 patients per grid program


def _kernel(coefs_ref, y0_ref, statics_ref, arms_ref, out_ref, *,
            exps, A, F, T, dt, substeps, y_clip):
    """One grid program: integrate BLOCK_B patients for all T steps.

    coefs_ref:   [A*F, 8, 128]  per-patient arm-major coefficients
    y0_ref:      [8, 128]
    statics_ref: [S, 8, 128]
    arms_ref:    [T, 8, 128]    int32 arm index per step
    out_ref:     [T, 8, 128]    predictions y[1..T]
    """
    h = dt / substeps
    S = statics_ref.shape[0]
    statics = [statics_ref[s] for s in range(S)]

    def step(t, y):
        arm = arms_ref[t]
        # arm-select each coefficient plane: c_k = coefs[arm, k]
        planes = [y] + statics
        dy_coefs = []
        for k in range(F):
            c_k = coefs_ref[k]              # arm 0
            for a in range(1, A):
                c_k = jnp.where(arm == a, coefs_ref[a * F + k], c_k)
            dy_coefs.append(c_k)

        for _ in range(substeps):
            planes[0] = y
            dy = jnp.zeros_like(y)
            for k, e in enumerate(exps):
                term = dy_coefs[k]
                for i, p in enumerate(e):
                    for _ in range(int(p)):
                        term = term * planes[i]
                dy = dy + term
            y = y + h * dy
        if y_clip is not None:
            y = jnp.clip(y, y_clip[0], y_clip[1])
        out_ref[t] = y
        return y

    # mosaic's fori_loop supports only unroll=1 or full unroll; T is small
    # (<= 65) so fully unroll — every iteration is straight-line VPU code
    lax.fori_loop(0, T, step, y0_ref[:], unroll=T)


@functools.partial(jax.jit, static_argnames=('library', 'dt', 'shared_coefs',
                                             'substeps', 'interpret',
                                             'y_clip'))
def pallas_batched_rollout(library, coefs, y0, statics, arms, dt,
                           shared_coefs=False, substeps=STEPS_FOR_DT,
                           interpret=False, y_clip=None):
    """Drop-in for `batched_rollout(..., joint=False)` on TPU.

    coefs: [1, A, F] (shared) or [B, A, F]; y0: [B]; statics: [B, S];
    arms: [B, T] integer arm per step.  Returns [B, T] predictions.
    Pass interpret=True to run the kernel in interpreter mode (CPU CI).
    """
    B, T = arms.shape
    A, F = coefs.shape[-2:]
    S = statics.shape[-1]
    exps = tuple(map(tuple, library.exponents()))
    assert len(exps) == F
    assert library.n_inputs == 1 + S, 'joint mode not supported in pallas'
    dtype = y0.dtype

    B_pad = max(BLOCK_B, ((B + BLOCK_B - 1) // BLOCK_B) * BLOCK_B)
    rows = B_pad // LANES
    grid = (B_pad // BLOCK_B,)

    def fold(x, fill=0):
        """[B, ...] -> [..., rows, 128] plane layout."""
        pad = jnp.full((B_pad - B,) + x.shape[1:], fill, x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
        x = jnp.moveaxis(x.reshape((rows, LANES) + x.shape[1:]), (0, 1),
                         (-2, -1))
        return x

    coefs_b = (jnp.broadcast_to(coefs, (B,) + coefs.shape[-2:])
               if shared_coefs or coefs.shape[0] == 1 else coefs)
    coefs_p = fold(coefs_b.reshape(B, A * F))          # [A*F, rows, 128]
    y0_p = fold(y0[:, None])[0]                        # [rows, 128]
    statics_p = fold(statics)                          # [S, rows, 128]
    arms_p = fold(arms.astype(jnp.int32))              # [T, rows, 128]

    kernel = functools.partial(_kernel, exps=exps, A=A, F=F, T=T,
                               dt=float(dt), substeps=substeps,
                               y_clip=y_clip)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((A * F, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, SUBLANES, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, rows, LANES), dtype),
        interpret=interpret,
    )(coefs_p, y0_p, statics_p, arms_p)

    # [T, rows, 128] -> [B, T]
    out = jnp.moveaxis(out, 0, -1).reshape(B_pad, T)
    return out[:B]
