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
the exploded counterfactual test sets — hundreds of thousands of rows),
and — via `pallas_rollout_with_sens` — for the INSITE Gauss-Newton
fine-tune: the kernel integrates the forward-sensitivity ODE
``s_j' = (dF/dy) s_j + theta_{f_j}(y) [arm == a_j]`` alongside the state,
so one kernel call per GN iteration replaces XLA's jvp-through-scan
(hundreds of tiny sequential kernels).
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


def _sens_kernel(coefs_ref, y0_ref, statics_ref, arms_ref, out_ref,
                 sens_ref, *, exps, A, F, T, dt, substeps, y_clip,
                 active_idx):
    """Euler rollout + forward sensitivities for the active coefficient
    coordinates, all resident in VMEM.

    For the library RHS F(y) = sum_k c_k theta_k(y, u) the sensitivity of
    the state wrt the flat coordinate j = (arm a_j, feature f_j) follows

        s_j <- s_j + h * ( dFdy * s_j + [arm == a_j] * theta_{f_j}(y) )

    evaluated at the pre-update state (exactly XLA's jvp through the same
    Euler arithmetic).  y_clip zeroes sensitivities where the state was
    clipped, matching jnp.clip's jvp.

    sens_ref: [Kr, T, 8, 128] — d y_t / d c_active[j].
    """
    h = dt / substeps
    S = statics_ref.shape[0]
    statics = [statics_ref[s] for s in range(S)]
    Kr = len(active_idx)

    def theta(planes, e):
        term = None
        for i, p in enumerate(e):
            for _ in range(int(p)):
                term = planes[i] if term is None else term * planes[i]
        return term if term is not None else jnp.ones_like(planes[0])

    def dtheta_dy(planes, e):
        p0 = int(e[0])
        if p0 == 0:
            return None                       # feature independent of y
        term = None
        for _ in range(p0 - 1):
            term = planes[0] if term is None else term * planes[0]
        for i, p in list(enumerate(e))[1:]:
            for _ in range(int(p)):
                term = planes[i] if term is None else term * planes[i]
        if term is None:
            return jnp.full_like(planes[0], float(p0))
        return term * p0 if p0 > 1 else term

    def step(t, carry):
        y, sens = carry
        arm = arms_ref[t]
        dy_coefs = []
        for k in range(F):
            c_k = coefs_ref[k]
            for a in range(1, A):
                c_k = jnp.where(arm == a, coefs_ref[a * F + k], c_k)
            dy_coefs.append(c_k)

        for _ in range(substeps):
            planes = [y] + statics
            dy = jnp.zeros_like(y)
            dFdy = jnp.zeros_like(y)
            for k, e in enumerate(exps):
                dy = dy + dy_coefs[k] * theta(planes, e)
                d = dtheta_dy(planes, e)
                if d is not None:
                    dFdy = dFdy + dy_coefs[k] * d
            new_sens = []
            for j, (a_j, f_j) in enumerate(active_idx):
                drive = theta(planes, exps[f_j])
                if A > 1:
                    drive = jnp.where(arm == a_j, drive,
                                      jnp.zeros_like(drive))
                new_sens.append(sens[j] + h * (dFdy * sens[j] + drive))
            sens = new_sens
            y = y + h * dy
        if y_clip is not None:
            inside = (y > y_clip[0]) & (y < y_clip[1])
            y = jnp.clip(y, y_clip[0], y_clip[1])
            sens = [jnp.where(inside, s, jnp.zeros_like(s)) for s in sens]
        out_ref[t] = y
        for j in range(Kr):
            sens_ref[j, t] = sens[j]
        return y, sens

    y0 = y0_ref[:]
    lax.fori_loop(0, T, step,
                  (y0, [jnp.zeros_like(y0) for _ in range(Kr)]), unroll=T)


@functools.partial(jax.jit, static_argnames=('library', 'dt', 'substeps',
                                             'interpret', 'y_clip',
                                             'active_idx'))
def pallas_rollout_with_sens(library, coefs, y0, statics, arms, dt,
                             active_idx, substeps=STEPS_FOR_DT,
                             interpret=False, y_clip=None):
    """Rollout + d y / d c_active in ONE kernel pass.

    coefs: [B, A, F] per-patient coefficients; active_idx: static tuple of
    flat (arm*F + feature) coordinates.  Returns (preds [B, T],
    sens [B, T, Kr]).
    """
    B, T = arms.shape
    A, F = coefs.shape[-2:]
    S = statics.shape[-1]
    exps = tuple(map(tuple, library.exponents()))
    assert len(exps) == F
    assert library.n_inputs == 1 + S, 'joint mode not supported in pallas'
    dtype = y0.dtype
    act = tuple((int(i) // F, int(i) % F) for i in active_idx)
    Kr = len(act)

    B_pad = max(BLOCK_B, ((B + BLOCK_B - 1) // BLOCK_B) * BLOCK_B)
    rows = B_pad // LANES
    grid = (B_pad // BLOCK_B,)

    def fold(x, fill=0):
        pad = jnp.full((B_pad - B,) + x.shape[1:], fill, x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
        x = jnp.moveaxis(x.reshape((rows, LANES) + x.shape[1:]), (0, 1),
                         (-2, -1))
        return x

    coefs_b = jnp.broadcast_to(coefs, (B, A, F))
    coefs_p = fold(coefs_b.reshape(B, A * F))
    y0_p = fold(y0[:, None])[0]
    statics_p = fold(statics)
    arms_p = fold(arms.astype(jnp.int32))

    kernel = functools.partial(_sens_kernel, exps=exps, A=A, F=F, T=T,
                               dt=float(dt), substeps=substeps,
                               y_clip=y_clip, active_idx=act)
    out, sens = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((T, SUBLANES, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kr, T, SUBLANES, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, rows, LANES), dtype),
            jax.ShapeDtypeStruct((Kr, T, rows, LANES), dtype),
        ],
        interpret=interpret,
    )(coefs_p, y0_p, statics_p, arms_p)

    out = jnp.moveaxis(out, 0, -1).reshape(B_pad, T)[:B]
    sens = jnp.moveaxis(sens, (0, 1), (-1, -2)) \
        .reshape(B_pad, T, Kr)[:B]
    return out, sens


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
