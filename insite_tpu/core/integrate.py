"""Fixed-step sub-stepped Euler integration as batched array programs.

The reference integrates every ODE (ground-truth simulator and discovered
models alike) with a fixed-grid Euler scheme that subdivides every observation
interval into ``STEPS_FOR_DT`` sub-steps
(/root/reference/libs_m/ct/src/data/pkpd/utils.py:68-94).  We keep those exact
semantics — the benchmark's data *embodies* this discretisation — but express
them TPU-first:

- state is a whole batch (any pytree of arrays with leading batch dims), so a
  single `lax.scan` advances every patient at once on the VPU instead of
  `vmap`-ing a scalar integrator;
- the sub-step loop is unrolled (``STEPS_FOR_DT`` is a small static constant),
  letting XLA fuse the five multiply-adds per interval into one kernel;
- everything is jit-able and differentiable (INSITE's per-patient fine-tuning
  backpropagates through the rollout).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from insite_tpu.core.constants import STEPS_FOR_DT


def euler_step(f: Callable, y, t, dt, *args, substeps: int = STEPS_FOR_DT):
    """Advance ``y`` by one observation interval ``dt`` with ``substeps``
    unrolled Euler sub-steps.

    ``f(y, t, *args)`` is the vector field; ``y`` may be an array of any
    shape (typically the full batch).  Matches the reference's
    ``odeint_high_resolution_euler`` semantics where each interval ``dt`` is
    split into ``dt/substeps`` increments (pkpd/utils.py:73-79).
    """
    h = dt / substeps
    for k in range(substeps):
        y = y + f(y, t + k * h, *args) * h
    return y


def euler_rollout(f: Callable, y0, ts, *args, substeps: int = STEPS_FOR_DT):
    """Integrate over the full grid ``ts`` (shape ``[T]``), returning states at
    every grid point: shape ``[T, *y0.shape]`` with ``out[0] == y0``.

    Batched analogue of the reference ``odeint``
    (pkpd/utils.py:86-94): the scan runs over time only; the batch lives
    inside ``y0``/``args`` and is advanced in lock-step on the VPU.
    """

    def step(y, tdt):
        t, dt = tdt
        y_next = euler_step(f, y, t, dt, *args, substeps=substeps)
        return y_next, y_next

    dts = jnp.diff(ts)
    _, ys = lax.scan(step, y0, (ts[:-1], dts))
    return jnp.concatenate([y0[None, ...], ys], axis=0)


@partial(jax.jit, static_argnums=(0,))
def euler_odeint(f: Callable, y0, ts, *args):
    """Drop-in equivalent of the reference ``odeint`` (pkpd/utils.py:86-94)
    for a single trajectory; prefer :func:`euler_rollout` with batched state.
    """
    return euler_rollout(f, y0, ts, *args)


def controlled_rollout(f: Callable, y0, controls, dt, *args,
                       substeps: int = STEPS_FOR_DT):
    """Roll out a controlled ODE: at step ``k`` the vector field sees
    ``controls[k]`` (e.g. the current treatment) and integrates one ``dt``.

    Returns the T post-step states (shape ``[T, *y0.shape]`` where
    ``T = controls.shape[0]``), i.e. predictions of ``y[1..T]`` — the shape
    the evaluation protocol consumes (reference: sindy.py:413-429 scans
    treatments the same way).  ``controls`` may be a pytree scanned on axis 0.
    """

    def step(y, u):
        y_next = euler_step(lambda yy, tt: f(yy, tt, u, *args), y, 0.0, dt,
                            substeps=substeps)
        return y_next, y_next

    _, ys = lax.scan(step, y0, controls)
    return ys
