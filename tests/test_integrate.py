"""Integrator unit tests, mirroring the reference's analytic self-tests
(/root/reference/libs_m/ct/src/data/pkpd/utils.py:757-908)."""

import jax
import jax.numpy as jnp
import numpy as np

from insite_tpu.core import (MAX_SEQUENCE_LENGTH, MAX_TIME_HORIZON,
                             euler_rollout)
from insite_tpu.core.integrate import controlled_rollout, euler_step


def test_constant_derivative_dense_grid():
    # dy/dt = 1  ->  y(t) = t  (exact for Euler)
    dt = MAX_TIME_HORIZON / MAX_SEQUENCE_LENGTH
    ts = jnp.arange(0, MAX_TIME_HORIZON, dt)
    y = euler_rollout(lambda y, t: jnp.ones_like(y), jnp.array(0.0), ts)
    assert jnp.mean((y - ts) ** 2) < 1e-16


def test_exponential_decay_matches_substeps():
    # 5 substeps of linear decay == multiplicative factor (1 - c h)^5
    c, dt = 0.7, 1.0 / 6.0
    y = euler_step(lambda y, t: -c * y, jnp.array(2.0), 0.0, dt)
    np.testing.assert_allclose(float(y), 2.0 * (1 - c * dt / 5) ** 5,
                               rtol=1e-12)


def test_batched_rollout_matches_scalar():
    key = jax.random.PRNGKey(0)
    c = jax.random.uniform(key, (32,), minval=0.1, maxval=1.0)
    ts = jnp.linspace(0.0, 5.0, 30)
    y0 = jnp.full((32,), 10.0)
    batched = euler_rollout(lambda y, t: -c * y, y0, ts)
    for i in [0, 7, 31]:
        single = euler_rollout(lambda y, t: -c[i] * y, y0[i], ts)
        np.testing.assert_allclose(np.asarray(batched[:, i]),
                                   np.asarray(single), rtol=1e-12)


def test_controlled_rollout_switches_dynamics():
    # alternating decay constants chosen by the control signal
    controls = jnp.array([0, 1, 0, 1], dtype=jnp.int32)
    c = jnp.array([0.2, 0.9])

    def f(y, t, u):
        return -c[u] * y

    ys = controlled_rollout(f, jnp.array(1.0), controls, 0.5)
    manual = 1.0
    for u in [0, 1, 0, 1]:
        manual = float(euler_step(lambda y, t: -c[u] * y,
                                  jnp.array(manual), 0.0, 0.5))
    np.testing.assert_allclose(float(ys[-1]), manual, rtol=1e-12)
    assert ys.shape == (4,)


def test_gradient_through_rollout():
    # INSITE backpropagates through the rollout; check d(final)/dc
    def loss(c):
        ts = jnp.linspace(0.0, 1.0, 7)
        y = euler_rollout(lambda y, t: -c * y, jnp.array(1.0), ts)
        return y[-1]

    g = jax.grad(loss)(jnp.array(0.5))
    eps = 1e-6
    fd = (loss(jnp.array(0.5 + eps)) - loss(jnp.array(0.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)
