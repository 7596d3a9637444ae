"""Fused Pallas Euler+library rollout kernel (interpret mode on the CPU CI
backend; the real-TPU parity + 4x speedup is exercised by bench/driver)."""

import jax.numpy as jnp
import numpy as np
import pytest

from insite_tpu.discovery.library import PolynomialLibrary
from insite_tpu.models.sindy import batched_rollout
from insite_tpu.ops import pallas_batched_rollout


@pytest.mark.parametrize('B,T,shared', [(37, 15, True), (5, 9, False)])
def test_parity_with_xla_rollout(B, T, shared):
    lib = PolynomialLibrary(n_inputs=3)
    rng = np.random.RandomState(0)
    base = np.stack([[0, 0.3, 0, 0, -1.0, 0, 0],
                     [0, -0.2, 0, 0, 0, -1.0, 0]])
    if shared:
        coefs = jnp.asarray(base, jnp.float32)[None]
    else:
        coefs = jnp.asarray(
            base[None] * (1 + 0.1 * rng.randn(B, 1, 1)), jnp.float32)
    y0 = jnp.asarray(np.abs(rng.randn(B)) * 10 + 1, jnp.float32)
    statics = jnp.asarray(rng.rand(B, 2), jnp.float32)
    arms = jnp.asarray(rng.randint(0, 2, (B, T)), jnp.int32)

    ref = batched_rollout(lib, coefs, y0, statics, arms, 1 / 6,
                          joint=False, shared_coefs=shared)
    out = pallas_batched_rollout(lib, coefs, y0, statics, arms, 1 / 6,
                                 shared_coefs=shared, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_four_arm_selection():
    """Tumor-family layout: 4 treatment arms."""
    lib = PolynomialLibrary(n_inputs=2)
    rng = np.random.RandomState(1)
    B, T, A, F = 9, 7, 4, lib.n_features
    coefs = jnp.asarray(0.1 * rng.randn(1, A, F), jnp.float32)
    y0 = jnp.asarray(np.abs(rng.randn(B)) + 1, jnp.float32)
    statics = jnp.asarray(rng.rand(B, 1), jnp.float32)
    arms = jnp.asarray(rng.randint(0, A, (B, T)), jnp.int32)
    ref = batched_rollout(lib, coefs, y0, statics, arms, 1.0,
                          joint=False, shared_coefs=True)
    out = pallas_batched_rollout(lib, coefs, y0, statics, arms, 1.0,
                                 shared_coefs=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_y_clip_bounds_divergence_and_matches_pallas():
    """y_clip projects the rollout onto the outcome's physical range: an
    unstable discovered model (positive feedback) stays bounded, and the
    Pallas kernel applies the identical projection."""
    import jax.numpy as jnp
    lib = PolynomialLibrary(n_inputs=2)
    F = len(lib.exponents())
    # dy/dt = +y  -> exponential divergence without clipping
    coefs = np.zeros((1, 2, F), np.float32)
    y_exp = [tuple(e) for e in lib.exponents()].index((1, 0))
    coefs[:, :, y_exp] = 1.0
    coefs = jnp.asarray(coefs)
    B, T = 8, 40
    y0 = jnp.full((B,), 5.0, jnp.float32)
    statics = jnp.ones((B, 1), jnp.float32)
    arms = jnp.zeros((B, T), jnp.int32)
    free = batched_rollout(lib, coefs, y0, statics, arms, 1.0,
                           shared_coefs=True)
    assert float(free.max()) > 1e6
    clip = (0.0, 10.0)
    ref = batched_rollout(lib, coefs, y0, statics, arms, 1.0,
                          shared_coefs=True, y_clip=clip)
    assert float(ref.max()) <= 10.0 and np.isfinite(np.asarray(ref)).all()
    out = pallas_batched_rollout(lib, coefs, y0, statics, arms, 1.0,
                                 shared_coefs=True, y_clip=clip,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
