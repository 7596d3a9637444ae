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


def test_sensitivity_kernel_matches_jacfwd():
    """pallas_rollout_with_sens integrates forward sensitivities that
    match jacfwd through the XLA rollout (the fine-tune's Jacobian)."""
    import jax
    from insite_tpu.ops.pallas_rollout import pallas_rollout_with_sens

    lib = PolynomialLibrary(n_inputs=3)
    rng = np.random.RandomState(0)
    B, T, A, F = 6, 12, 2, lib.n_features
    base = np.stack([[0, 0.3, 0, 0, -1.0, 0, 0],
                     [0, -0.2, 0, 0, 0, -1.0, 0]]).astype(np.float32)
    coefs = jnp.asarray(base[None] * (1 + 0.05 * rng.randn(B, 1, 1)),
                        jnp.float32)
    y0 = jnp.asarray(np.abs(rng.randn(B)) * 5 + 1, jnp.float32)
    statics = jnp.asarray(rng.rand(B, 2), jnp.float32)
    arms = jnp.asarray(rng.randint(0, 2, (B, T)), jnp.int32)
    active_idx = tuple(int(i) for i in
                       np.flatnonzero(np.abs(base.reshape(-1)) > 1e-3))

    y, s = pallas_rollout_with_sens(lib, coefs, y0, statics, arms, 1 / 6,
                                    active_idx, interpret=True)

    def roll_one(c_red, c_full, y0_i, st_i, arm_i):
        c = c_full.reshape(-1).at[jnp.asarray(active_idx)].set(c_red)
        return batched_rollout(lib, c.reshape(1, A, F), y0_i[None],
                               st_i[None], arm_i[None], 1 / 6,
                               joint=False, shared_coefs=True)[0]

    for b in range(B):
        c_red = coefs[b].reshape(-1)[jnp.asarray(active_idx)]
        ref_y = roll_one(c_red, coefs[b], y0[b], statics[b], arms[b])
        ref_J = jax.jacfwd(
            lambda cr: roll_one(cr, coefs[b], y0[b], statics[b],
                                arms[b]))(c_red)
        np.testing.assert_allclose(np.asarray(y[b]), np.asarray(ref_y),
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(s[b]), np.asarray(ref_J),
                                   rtol=2e-4, atol=1e-5)


def test_sensitivity_kernel_y_clip_zeroes_gradient():
    from insite_tpu.ops.pallas_rollout import pallas_rollout_with_sens
    lib = PolynomialLibrary(n_inputs=2)
    F = lib.n_features
    coefs = np.zeros((1, 2, F), np.float32)
    y_exp = [tuple(e) for e in lib.exponents()].index((1, 0))
    coefs[0, :, y_exp] = 1.0                    # dy/dt = +y (diverges)
    coefs = jnp.asarray(np.repeat(coefs, 3, 0))
    y0 = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    statics = jnp.ones((3, 1), jnp.float32)
    arms = jnp.zeros((3, 10), jnp.int32)
    active_idx = (y_exp,)
    y, s = pallas_rollout_with_sens(lib, coefs, y0, statics, arms, 1.0,
                                    active_idx, y_clip=(0.0, 5.0),
                                    interpret=True)
    assert float(np.max(y)) <= 5.0
    # once clipped, the sensitivity is zeroed (clip jvp semantics)
    assert np.all(np.asarray(s)[:, -1] == 0.0)


@pytest.mark.slow
def test_pallas_gn_finetune_matches_xla_gn():
    """The batched Pallas LM fine-tune reproduces the XLA
    jvp-through-scan fine-tune (same objective, same update sequence)."""
    from insite_tpu.models.sindy import (insite_gn_finetune_predict,
                                         insite_gn_finetune_predict_pallas)

    lib = PolynomialLibrary(n_inputs=3)
    rng = np.random.RandomState(0)
    B, T = 8, 14
    base = np.stack([[0, 0.3, 0, 0, -1.0, 0, 0],
                     [0, -0.2, 0, 0, 0, -1.0, 0]]).astype(np.float32)
    # a retained SUB-threshold global coefficient (|c| <= 1e-3): skip rows
    # (seq_len <= projection_horizon) roll out the FULL unmasked global
    # model on both paths — this entry must survive into their rollout
    base[0, 0] = 8e-4
    g = jnp.asarray(base)
    active_idx = tuple(int(i) for i in
                       np.flatnonzero(np.abs(base.reshape(-1)) > 1e-3))
    prev = jnp.asarray(np.abs(rng.randn(B, T)) * 5 + 1, jnp.float32)
    statics = jnp.asarray(rng.rand(B, 2), jnp.float32)
    arms = jnp.asarray(rng.randint(0, 2, (B, 1)) *
                       np.ones((B, T), np.int32), jnp.int32)
    lengths = jnp.asarray([T, T, T, T, T, 3, T, 9], jnp.int32)

    p_x, c_x = insite_gn_finetune_predict(
        lib, g, prev, statics, arms, lengths, 1 / 6, 10.0,
        projection_horizon=5, gn_iters=6, active_idx=active_idx)
    p_p, c_p = insite_gn_finetune_predict_pallas(
        lib, g, prev, statics, arms, lengths, 1 / 6, 10.0,
        projection_horizon=5, gn_iters=6, active_idx=active_idx,
        interpret=True)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x),
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_x),
                               rtol=5e-4, atol=1e-4)


def test_pallas_finetune_failure_falls_back_to_xla(monkeypatch):
    """A sensitivity-kernel failure on the real backend degrades to the
    XLA fine-tune (warned once, memoized) instead of killing the sweep or
    bench — the kernel is validated in interpret mode on CPU, so its
    first hardware lowering happens inside a driver run."""
    from insite_tpu.data import PkpdDatasetCollection
    from insite_tpu.models import sindy as sindy_mod

    coll = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 24, 'val': 4, 'test': 2},
        equation_str='EQ_4_D', seed=0)
    kw = dict(dataset_name='EQ_4_D', sindy_threshold=0.1, sindy_alpha=0.5,
              lam=10.0, insite=True)
    ref = sindy_mod.SINDyRegressor(
        sindy_mod.SINDyConfig(**kw, rollout_backend='xla'), coll) \
        .fit(coll.train_f)
    p_ref = np.asarray(ref._fine_tune(coll.train_f, 1)[0])

    calls = []

    def boom(*a, **k):
        calls.append(1)
        raise RuntimeError('RESOURCE_EXHAUSTED: vmem')

    monkeypatch.setattr(sindy_mod, 'insite_gn_finetune_predict_pallas',
                        boom)
    m = sindy_mod.SINDyRegressor(
        sindy_mod.SINDyConfig(**kw, rollout_backend='pallas'), coll) \
        .fit(coll.train_f)
    p, _ = m._fine_tune(coll.train_f, 1)
    assert getattr(m, '_pallas_failed', False)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-7, atol=1e-9)
    # memoized: a second fine-tune does not retry the broken kernel
    m._fine_tune(coll.train_f, 1)
    assert len(calls) == 1
