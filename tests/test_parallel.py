"""Multi-chip sharding tests on the 8-virtual-device CPU mesh (the "fake
backend" of SURVEY.md §4): sharded results must match unsharded bit-for-bit
(pure data parallelism — no cross-row math in rollout/fine-tune)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insite_tpu.parallel import batch_mesh, pad_rows, shard_rows, unpad_rows


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
    return batch_mesh()


def test_pad_unpad_roundtrip():
    x = jnp.arange(10.0).reshape(5, 2)
    padded = pad_rows(x, 8)
    assert padded.shape == (8, 2)
    np.testing.assert_array_equal(padded[5], x[-1])
    np.testing.assert_array_equal(unpad_rows(padded, 5), x)
    assert pad_rows(x, 5) is x


def test_shard_rows_places_on_mesh(mesh):
    tree = (jnp.ones((13, 4)), jnp.zeros((13,)))
    (a, b), n = shard_rows(tree, mesh)
    assert n == 13
    assert a.shape == (16, 4) and b.shape == (16,)
    assert len(a.sharding.device_set) == 8


def test_sharded_rollout_matches_unsharded(mesh):
    from insite_tpu.discovery.library import PolynomialLibrary
    from insite_tpu.models.sindy import batched_rollout

    lib = PolynomialLibrary(n_inputs=3)
    rng = np.random.RandomState(0)
    B, T = 11, 15
    coefs = jnp.asarray(np.stack([[0, 0.3, 0, 0, -1.0, 0, 0],
                                  [0, -0.2, 0, 0, 0, -1.0, 0]]))
    y0 = jnp.asarray(np.abs(rng.randn(B)) * 10 + 1)
    statics = jnp.asarray(rng.rand(B, 2))
    arms = jnp.asarray(rng.randint(0, 2, (B, 1)) * np.ones((B, T), np.int32),
                       jnp.int32)
    dt = 1.0 / 6.0

    ref = batched_rollout(lib, coefs[None], y0, statics, arms, dt,
                          joint=False, shared_coefs=True)

    (y0_s, statics_s, arms_s), n = shard_rows((y0, statics, arms), mesh)
    out = batched_rollout(lib, coefs[None], y0_s, statics_s, arms_s, dt,
                          joint=False, shared_coefs=True)
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref),
                               rtol=1e-12)


def test_sharded_insite_finetune_matches_unsharded(mesh):
    from insite_tpu.discovery.library import PolynomialLibrary
    from insite_tpu.models.sindy import insite_finetune_predict

    lib = PolynomialLibrary(n_inputs=3)
    rng = np.random.RandomState(1)
    B, T = 9, 12
    coefs = jnp.asarray(np.stack([[0, 0.3, 0, 0, -1.0, 0, 0],
                                  [0, -0.2, 0, 0, 0, -1.0, 0]]))
    prev = jnp.asarray(np.abs(rng.randn(B, T)) * 10 + 1)
    statics = jnp.asarray(rng.rand(B, 2))
    arms = jnp.asarray(rng.randint(0, 2, (B, 1)) * np.ones((B, T), np.int32),
                       jnp.int32)
    lengths = jnp.asarray(np.full(B, T, np.int32))
    dt = 1.0 / 6.0

    ref, ref_coefs = insite_finetune_predict(
        lib, coefs, prev, statics, arms, lengths, dt, 10.0,
        projection_horizon=1, bfgs_maxiter=10)

    tree, n = shard_rows((prev, statics, arms, lengths), mesh)
    out, out_coefs = insite_finetune_predict(
        lib, coefs, *tree, dt, 10.0, projection_horizon=1, bfgs_maxiter=10)
    np.testing.assert_allclose(np.asarray(out_coefs)[:n],
                               np.asarray(ref_coefs), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref),
                               rtol=1e-8)


def test_sharded_stlsq_matches_unsharded(mesh):
    """Discovery's gram-matrix accumulation crosses the mesh as an
    all-reduce; with the row_mask as sample weight, padded rows contribute
    nothing and coefficients are device-count invariant even on noisy data
    (where repeated padding rows WOULD bias an unmasked fit)."""
    from insite_tpu.discovery.stlsq import stlsq
    from insite_tpu.parallel import row_mask

    rng = np.random.RandomState(2)
    n_rows = 157          # deliberately not a multiple of 8 -> 3 pad rows
    X = jnp.asarray(rng.randn(n_rows, 5))
    c_true = jnp.asarray([0.0, 2.0, 0.0, -1.5, 0.0])
    y = X @ c_true + 0.05 * jnp.asarray(rng.randn(n_rows))   # noisy

    c_ref, _ = stlsq(X, y, 0.1, 0.01,
                     sample_weight=jnp.ones(n_rows))

    (X_s, y_s), n = shard_rows((X, y), mesh)
    w_s = row_mask(n, mesh)
    c_shard, _ = stlsq(X_s, y_s, 0.1, 0.01, sample_weight=w_s)
    np.testing.assert_allclose(np.asarray(c_shard), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_true),
                               rtol=0.05, atol=0.02)


def test_mesh_chunked_finetune_matches_unmeshed(mesh):
    """finetune_chunk composes with the batch mesh (round-3 weak #3: the
    mesh path used to warn-and-ignore the chunk, so the degree-4 ablation
    could hard-fault HBM): each chunk is host-sliced, padded to a
    mesh-multiple, re-sharded, and solved — results must match the
    unmeshed, unchunked fine-tune on the degree-4 library."""
    from insite_tpu.data import make_collection
    from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor

    np.random.seed(0)
    coll = make_collection('EQ_4_A', {'train': 24, 'val': 4, 'test': 4},
                           0, coeff=2.0, treatment_mode='multilabel')
    coll.process_data_multi()

    def build(mesh_, chunk):
        cfg = SINDyConfig(dataset_name='EQ_4_A', sindy_threshold=0.1,
                          sindy_alpha=0.5, lam=10.0, insite=True,
                          ablation_more_complex_basis_functions=True,
                          finetune_chunk=chunk, gn_iters=4)
        m = SINDyRegressor(cfg, coll, mesh=mesh_)
        m.fit(coll.train_f)
        return m

    ref = build(None, None)._fine_tuned_rollout(coll.test_cf_one_step, 1)
    got = build(mesh, 64)._fine_tuned_rollout(coll.test_cf_one_step, 1)
    np.testing.assert_allclose(got, ref, rtol=1e-7, atol=1e-9)
