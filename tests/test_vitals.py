"""Vitals-stream support (real-EHR capability): the 3-stream CT
multi-input block (utils_transformer.py:220-321), G-Net vitals conditional
heads + vitals-fed MC rollouts (gnet.py:29-267, utils.py:103-143), the
vitals-aware data pipeline, and a RealDatasetCollection exercising all of
it with synthetic vitals (dataset_collection.py:113-205)."""

from copy import deepcopy

import numpy as np
import pytest

from insite_tpu.data import PkpdDatasetCollection
from insite_tpu.data.collection import RealDatasetCollection

DIM_VITALS = 2


def _add_vitals(ds, seed):
    """Fabricate a plausible scaled vitals stream: a lagged function of the
    outcome plus noise, masked by activity."""
    rng = np.random.RandomState(seed)
    po = ds.data['prev_outputs']                       # [n, T, 1]
    n, T, _ = po.shape
    base = np.concatenate([0.5 * po, -0.25 * po + 0.1], axis=-1)
    vit = (base + 0.05 * rng.randn(n, T, DIM_VITALS)) * \
        ds.data['active_entries']
    ds.data['vitals'] = vit
    ds.data['next_vitals'] = vit[:, 1:]
    return ds


@pytest.fixture(scope='module')
def rcoll():
    coll = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 40, 'val': 8, 'test': 6},
        equation_str='EQ_4_D', seed=0, max_seq_length=20,
        treatment_mode='multilabel')
    coll.process_data_encoder()
    train_f = _add_vitals(coll.train_f, 0)
    val_f = _add_vitals(coll.val_f, 1)
    test_f = _add_vitals(deepcopy(coll.val_f), 2)
    r = RealDatasetCollection(train_f, val_f, test_f,
                              projection_horizon=5,
                              treatment_mode='multilabel', seed=0)
    assert r.has_vitals
    return r


def dims(coll):
    d = coll.train_f.data
    return dict(dim_outcome=d['outputs'].shape[-1],
                dim_treatments=d['current_treatments'].shape[-1],
                dim_static_features=d['static_features'].shape[-1])


def test_multi_input_block_vitals_on_off():
    """3-stream block returns three streams and reduces to the 2-stream
    block when x_v is None."""
    import jax
    import jax.numpy as jnp
    from insite_tpu.models.nn.blocks import TransformerMultiInputBlock

    B, T, H = 3, 7, 8
    blk = TransformerMultiInputBlock(H, 2, 4, 4 * H, 0.0, 0.0)
    rng = jax.random.PRNGKey(0)
    xs = jax.random.normal(rng, (5, B, T, H))
    active = jnp.ones((B, T, 1))
    v2 = blk.init(rng, xs[0], xs[1], xs[2][:, :1], active)
    out2 = blk.apply(v2, xs[0], xs[1], xs[2][:, :1], active)
    assert len(out2) == 2 and out2[0].shape == (B, T, H)

    v3 = blk.init(rng, xs[0], xs[1], xs[2][:, :1], active, x_v=xs[3],
                  active_vitals=active)
    out3 = blk.apply(v3, xs[0], xs[1], xs[2][:, :1], active, x_v=xs[3],
                     active_vitals=active)
    assert len(out3) == 3 and out3[2].shape == (B, T, H)
    # the reference's weight sharing: the 3-stream block introduces ONLY
    # the vitals FFN beyond the 2-stream params (its forward reuses
    # self_attention_o / cross_attention_to / cross_attention_ot,
    # utils_transformer.py:286-315)
    p2 = set(jax.tree_util.tree_leaves_with_path(v2['params']) and
             [k for k, _ in
              jax.tree_util.tree_flatten_with_path(v2['params'])[0]])
    p3 = [k for k, _ in
          jax.tree_util.tree_flatten_with_path(v3['params'])[0]]
    extra = {jax.tree_util.keystr(k) for k in p3} - \
        {jax.tree_util.keystr(k) for k in p2}
    assert extra and all('ff_v' in k for k in extra), extra


def test_ct_trains_and_evaluates_with_vitals(rcoll):
    from insite_tpu.models.ct import CTConfig, CausalTransformer

    cfg = CTConfig(epochs=2, seed=0, treatment_mode='multilabel',
                   dim_vitals=DIM_VITALS, **dims(rcoll))
    m = CausalTransformer(cfg, rcoll).fit(rcoll.train_f)
    rmse_orig, rmse_all = m.get_normalised_masked_rmse(rcoll.test_cf_one_step)
    assert np.isfinite(rmse_orig) and np.isfinite(rmse_all)
    n_step = m.get_normalised_n_step_rmses(rcoll.test_cf_treatment_seq)
    assert np.isfinite(np.asarray(n_step)).all()
    assert 'vitals_input' in m.params      # vitals stream params exist


def test_ct_vitals_change_predictions(rcoll):
    """Zeroing the vitals must change a vitals-trained CT's predictions —
    the stream is load-bearing, not decorative."""
    from insite_tpu.models.ct import CTConfig, CausalTransformer

    cfg = CTConfig(epochs=2, seed=0, treatment_mode='multilabel',
                   dim_vitals=DIM_VITALS, **dims(rcoll))
    m = CausalTransformer(cfg, rcoll).fit(rcoll.train_f)
    base = m.get_predictions(rcoll.test_cf_one_step)
    zeroed = deepcopy(rcoll.test_cf_one_step)
    zeroed.data['vitals'] = np.zeros_like(zeroed.data['vitals'])
    alt = m.get_predictions(zeroed)
    assert not np.allclose(base, alt)


def test_gnet_trains_and_rolls_out_with_vitals(rcoll):
    from insite_tpu.models.gnet import GNet, GNetConfig

    coll = deepcopy(rcoll)
    cfg = GNetConfig(epochs=2, seed=0, mc_samples=2,
                     dim_vitals=DIM_VITALS, **dims(coll))
    m = GNet(cfg, coll).fit()
    # holdout residual bank covers (outcome, vitals) jointly, one step
    # shorter (gnet.py:185-199)
    assert m.holdout_resid.shape[-1] == 1 + DIM_VITALS
    rmse_orig, rmse_all = m.get_normalised_masked_rmse(coll.test_cf_one_step)
    assert np.isfinite(rmse_orig)
    n_step = m.get_normalised_n_step_rmses(coll.test_cf_treatment_seq)
    assert np.isfinite(np.asarray(n_step)).all()


def test_crn_encoder_consumes_vitals(rcoll):
    from insite_tpu.models.crn import CRN, CRNConfig

    coll = deepcopy(rcoll)
    cfg = CRNConfig(epochs=2, seed=0, treatment_mode='multilabel',
                    **dims(coll))
    m = CRN(cfg, coll)
    assert 'vitals' in m.encoder.keys
    m.fit()
    rmse_orig, rmse_all = m.get_normalised_masked_rmse(coll.test_cf_one_step)
    assert np.isfinite(rmse_orig)


def test_explode_threads_vitals(rcoll):
    ds = deepcopy(rcoll.test_f)
    n_before = ds.data['vitals'].shape[0]
    ds.explode_trajectories(5)
    assert ds.data['vitals'].shape[0] == ds.data['outputs'].shape[0]
    assert ds.data['vitals'].shape[0] > n_before
    assert ds.data['next_vitals'].shape[1] == \
        ds.data['vitals'].shape[1] - 1
