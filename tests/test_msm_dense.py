"""MSM dense all-prefix feature builders == the exploded-row reference
path (msm.py:60-292 semantics).  The dense forms avoid materialising the
~60x exploded [rows, T, k] tensors (the former MSM hot spot); these tests
pin them to the kept exploded-row builders row by row."""

import numpy as np
import pytest

from insite_tpu.data import make_collection
from insite_tpu.models.msm import MSM, MSMConfig


@pytest.fixture(scope='module')
def msm_and_coll():
    np.random.seed(0)
    coll = make_collection('EQ_4_D', {'train': 30, 'val': 6, 'test': 6}, 0,
                           coeff=2.0, treatment_mode='multilabel')
    coll.process_data_multi()
    d = coll.train_f.data
    cfg = MSMConfig(max_epochs=20,
                    dim_outcome=d['outputs'].shape[-1],
                    dim_treatments=d['current_treatments'].shape[-1],
                    dim_static_features=d['static_features'].shape[-1])
    return MSM(cfg, coll), coll


def _exploded_fit_features(m, coll, tau):
    """The pre-dense fit path: exploded rows + reference feature builders."""
    train = m._exploded(coll.train_f, min_length=m.lag_features + tau)
    active = train.data['active_entries']
    last = m._last_entries(active)
    inputs = m._inputs_regressor(train.data, projection_horizon=tau, tau=tau)
    outputs = (train.data['outputs'] * last).sum(1)
    sw = m._sample_weights(train.data, tau) \
        if 'stabilized_weights' in train.data else None
    return inputs, outputs, sw


def test_dense_propensity_fit_features_match_exploded(msm_and_coll):
    m, coll = msm_and_coll
    lag = m.lag_features
    train = m._exploded(coll.train_f, min_length=lag)
    active = train.data['active_entries']
    last = m._last_entries(active)
    ref_treat = m._inputs_treat(train.data)
    ref_hist = m._inputs_hist(train.data)
    ref_out = (train.data['current_treatments'] * last).sum(1)

    d = coll.train_f.data
    valid = m._valid_rows(d, lag).reshape(-1)
    cum = np.cumsum(np.asarray(d['prev_treatments'], np.float64), axis=1)
    dense_treat = cum[:, lag:].reshape(-1, cum.shape[-1])[valid]
    dense_hist = m._dense_hist(d)
    dense_hist = dense_hist.reshape(-1, dense_hist.shape[-1])[valid]
    ct = np.asarray(d['current_treatments'], np.float64)
    dense_out = ct[:, lag:].reshape(-1, ct.shape[-1])[valid]

    np.testing.assert_allclose(dense_treat, ref_treat, rtol=1e-12)
    np.testing.assert_allclose(dense_hist, ref_hist, rtol=1e-12)
    np.testing.assert_allclose(dense_out, ref_out, rtol=1e-12)


@pytest.mark.parametrize('tau', [0, 2, 5])
def test_dense_regressor_features_match_exploded(msm_and_coll, tau):
    m, coll = msm_and_coll
    # stabilized weights needed by the sw comparison: fit the propensity
    # stage once (cheap at this cohort size)
    if 'stabilized_weights' not in coll.train_f.data:
        m.prop_treat = m._fit_propensity('treat')
        m.prop_hist = m._fit_propensity('hist')
        pt = m.get_propensity_scores(coll.train_f, 'treat')
        ph_ = m.get_propensity_scores(coll.train_f, 'hist')
        coll.train_f.data['stabilized_weights'] = np.prod(pt / ph_, axis=2)
    ref_in, ref_out, ref_sw = _exploded_fit_features(m, coll, tau)

    d = coll.train_f.data
    lag = m.lag_features
    valid = m._valid_rows(d, lag + tau)
    dense_in = m._dense_regressor(d, tau=tau)[:, tau:]
    dense_in = dense_in.reshape(-1, dense_in.shape[-1])[valid.reshape(-1)]
    outs = np.asarray(d['outputs'], np.float64)
    dense_out = outs[:, lag + tau:].reshape(
        -1, outs.shape[-1])[valid.reshape(-1)]
    dense_sw = m._dense_sample_weights(d, tau)[valid]

    np.testing.assert_allclose(dense_in, ref_in, rtol=1e-12)
    np.testing.assert_allclose(dense_out, ref_out, rtol=1e-12)
    np.testing.assert_allclose(dense_sw, ref_sw, rtol=1e-12)


def test_dense_prediction_features_match_exploded(msm_and_coll):
    """get_predictions' forced-active all-t features (the former 600k-row
    explosion of the one-step test set)."""
    m, coll = msm_and_coll
    ds = coll.test_cf_one_step
    lag = m.lag_features
    max_len = int(max(ds.data['sequence_lengths']))
    exploded = m._exploded(ds, min_length=lag, only_active_entries=False,
                           max_length=max_len)
    ref = m._inputs_regressor(exploded.data, 0, 0)
    dense = m._dense_regressor(ds.data, tau=0)
    n, Tl = dense.shape[:2]
    np.testing.assert_allclose(dense.reshape(n * Tl, -1), ref, rtol=1e-12)


def test_msm_end_to_end_fit_predict(msm_and_coll):
    """Full fit + both eval protocols run on the dense path and produce
    finite, sane RMSEs."""
    m, coll = msm_and_coll
    m.fit()
    o, a, l = m.get_normalised_masked_rmse(coll.test_cf_one_step,
                                           one_step_counterfactual=True)
    assert np.isfinite([o, a, l]).all() and o < 20
    ns = np.asarray(m.get_normalised_n_step_rmses(coll.test_cf_treatment_seq))
    assert ns.shape == (5,) and np.isfinite(ns).all()
