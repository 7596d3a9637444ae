"""Data-pipeline transform tests: scaling, one-hot encodings, trajectory
explosion, rolling-origin splits, sequential-test windows — the vectorised
re-expressions of the reference's per-patient Python loops
(pkpd/dataset.py:96-554)."""

import numpy as np
import pytest

from insite_tpu.data import PkpdDatasetCollection, make_collection
from insite_tpu.data.dataset import (active_entries_from_lengths,
                                     one_hot_binary, one_hot_pairs)

PH = 5


@pytest.fixture(scope='module')
def coll():
    c = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 40, 'val': 10, 'test': 4},
        equation_str='EQ_4_D', seed=0)
    c.process_data_multi()
    return c


def test_one_hot_encodings():
    a = np.array([0., 1., 0., 1.])
    b = np.array([0., 0., 1., 1.])
    np.testing.assert_array_equal(
        one_hot_pairs(a, b),
        np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                 float))
    np.testing.assert_array_equal(one_hot_binary(a)[:, 1], a)


def test_active_entries():
    m = active_entries_from_lengths(np.array([2, 4]), 5)
    assert m.shape == (2, 5, 1)
    np.testing.assert_array_equal(m[0, :, 0], [1, 1, 0, 0, 0])
    np.testing.assert_array_equal(m[1, :, 0], [1, 1, 1, 1, 0])


def test_unified_keys_and_scaling(coll):
    d = coll.train_f.data
    for k in ('prev_treatments', 'current_treatments', 'prev_outputs',
              'outputs', 'static_features', 'active_entries',
              'sequence_lengths', 'unscaled_outputs', 'current_covariates'):
        assert k in d, k
    # outputs are z-scored with the train-set scaling params
    sp = coll.train_f.scaling_params
    np.testing.assert_allclose(
        d['outputs'] * sp['output_stds'] + sp['output_means'],
        d['unscaled_outputs'], rtol=1e-6)
    active = d['active_entries'].astype(bool)
    assert abs(d['outputs'][active[..., 0]].mean()) < 0.2
    # prev_outputs is outputs shifted right by one step
    np.testing.assert_allclose(d['prev_outputs'][:, 1:, 0],
                               d['outputs'][:, :-1, 0], rtol=1e-6)
    # treatments are one-hot rows on active entries
    s = d['current_treatments'].sum(-1)
    assert np.all(s[active[..., 0]] == 1.0)


def test_val_uses_train_scaling(coll):
    assert coll.val_f.scaling_params is coll.train_f.scaling_params or \
        np.allclose(coll.val_f.scaling_params['output_means'],
                    coll.train_f.scaling_params['output_means'])


def test_explode_trajectories(coll):
    import copy
    ds = copy.deepcopy(coll.train_f)
    lengths = ds.data['sequence_lengths'].astype(int)
    outputs = ds.data['outputs'].copy()
    ds.explode_trajectories(PH)
    d = ds.data
    # row count: one prefix per length in [PH+1, L] (pkpd/dataset.py:194-280)
    assert len(d['sequence_lengths']) == np.maximum(lengths - PH, 0).sum()
    # first exploded row of patient 0 is its (PH+1)-prefix
    row0 = d['outputs'][0]
    np.testing.assert_allclose(row0[:PH + 1], outputs[0, :PH + 1], rtol=1e-6)
    assert np.all(row0[PH + 1:] == 0)
    assert np.all(
        d['active_entries'].sum(axis=(1, 2)) == d['sequence_lengths'])


def test_process_sequential_rolling_origin(coll):
    import copy
    ds = copy.deepcopy(coll.train_f)
    lengths = ds.data['sequence_lengths'].astype(int)
    outputs = ds.data['outputs'].copy()
    n, T, _ = outputs.shape
    enc_r = np.arange(n * T * 3, dtype=float).reshape(n, T, 3)
    ds.process_sequential(enc_r, PH)
    d = ds.data
    assert len(d['outputs']) == np.maximum(lengths - PH - 1, 0).sum()
    assert d['outputs'].shape[1:] == (PH, 1)
    # first row of patient 0: origin t=1, outputs[1:1+PH]
    np.testing.assert_allclose(d['outputs'][0, :, 0],
                               outputs[0, 1:1 + PH, 0], rtol=1e-6)
    np.testing.assert_allclose(d['init_state'][0], enc_r[0, 0], rtol=1e-6)
    assert np.all(d['sequence_lengths'] == PH)


def test_process_sequential_test(coll):
    # process_data_multi already ran process_sequential_test +
    # process_sequential_multi on the seq test set; the PH-window rows live
    # in data_processed_seq, the restored full rows in data.
    ds = coll.test_cf_treatment_seq
    full, d = ds.data, ds.data_processed_seq
    lengths = full['sequence_lengths'].astype(int)
    assert d['outputs'].shape[1] == PH
    i = 0
    L = lengths[i]
    np.testing.assert_allclose(d['outputs'][i, :, 0],
                               full['outputs'][i, L - PH:L, 0], rtol=1e-6)
    # encoder-active mask covers exactly the factual prefix
    assert d['active_encoder_r'][i].sum() == L - PH


def test_process_sequential_multi_restores_rows(coll):
    ds = coll.test_cf_treatment_seq
    d = ds.data
    np.testing.assert_array_equal(
        d['future_past_split'], d['sequence_lengths'] - PH)
    assert d['outputs'].shape[1] > PH


@pytest.mark.parametrize('name,mode,dim', [
    ('cancer_sim', 'multiclass', 4),   # 4-class one-hot of (chemo, radio)
    ('cancer_sim', 'multilabel', 2),   # two binary application columns
    ('EQ_5_D', 'multiclass', 4),
])
def test_tumor_collections_process(name, mode, dim):
    coll = make_collection(name, {'train': 12, 'val': 6, 'test': 4}, seed=0,
                           coeff=2.0, treatment_mode=mode)
    coll.process_data_multi()
    d = coll.train_f.data
    assert d['current_treatments'].shape[-1] == dim
    active = d['active_entries'].astype(bool)[..., 0]
    assert np.isfinite(d['outputs'][active]).all()
    if mode == 'multiclass':
        assert np.all(d['current_treatments'][active].sum(-1) == 1.0)
    else:
        assert set(np.unique(d['current_treatments'])) <= {0.0, 1.0}


def test_gnet_holdout_and_mc(coll):
    import copy
    c = copy.deepcopy(coll)
    c.split_train_f_holdout(holdout_ratio=0.1)
    n_tr = len(c.train_f)
    n_ho = len(c.train_f_holdout)
    assert n_ho == pytest.approx(0.1 * (n_tr + n_ho), abs=1)
    c.explode_cf_treatment_seq(mc_samples=2)
    assert len(c.test_cf_treatment_seq_mc) == 2
