"""Neural/classical baseline smoke + determinism tests.

The reference ships exactly one pytest integration test — CT trained twice
must produce identical metrics (libs_m/ct/tests/test_ct_cancer.py:7-23).
We reproduce that under jax PRNG discipline and extend it with per-method
smoke tests (finite metrics, correct shapes) on a tiny EQ_4 cohort."""

import numpy as np
import pytest

from insite_tpu.data import PkpdDatasetCollection

TINY = {'train': 32, 'val': 8, 'test': 6}
SEQ = 20


def make_coll(treatment_mode='multilabel'):
    c = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients=dict(TINY), equation_str='EQ_4_D',
        seed=0, max_seq_length=SEQ, treatment_mode=treatment_mode)
    return c


def dims(coll):
    d = coll.train_f.data
    return dict(dim_outcome=d['outputs'].shape[-1],
                dim_treatments=d['current_treatments'].shape[-1],
                dim_static_features=d['static_features'].shape[-1])


def _eval(model, coll):
    orig, all_, last = model.get_normalised_masked_rmse(
        coll.test_cf_one_step, one_step_counterfactual=True)
    n_step = np.asarray(
        model.get_normalised_n_step_rmses(coll.test_cf_treatment_seq))
    return orig, all_, last, n_step


@pytest.fixture(scope='module')
def coll_multi():
    c = make_coll()
    c.process_data_multi()
    return c


def test_ct_smoke_and_determinism(coll_multi):
    """train twice with the same seed -> identical metrics
    (test_ct_cancer.py:7-23)."""
    from insite_tpu.models.ct import CausalTransformer, CTConfig

    def run():
        cfg = CTConfig(epochs=2, seed=0, treatment_mode='multilabel',
                       batch_size=16, **dims(coll_multi))
        m = CausalTransformer(cfg, coll_multi)
        m.fit(coll_multi.train_f, coll_multi.val_f)
        return _eval(m, coll_multi)

    o1, a1, l1, n1 = run()
    o2, a2, l2, n2 = run()
    assert np.isfinite([o1, a1, l1]).all() and np.isfinite(n1).all()
    assert n1.shape == (5,)
    assert (o1, a1, l1) == (o2, a2, l2)
    np.testing.assert_array_equal(n1, n2)


def test_gnet_smoke(coll_multi):
    from insite_tpu.models.gnet import GNet, GNetConfig
    import copy
    coll = copy.deepcopy(coll_multi)
    cfg = GNetConfig(epochs=2, seed=0, mc_samples=2, batch_size=16,
                     **dims(coll))
    m = GNet(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    orig, all_, last, n_step = _eval(m, coll)
    assert np.isfinite([orig, all_, last]).all()
    assert np.isfinite(n_step).all() and n_step.shape == (5,)

    # chunked eval (the HBM cap for the stacked MC batch) must equal the
    # single-dispatch path, including the zero-padded final chunk
    full = m._predict_data(coll.test_cf_one_step.data)
    m._PREDICT_CHUNK = 7
    chunked = m._predict_data(coll.test_cf_one_step.data)
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-6)
    del m._PREDICT_CHUNK            # back to the class default

    # the on-device MC rollout must equal the straightforward host loop
    # (per-step predict, clean recording, noisy feedback — gnet.py:230-267)
    datasets = coll.test_cf_treatment_seq_mc
    ph = m.cfg.projection_horizon
    M = m.cfg.mc_samples
    n = len(datasets[0].data['prev_outputs'])
    rng = np.random.RandomState(m.cfg.seed)
    flat = {k: np.concatenate([np.array(d.data[k]) for d in datasets])
            for k in ('prev_outputs', 'current_treatments',
                      'static_features', 'future_past_split')}
    rows = np.arange(M * n)
    split = flat['future_past_split'].astype(int)
    expected = np.zeros((M, n, ph, m.cfg.dim_outcome))
    for t in range(ph + 1):
        outputs_scaled = m._predict_data(flat)
        if t > 0:
            expected[:, :, t - 1, :] = outputs_scaled[
                rows, split - 1 + t, :].reshape(M, n, m.cfg.dim_outcome)
        if m.holdout_resid is not None:
            ridx = np.concatenate(
                [rng.randint(len(m.holdout_resid), size=n)
                 for _ in range(M)])
            rlen = m.holdout_resid_len[ridx]
            outputs_scaled[rows, split - 1 + t, :] += m.holdout_resid[
                ridx, np.minimum(split - 1 + t, rlen - 1), :]
        if t < ph:
            flat['prev_outputs'][rows, split + t, :] = \
                outputs_scaled[rows, split - 1 + t, :]
    got = m.get_autoregressive_predictions(datasets)
    np.testing.assert_allclose(got, expected.mean(0), rtol=1e-5, atol=1e-6)


def test_msm_smoke(coll_multi):
    from insite_tpu.models.msm import MSM, MSMConfig
    import copy
    coll = copy.deepcopy(coll_multi)
    m = MSM(MSMConfig(**dims(coll)), coll)
    m.fit(coll.train_f, coll.val_f)
    orig, all_, last, n_step = _eval(m, coll)
    assert np.isfinite([orig, all_, last]).all()
    assert np.isfinite(n_step).all() and n_step.shape == (5,)


def test_crn_smoke():
    from insite_tpu.models.crn import CRN, CRNConfig
    coll = make_coll()
    coll.process_data_encoder()
    cfg = CRNConfig(epochs=2, seed=0, treatment_mode='multilabel',
                    enc_batch_size=16, dec_batch_size=16, **dims(coll))
    m = CRN(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    orig, all_, last, n_step = _eval(m, coll)
    assert np.isfinite([orig, all_, last]).all()
    assert np.isfinite(n_step).all() and n_step.shape == (5,)


def test_edct_smoke():
    from insite_tpu.models.edct import EDCT, EDCTConfig
    coll = make_coll()
    coll.process_data_encoder()
    cfg = EDCTConfig(epochs=2, seed=0, treatment_mode='multilabel',
                     **dims(coll))
    m = EDCT(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    orig, all_, last, n_step = _eval(m, coll)
    assert np.isfinite([orig, all_, last]).all()
    assert np.isfinite(n_step).all() and n_step.shape == (5,)


def test_rmsn_smoke():
    from insite_tpu.models.rmsn import RMSN, RMSNConfig
    coll = make_coll()
    coll.process_data_encoder()
    cfg = RMSNConfig(epochs=2, seed=0, treatment_mode='multilabel',
                     **dims(coll))
    m = RMSN(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    orig, all_, last, n_step = _eval(m, coll)
    assert np.isfinite([orig, all_, last]).all()
    assert np.isfinite(n_step).all() and n_step.shape == (5,)


def test_rmsn_sw_modes():
    """Both stabilized-weight formulas produce a usable pipeline; on
    saturated propensity scores the likelihood SW is exactly 1 while the
    reference's score-ratio SW (dataset_collection.py:48) is not."""
    from insite_tpu.models.rmsn import RMSN, RMSNConfig
    coll = make_coll()
    coll.process_data_encoder()
    cfg = RMSNConfig(epochs=2, seed=0, treatment_mode='multilabel',
                     sw_mode='score_ratio', **dims(coll))
    m = RMSN(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    assert 'stabilized_weights' in coll.train_f.data

    # analytic check of the two formulas on saturated scores
    a = np.array([[[1.0], [0.0], [1.0]]])
    pt = np.array([[[0.999], [0.001], [0.999]]])
    ph = np.array([[[0.9999], [0.0001], [0.9999]]])
    score_ratio = np.prod(pt / ph, axis=2)
    lik_t = a * pt + (1 - a) * (1 - pt)
    lik_h = a * ph + (1 - a) * (1 - ph)
    likelihood = np.prod(lik_t / lik_h, axis=2)
    assert np.allclose(likelihood, 1.0, atol=1e-3)
    assert abs(score_ratio[0, 1] - 10.0) < 0.2  # 0.001/0.0001


def test_edct_attention_maps():
    """Attention-map extraction — the reference's forward-hook
    visualization (edct.py:194-227) via the flax intermediates
    collection."""
    from insite_tpu.models.edct import EDCT, EDCTConfig
    coll = make_coll()
    coll.process_data_encoder()
    cfg = EDCTConfig(epochs=1, seed=0, treatment_mode='multilabel',
                     **dims(coll))
    m = EDCT(cfg, coll)
    m.fit(coll.train_f, coll.val_f)
    maps = m.encoder.get_attention_maps(coll.test_cf_one_step)
    assert maps, 'no attention maps collected'
    for path, arr in maps.items():
        B, H, Tq, Tk = arr.shape
        assert B == len(coll.test_cf_one_step)
        # rows are softmax distributions
        np.testing.assert_allclose(arr.sum(-1), 1.0, rtol=1e-4)


def test_torch_parity_init():
    """TorchDense / VariationalLSTM params follow torch's default init:
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) kernels AND biases (nn.Linear
    reset_parameters), and two LSTM bias vectors (b_ih + b_hh)."""
    import jax
    import jax.numpy as jnp
    from insite_tpu.models.nn.blocks import TorchDense, VariationalLSTM

    fan_in, features = 64, 32
    p = TorchDense(features).init(jax.random.PRNGKey(0),
                                  jnp.zeros((2, fan_in)))['params']
    bound = 1.0 / np.sqrt(fan_in)
    for leaf in (p['kernel'], p['bias']):
        a = np.asarray(leaf)
        assert np.abs(a).max() <= bound
        assert np.abs(a).max() > 0.5 * bound      # not degenerate / zeros
    assert np.abs(np.asarray(p['bias'])).max() > 0.0

    lp = VariationalLSTM(hidden_size=16).init(
        jax.random.PRNGKey(0), jnp.zeros((2, 5, 8)))['params']
    assert 'b_0' in lp and 'b_hh_0' in lp
    lb = 1.0 / np.sqrt(16)
    for k in ('w_ih_0', 'w_hh_0', 'b_0', 'b_hh_0'):
        assert np.abs(np.asarray(lp[k])).max() <= lb


def test_ct_attention_maps():
    """CT attention-map extraction (the reference's CT.visualize hook
    targets, ct.py:205-216): one [B, heads, T, T] map per attention
    module of every block."""
    coll = make_coll()
    coll.process_data_multi()
    from insite_tpu.models.ct import CTConfig, CausalTransformer
    cfg = CTConfig(epochs=1, seed=0, treatment_mode='multilabel',
                   **dims(coll))
    m = CausalTransformer(cfg, coll).fit(coll.train_f)
    maps = m.get_attention_maps(coll.test_cf_one_step)
    names = ' '.join(maps)
    for key in ('self_attention_t', 'self_attention_o',
                'cross_attention_to', 'cross_attention_ot'):
        assert key in names, key
    n = len(coll.test_cf_one_step.data['outputs'])
    for k, v in maps.items():
        assert v.shape[0] == n and v.shape[1] == cfg.num_heads, (k, v.shape)
        assert v.shape[2] == v.shape[3]
