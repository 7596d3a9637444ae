"""End-to-end EQ_4 pipeline tests: dataset collection -> SINDy discovery ->
INSITE fine-tuning -> normalized masked RMSE, with accuracy gates anchored
to the reference main table (BASELINE.md: A-SINDy EQ_4_D 1-step 0.160%,
INSITE 0.0204%; small-cohort runs here use looser gates)."""

import numpy as np
import pytest

from insite_tpu.data import PkpdDatasetCollection
from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor


@pytest.fixture(scope='module')
def collection():
    return PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': 200, 'val': 20, 'test': 4},
        equation_str='EQ_4_D', seed=0)


@pytest.fixture(scope='module')
def sindy_model(collection):
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=False)
    return SINDyRegressor(cfg, collection).fit(collection.train_f)


def test_discovered_equation_structure(sindy_model):
    # ground truth: dy/dt = -(u_a + const + shared noise) * y per arm ->
    # only x0 and x0*u_a terms survive thresholding
    coefs = sindy_model.coefs
    assert coefs.shape == (2, 7)
    names = sindy_model.library.feature_names(['x0', 'u0', 'u1'])
    x0_u0 = names.index('x0 u0')
    x0_u1 = names.index('x0 u1')
    assert abs(coefs[0, x0_u0] + 1.0) < 0.1      # arm 0: -1.0 * x0*u0
    assert abs(coefs[1, x0_u1] + 1.0) < 0.1      # arm 1: -1.0 * x0*u1
    assert np.abs(coefs[:, 0]).max() < 1e-6      # no bias term


def test_sindy_one_step_rmse(collection, sindy_model):
    orig, all_, last = sindy_model.get_normalised_masked_rmse(
        collection.test_cf_one_step, one_step_counterfactual=True)
    assert orig < 0.5          # reference A-SINDy: 0.16 +- tiny
    assert last < 0.5


def test_sindy_n_step_rmse(collection, sindy_model):
    rmses = sindy_model.get_normalised_n_step_rmses(
        collection.test_cf_treatment_seq)
    assert rmses.shape == (5,)
    assert np.all(rmses < 0.5)  # reference: 0.148


def test_gn_solver_matches_or_beats_bfgs(collection):
    """The default Gauss-Newton fine-tuner optimises the same objective as
    the reference's BFGS (sindy.py:627) — predictions must be at least as
    good on the factual fit."""
    import numpy as np
    from insite_tpu.eval.metrics import normalised_masked_rmse
    rmse = {}
    for solver in ('gauss_newton', 'bfgs'):
        cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                          sindy_alpha=0.5, lam=10.0, insite=True,
                          insite_solver=solver, bfgs_maxiter=100)
        m = SINDyRegressor(cfg, collection).fit(collection.train_f)
        preds = m._fine_tuned_rollout(collection.val_f, projection_horizon=1)
        rmse[solver], _ = normalised_masked_rmse(collection.val_f,
                                                 np.asarray(preds))
    assert rmse['gauss_newton'] <= rmse['bfgs'] * 1.05


def test_insite_beats_global_sindy(collection, sindy_model):
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=True)
    insite = SINDyRegressor(cfg, collection).fit(collection.train_f)
    orig_i, _, last_i = insite.get_normalised_masked_rmse(
        collection.test_cf_one_step, one_step_counterfactual=True)
    orig_s, _, last_s = sindy_model.get_normalised_masked_rmse(
        collection.test_cf_one_step, one_step_counterfactual=True)
    assert orig_i < orig_s       # personalisation must help on EQ_4_D
    assert orig_i < 0.08         # reference INSITE: 0.0204

    rmses = insite.get_normalised_n_step_rmses(
        collection.test_cf_treatment_seq)
    assert np.all(rmses < 0.15)  # reference: <= 0.0465


def test_equation_string_emitted(sindy_model):
    s = sindy_model.global_equation_string
    assert 'Treatment 0' in s and 'Treatment 1' in s and 'x0' in s


def test_wsindy_runs_on_eq4(collection):
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, wsindy=True)
    m = SINDyRegressor(cfg, collection).fit(collection.train_f)
    orig, all_, last = m.get_normalised_masked_rmse(
        collection.test_cf_one_step, one_step_counterfactual=True)
    assert orig < 1.0            # reference A-WSINDy: 0.102


def test_finetune_chunking_matches_unchunked(collection):
    """finetune_chunk processes the cohort in padded fixed-size row chunks
    (degree-4 Jacobians OOM a whole-test-set dispatch); chunked and
    unchunked fine-tunes are row-independent and must agree."""
    base = dict(dataset_name='EQ_4_D', sindy_threshold=0.1,
                sindy_alpha=0.5, lam=10.0, insite=True)
    m_full = SINDyRegressor(SINDyConfig(**base), collection) \
        .fit(collection.train_f)
    m_chunk = SINDyRegressor(SINDyConfig(**base, finetune_chunk=3),
                             collection).fit(collection.train_f)
    p_full = m_full.get_predictions(collection.test_cf_one_step)
    p_chunk = m_chunk.get_predictions(collection.test_cf_one_step)
    np.testing.assert_allclose(np.asarray(p_chunk), np.asarray(p_full),
                               rtol=1e-6, atol=1e-8)


def test_active_set_gn_matches_full_gn(collection):
    """The reduced Gauss-Newton problem over the host-known sparse support
    must match the full-K problem: inactive coordinates of the full
    problem never move (their only residual is the proximal term, starting
    at zero)."""
    import jax.numpy as jnp
    from insite_tpu.models.sindy import insite_gn_finetune_predict
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=True)
    m = SINDyRegressor(cfg, collection).fit(collection.train_f)
    prev, statics, arms, lengths = m._rollout_args(collection.val_f)
    coefs = jnp.asarray(m.coefs)
    act = tuple(int(i) for i in
                np.flatnonzero(np.abs(m.coefs).reshape(-1) > 1e-3))
    assert 0 < len(act) < m.coefs.size
    full = insite_gn_finetune_predict(
        m.library, coefs, prev, statics, arms, lengths, m.dt, lam=10.0,
        projection_horizon=1)
    red = insite_gn_finetune_predict(
        m.library, coefs, prev, statics, arms, lengths, m.dt, lam=10.0,
        projection_horizon=1, active_idx=act)
    np.testing.assert_allclose(np.asarray(red[0]), np.asarray(full[0]),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(red[1]), np.asarray(full[1]),
                               rtol=1e-6, atol=1e-9)


def test_recover_parametric_dist(collection):
    """INSIGHT_RECOVER_PARAMETRIC_DIST (harness/insights.py): the
    per-patient fine-tuned decay constants -(dx_dot/dx0) must recover the
    simulator's hidden C distribution (reference run.py:35-42 defines the
    experiment; pkpd_simulation.py:96-203 the hidden params)."""
    from insite_tpu.harness.insights import recover_parametric_dist
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=True)
    m = SINDyRegressor(cfg, collection).fit(collection.train_f)
    rec = recover_parametric_dist(m, collection.val_f)
    assert set(rec) == {'arm0', 'arm1'}
    for arm, s in rec.items():
        assert s['n'] > 1
        # full-size cohorts give r = 1.000; the 20-patient val subset
        # leaves a little room
        assert s['pearson_r'] > 0.9, (arm, s)
        assert abs(s['recovered_mean'] - s['true_mean']) < 0.05, (arm, s)


def test_sindy_quantize_affects_predictions(collection):
    """The quantize ablation rounds the model PREDICTIONS run on
    (reference sindy.py:274-294), not just the equation string: the global
    coefficients themselves are rounded, so rollouts consume them."""
    kw = dict(dataset_name='EQ_4_D', sindy_threshold=0.1, sindy_alpha=0.5,
              lam=10.0, insite=False)
    base = SINDyRegressor(SINDyConfig(**kw), collection) \
        .fit(collection.train_f)
    quant = SINDyRegressor(
        SINDyConfig(sindy_quantize=True,
                    sindy_quantize_global_model_round_to=1, **kw),
        collection).fit(collection.train_f)
    np.testing.assert_array_equal(quant.coefs,
                                  np.round(base.coefs, 1))
    # predictions actually differ when the rounding moved a coefficient
    if not np.allclose(quant.coefs, base.coefs):
        pb = base.get_predictions(collection.test_cf_one_step)
        pq = quant.get_predictions(collection.test_cf_one_step)
        assert not np.allclose(pb, pq)
