"""Fused north-star pipeline == the standard collection+fit path.

The fused program draws the bit-identical cohort (same PRNGKey
discipline as PkpdDatasetCollection.subset) and must recover the same
global coefficients and the same fine-tuned factual RMSE."""

import numpy as np

from insite_tpu.data import PkpdDatasetCollection
from insite_tpu.harness.northstar import fused_northstar
from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor


def test_fused_matches_standard_path():
    n = 120
    r = fused_northstar(n, seed=0, equation_name='EQ_4_D',
                        projection_horizon=1)

    coll = PkpdDatasetCollection(
        conf_coeff=2.0, num_patients={'train': n, 'val': 4, 'test': 2},
        equation_str='EQ_4_D', seed=0)
    cfg = SINDyConfig(dataset_name='EQ_4_D', sindy_threshold=0.1,
                      sindy_alpha=0.5, lam=10.0, insite=True)
    m = SINDyRegressor(cfg, coll)
    m.fit(coll.train_f)

    # identical support and coefficients (identical cohort; the standard
    # path only adds a scale/unscale roundtrip on the volumes)
    np.testing.assert_array_equal(np.abs(r['coefs']) > 1e-3,
                                  np.abs(m.coefs) > 1e-3)
    np.testing.assert_allclose(r['coefs'], m.coefs, rtol=1e-5, atol=1e-10)

    # fine-tuned factual fit at the same accuracy level
    preds = m._fine_tuned_rollout(coll.train_f, projection_horizon=1)
    from insite_tpu.eval.metrics import normalised_masked_rmse
    rmse_orig, rmse_all = normalised_masked_rmse(coll.train_f,
                                                 np.asarray(preds))
    np.testing.assert_allclose(r['rmse_orig'], rmse_orig, rtol=1e-3)
    np.testing.assert_allclose(r['rmse_all'], rmse_all, rtol=1e-3)
    assert r['rmse_orig'] < 0.2            # INSITE-level factual fit


def test_fused_timings_and_equation_string():
    r = fused_northstar(60, seed=1, equation_name='EQ_4_D')
    for k in ('t_sim_design', 't_stlsq', 't_finetune', 't_metric', 'total'):
        assert r[k] >= 0.0
    assert 'Treatment 0: x_dot =' in r['global_equation_string']
    assert 'Treatment 1: x_dot =' in r['global_equation_string']
