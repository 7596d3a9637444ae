"""Vectorized MSM column vs the standard per-seed path.

The batched damped-Newton logistic fits and batched weighted
least-squares (harness/vectorized_msm.py) must reproduce the standard
host path (models/msm.py: per-output scipy L-BFGS + per-tau lstsq) —
same cohorts, same designs, different solver — to metric precision.
"""

import numpy as np
import pytest

from insite_tpu.data import make_collection
from insite_tpu.harness.vectorized_msm import vectorized_msm_sweep
from insite_tpu.models.msm import MSM, MSMConfig

N_PATIENTS = {'train': 200, 'val': 20, 'test': 20}
SEEDS = (0, 1)


def _standard_metrics(dataset_name, seed):
    np.random.seed(seed)
    coll = make_collection(dataset_name, dict(N_PATIENTS), seed,
                           coeff=2.0, treatment_mode='multilabel')
    coll.process_data_multi()
    d = coll.train_f.data
    cfg = MSMConfig(max_epochs=100,
                    dim_outcome=d['outputs'].shape[-1],
                    dim_treatments=d['current_treatments'].shape[-1],
                    dim_static_features=d['static_features'].shape[-1])
    m = MSM(cfg, coll).fit()
    o, a, l = m.get_normalised_masked_rmse(coll.test_cf_one_step,
                                           one_step_counterfactual=True)
    n_step = np.asarray(
        m.get_normalised_n_step_rmses(coll.test_cf_treatment_seq))
    return np.array([o, a, l, *n_step])


@pytest.mark.parametrize('dataset_name', ['EQ_4_A'])
def test_vectorized_msm_matches_standard(dataset_name):
    r = vectorized_msm_sweep(dataset_name, n_seeds=len(SEEDS),
                             num_patients=dict(N_PATIENTS), epochs=100)
    keys = ['encoder_test_rmse_orig', 'encoder_test_rmse_all',
            'encoder_test_rmse_last'] + \
           [f'decoder_test_rmse_{k}-step' for k in range(2, 7)]
    for s, seed in enumerate(SEEDS):
        want = _standard_metrics(dataset_name, seed)
        got = np.array([r[k][s] for k in keys])
        assert np.all(np.isfinite(got)), got
        # identical designs, different convex solvers (batched Newton vs
        # per-output L-BFGS): 1-step metrics agree to ~1e-5; the n-step
        # horizons compound the propensity-endpoint difference through
        # the clipped SW products, so allow a few percent there
        np.testing.assert_allclose(got[:3], want[:3], rtol=1e-3)
        np.testing.assert_allclose(got[3:], want[3:], rtol=5e-2)
