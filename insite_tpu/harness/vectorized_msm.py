"""Vectorized MSM seed columns: every per-seed solve batched over seeds.

The standard MSM path (models/msm.py, reference src/models/msm.py:29-325)
fits 2 propensity models (per-output scipy L-BFGS) and projection_horizon+1
weighted linear regressors per seed, serially.  Here a whole seed column
becomes three batched f64 solves:

  1. damped-Newton logistic regression over a stacked [S, N, D] design
     (all seeds x all outputs in one einsum pipeline) for each propensity
     model — same mean-NLL objective as models/msm.logistic_fit,
  2. per-horizon weighted least squares via batched normal equations
     (pinv of the [S, D+1, D+1] grams),
  3. the exact per-seed evaluation protocol, by injecting the batched
     coefficients into standard MSM instances.

MSM stays host-f64 by design (models/msm.py:31-41: the unregularized NLL
on quasi-separable treatment columns overflows f32 logits); what was
serial-per-seed is now one BLAS-batched dispatch per stage, so the column
no longer idles the sweep while 10 scipy fits run back-to-back.
"""

from __future__ import annotations

import numpy as np

from insite_tpu.data import make_collection
from insite_tpu.models.msm import MSM, MSMConfig


def _pad_stack(mats):
    """Stack [N_s, ...] per-seed matrices to [S, N_max, ...] plus a
    validity mask [S, N_max]."""
    n_max = max(m.shape[0] for m in mats)
    out = np.zeros((len(mats), n_max) + mats[0].shape[1:], np.float64)
    mask = np.zeros((len(mats), n_max), np.float64)
    for s, m in enumerate(mats):
        out[s, :m.shape[0]] = m
        mask[s, :m.shape[0]] = 1.0
    return out, mask


def batched_logistic_fit(X, Y, mask, max_iter=100, tol=1e-10, damp=1e-9):
    """Damped-Newton logistic regression batched over seeds and outputs.

    X [S, N, D] f64, Y [S, N, K] binary, mask [S, N] (0 = padding row).
    Returns (W [S, K, D], b [S, K]) minimizing the same mean-NLL as
    models/msm.logistic_fit (sklearn penalty='none' semantics).
    """
    S, N, D = X.shape
    K = Y.shape[-1]
    X1 = np.concatenate([X, np.ones((S, N, 1))], axis=-1)   # [S, N, D+1]
    nvalid = mask.sum(axis=1)[:, None, None]                # [S, 1, 1]
    wb = np.zeros((S, K, D + 1))
    eye = np.eye(D + 1)
    for _ in range(max_iter):
        logits = np.einsum('snd,skd->snk', X1, wb)
        logits = np.clip(logits, -500.0, 500.0)
        p = 1.0 / (1.0 + np.exp(-logits))
        resid = (p - Y) * mask[:, :, None] / nvalid          # [S, N, K]
        grad = np.einsum('snk,snd->skd', resid, X1)          # [S, K, D+1]
        r = p * (1.0 - p) * mask[:, :, None] / nvalid
        H = np.einsum('snk,snd,sne->skde', r, X1, X1)
        H = H + damp * eye
        step = np.linalg.solve(H, grad[..., None])[..., 0]
        wb = wb - step
        if float(np.max(np.abs(grad))) < tol:
            break
    return wb[..., :D], wb[..., D]


def batched_wlinreg(X, Y, sw, mask):
    """Weighted multi-output linear regression with intercept, batched
    over seeds via normal-equation pinv (models/msm.linreg_fit
    semantics; D+1 is ~15 so the f64 gram is well-conditioned).
    X [S, N, D], Y [S, N, K], sw/mask [S, N] -> coef [S, D+1, K]."""
    S, N, D = X.shape
    X1 = np.concatenate([X, np.ones((S, N, 1))], axis=-1)
    w = (sw * mask)[:, :, None]
    G = np.einsum('snd,sne->sde', X1 * w, X1)                # [S,D+1,D+1]
    c = np.einsum('snd,snk->sdk', X1 * w, Y)
    return np.linalg.pinv(G) @ c


def vectorized_msm_sweep(dataset_name: str, n_seeds: int = 10,
                         num_patients: dict = None, coeff: float = 2.0,
                         epochs: int = 100, seed_start: int = 0,
                         cf_seq_mode: str = 'sliding_treatment',
                         noise_scale: float = 1.0,
                         model_overrides: dict = None,
                         max_seq_length: int = 60) -> dict:
    """Fit + evaluate a whole MSM seed column with batched solves.

    Cohorts and dims follow the standard per-seed path exactly (np.random
    draw-order parity); `epochs` caps the Newton iterations like
    MSMConfig.max_epochs caps L-BFGS. Returns the run_experiment metric
    keys, one value per seed.
    """
    num_patients = num_patients or {'train': 1000, 'val': 100, 'test': 100}
    seeds = list(range(seed_start, seed_start + n_seeds))
    colls, models = [], []
    for seed in seeds:
        np.random.seed(seed)
        coll = make_collection(dataset_name, num_patients, seed,
                               coeff=float(coeff),
                               treatment_mode='multilabel',
                               cf_seq_mode=cf_seq_mode,
                               noise_scale=noise_scale,
                               max_seq_length=max_seq_length)
        coll.process_data_multi()
        d = coll.train_f.data
        cfg = MSMConfig(max_epochs=epochs,
                        dim_outcome=d['outputs'].shape[-1],
                        dim_treatments=d['current_treatments'].shape[-1],
                        dim_static_features=d['static_features'].shape[-1],
                        **(model_overrides or {}))
        colls.append(coll)
        models.append(MSM(cfg, coll))

    # stage 1: both propensity models, all seeds at once
    for which, attr in (('treat', 'prop_treat'), ('hist', 'prop_hist')):
        designs = [m._propensity_design(which) for m in models]
        X, mask = _pad_stack([x for x, _ in designs])
        Y, _ = _pad_stack([y for _, y in designs])
        W, b = batched_logistic_fit(X, Y, mask, max_iter=epochs)
        for s, m in enumerate(models):
            setattr(m, attr, (W[s], b[s]))
    for m in models:
        m.compute_stabilized_weights()
        m.regressors = []

    # stage 2: the per-horizon regressor bank, one batched solve per tau
    ph = models[0].cfg.projection_horizon
    for tau in range(ph + 1):
        designs = [m._regressor_design(tau) for m in models]
        X, mask = _pad_stack([x for x, _, _ in designs])
        Y, _ = _pad_stack([y for _, y, _ in designs])
        sw, _ = _pad_stack([w for _, _, w in designs])
        coef = batched_wlinreg(X, Y, sw, mask)
        for s, m in enumerate(models):
            m.regressors.append(coef[s])

    # stage 3: exact per-seed evaluation protocol
    res = {'encoder_test_rmse_orig': [], 'encoder_test_rmse_all': [],
           'encoder_test_rmse_last': []}
    for m, coll in zip(models, colls):
        o, a, l = m.get_normalised_masked_rmse(
            coll.test_cf_one_step, one_step_counterfactual=True)
        res['encoder_test_rmse_orig'].append(o)
        res['encoder_test_rmse_all'].append(a)
        res['encoder_test_rmse_last'].append(l)
        n_step = np.asarray(
            m.get_normalised_n_step_rmses(coll.test_cf_treatment_seq))
        for k, v in enumerate(n_step):
            res.setdefault(f'decoder_test_rmse_{k + 2}-step',
                           []).append(float(v))
    return {k: np.asarray(v, np.float64) for k, v in res.items()}
