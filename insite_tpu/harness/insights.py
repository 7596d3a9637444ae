"""INSIGHT_RECOVER_PARAMETRIC_DIST analysis: does INSITE's per-patient
fine-tuning recover the simulator's hidden parametric distribution?

The reference defines the experiment enum (run.py:35-42) and debug-prints
the per-patient coefficient tensor (sindy.py:679-683) but ships no
analysis. Here the recovery is measured properly: per-patient recovered
decay rates are correlated against the EQ_4 simulator's true hidden decay
constants (`hidden_C_a` in `sim/pkpd.py::get_standard_params`, reference
pkpd_simulation.py:96-203).

Two identifiability facts shape the formula:

- EQ_4's truth is dy/dt = -C_a(patient)·y under the patient's (fixed)
  arm, with C depending linearly on the observed statics for variants C/D
  plus per-patient noise for D. The library's inputs for the non-joint
  EQ_4 fit are [x0, statics...] (named x0, u0, u1 for reference parity,
  `SINDyRegressor._input_names`), so the discovered arm equation is
  x_dot = (c_x0 + Σ_j c_{x0·u_j}·s_j)·x0 + ... — the per-patient decay
  constant is the x0-gradient evaluated at the patient's (unscaled)
  statics:  C_a(i) = -(c_x0 + Σ_j c_{x0·u_j}·s_j(i)).
- Columns that multiply the same regressor values within a fit (e.g. x0
  vs x0·u_a when u_a is constant over the arm's segments) are only
  identified through their sum, which the gradient naturally takes.
"""

from __future__ import annotations

import numpy as np


def recovered_arm_rates(coefs: np.ndarray, feature_names,
                        input_values: dict) -> np.ndarray:
    """Per-patient recovered decay constants -(∂x_dot/∂x0), [B, A].

    `coefs` is the [B, A, F] fine-tuned coefficient tensor
    (`SINDyRegressor.get_fine_tuned_coefficients`); `feature_names` the
    library's column naming (`PolynomialLibrary.feature_names`);
    `input_values` maps each non-x0 input name (e.g. 'u0') to its
    patient-constant [B] values — the *unscaled* statics, matching the
    design matrix. Assumes x_dot is linear in x0 (the main degree-2
    interaction-only library); features with x0 powers ≥ 2 are rejected.
    """
    coefs = np.asarray(coefs)
    B, A, F = coefs.shape
    rates = np.zeros((B, A), coefs.dtype)
    for i, name in enumerate(feature_names):
        parts = name.split()
        n_x0 = parts.count('x0')
        if n_x0 == 0:
            continue
        if n_x0 > 1:
            raise ValueError(
                f'feature {name!r} is nonlinear in x0; the decay-constant '
                'read-off applies to the degree-2 interaction-only library')
        val = np.ones(B, coefs.dtype)
        for p in parts:
            if p != 'x0':
                val = val * np.asarray(input_values[p])
        rates -= coefs[:, :, i] * val[:, None]
    return rates


def recover_parametric_dist(model, dataset, raw: bool = False) -> dict:
    """Correlate recovered vs true per-arm decay constants on `dataset`.

    `model` is a fitted INSITE `SINDyRegressor`; `dataset` a factual
    EQ_4-family `SeqDataset` whose `sim_params` carry the generator's
    hidden per-patient constants ('hidden_C_0', 'hidden_C_1'). Patients
    are attributed to the arm they spend active time under (EQ_4 arms are
    fixed per patient; fine-tuning leaves unvisited arms at the global
    coefficients).

    Returns {'arm<a>': {'n', 'true_mean', 'true_std', 'recovered_mean',
    'recovered_std', 'pearson_r'}}; with `raw=True` each arm also carries
    the per-patient 'true'/'recovered' lists (the
    `harness/plots.py::plot_recovered_dist` input).
    """
    params = getattr(dataset, 'sim_params', None)
    if params is None or 'hidden_C_0' not in params:
        raise ValueError(
            'dataset has no hidden decay constants to recover '
            '(EQ_4-family factual subsets carry sim_params)')
    coefs = model.get_fine_tuned_coefficients(dataset)
    B, A, _ = coefs.shape
    _, statics, _, _ = model._unscaled_arrays(dataset)
    statics = np.asarray(statics)[:B]
    names = model._input_names()
    input_values = {n: statics[:, j] for j, n in enumerate(names[1:])}
    rates = recovered_arm_rates(
        coefs, model.library.feature_names(names), input_values)

    treatments = np.asarray(dataset.data['current_treatments'])[:B]
    active = np.asarray(dataset.data['active_entries'])[:B]
    time_in_arm = (treatments * active).sum(1)          # [B, A]

    out = {}
    for a in range(A):
        true = np.asarray(params[f'hidden_C_{a}'])[:B]
        mask = time_in_arm[:, a] > 0
        t, r = true[mask], rates[mask, a]
        corr = float(np.corrcoef(t, r)[0, 1]) if mask.sum() > 1 else np.nan
        out[f'arm{a}'] = {
            'n': int(mask.sum()),
            'true_mean': float(t.mean()), 'true_std': float(t.std()),
            'recovered_mean': float(r.mean()),
            'recovered_std': float(r.std()),
            'pearson_r': corr,
        }
        if raw:
            out[f'arm{a}']['true'] = t.tolist()
            out[f'arm{a}']['recovered'] = r.tolist()
    return out
