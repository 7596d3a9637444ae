"""Cancer PKPD ("cancer_sim") benchmark simulator: parameter sampling +
public factual / counterfactual generators, built on the batched tumor core.

Parameter generation replicates the reference's np.random/scipy draw order
exactly (cancer_simulation.py:96-215) so CPU runs with a given seed
reproduce the reference cohort; the trajectory random draws match the
reference's array-at-once layout for the factual generator
(cancer_simulation.py:275-279) and its per-patient interleave for the
counterfactual generators (:440-453, :640-653).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import truncnorm

from insite_tpu.core.dtypes import default_float
from insite_tpu.sim.tumor import (TUMOUR_DEATH_THRESHOLD, calc_diameter,
                                  calc_volume, cf_factual_core,
                                  cf_one_step_rows, cf_seq_rows,
                                  factual_core)

TUMOUR_SIZE_DISTRIBUTIONS = {'I': (1.72, 4.70, 0.3, 5.0),
                             'II': (1.96, 1.63, 0.3, 13.0),
                             'IIIA': (1.91, 9.40, 0.3, 13.0),
                             'IIIB': (2.76, 6.87, 0.3, 13.0),
                             'IV': (3.86, 8.82, 0.3, 13.0)}
CANCER_STAGE_OBSERVATIONS = {'I': 1432, 'II': 128, 'IIIA': 1306,
                             'IIIB': 7248, 'IV': 12840}


def get_standard_params(num_patients: int, patient_type_choices=(1, 2, 3),
                        beta_c_noise: bool = True) -> dict:
    """np.random draw-order replica of cancer_simulation.py:96-215.
    ``patient_type_choices``/``beta_c_noise`` parameterise the EQ_5
    heterogeneity variants (continuous.py:176-199)."""
    total = sum(CANCER_STAGE_OBSERVATIONS.values())
    stages = sorted(TUMOUR_SIZE_DISTRIBUTIONS)
    probs = [CANCER_STAGE_OBSERVATIONS[s] / total for s in stages]
    initial_stages = np.random.choice(stages, num_patients, p=probs)

    output_initial_diam, patient_sim_stages = [], []
    for stg in stages:
        count = int(np.sum(initial_stages == stg))
        mu, sigma, lo, hi = TUMOUR_SIZE_DISTRIBUTIONS[stg]
        lb = (np.log(lo) - mu) / sigma
        ub = (np.log(hi) - mu) / sigma
        norm_rvs = truncnorm.rvs(lb, ub, size=count)
        output_initial_diam += list(np.exp(norm_rvs * sigma + mu))
        patient_sim_stages += [stg] * count

    K = calc_volume(30)
    alpha_beta_ratio = 10
    alpha_rho_corr = 0.87
    rho_params = (7e-5, 7.23e-3)
    alpha_params = (0.0398, 0.168)
    beta_c_params = (0.028, 0.0007)
    cov = np.array([[alpha_params[1] ** 2,
                     alpha_rho_corr * alpha_params[1] * rho_params[1]],
                    [alpha_rho_corr * alpha_params[1] * rho_params[1],
                     rho_params[1] ** 2]])
    mean = np.array([alpha_params[0], rho_params[0]])

    simulated = []
    while len(simulated) < num_patients:
        holder = np.random.multivariate_normal(mean, cov, size=num_patients)
        for row in holder:
            if row[0] > 0.0 and row[1] > 0.0:
                simulated.append(row)

    patient_types = np.random.choice(list(patient_type_choices),
                                     num_patients)
    chemo_adj = np.array([0.0 if i < 3 else 0.1 for i in patient_types])
    radio_adj = np.array([0.0 if i > 1 else 0.1 for i in patient_types])

    simulated = np.array(simulated)[:num_patients]
    alpha = simulated[:, 0] + alpha_params[0] * radio_adj
    rho = simulated[:, 1]
    beta = alpha / alpha_beta_ratio

    beta_c_adj = beta_c_params[0] * chemo_adj
    if beta_c_noise:
        beta_c = beta_c_params[0] + beta_c_params[1] * truncnorm.rvs(
            (0.0 - beta_c_params[0]) / beta_c_params[1], np.inf,
            size=num_patients) + beta_c_adj
    else:
        beta_c = beta_c_params[0] + beta_c_adj

    holder = {'patient_types': patient_types,
              'initial_stages': np.array(patient_sim_stages),
              'initial_volumes': calc_volume(np.array(output_initial_diam)),
              'alpha': alpha, 'rho': rho, 'beta': beta, 'beta_c': beta_c,
              'K': np.full(num_patients, K)}
    idx = list(range(num_patients))
    np.random.shuffle(idx)
    return {k: v[idx] for k, v in holder.items()}


def generate_params(num_patients: int, chemo_coeff: float,
                    radio_coeff: float, window_size: int, lag: int,
                    key=None, patient_type_choices=(1, 2, 3),
                    beta_c_noise: bool = True) -> dict:
    """cancer_simulation.py:66-93 (key unused — the reference simulator is
    np.random-driven; kept for a uniform collection API)."""
    params = get_standard_params(num_patients, patient_type_choices,
                                 beta_c_noise)
    d_max = calc_diameter(TUMOUR_DEATH_THRESHOLD)
    n = num_patients
    params['chemo_sigmoid_intercepts'] = np.full(n, d_max / 2.0)
    params['radio_sigmoid_intercepts'] = np.full(n, d_max / 2.0)
    params['chemo_sigmoid_betas'] = np.full(n, chemo_coeff / d_max)
    params['radio_sigmoid_betas'] = np.full(n, radio_coeff / d_max)
    params['window_size'] = window_size
    params['lag'] = lag
    return params


def _device_params(params, dtype):
    keys = ('initial_volumes', 'alpha', 'rho', 'beta', 'beta_c', 'K',
            'chemo_sigmoid_intercepts', 'radio_sigmoid_intercepts',
            'chemo_sigmoid_betas', 'radio_sigmoid_betas')
    return {k: jnp.asarray(params[k], dtype) for k in keys}


def _factual_rvs(num_patients, seq_length, dtype):
    """Array-at-once draw order (cancer_simulation.py:275-279)."""
    return {
        'noise': jnp.asarray(
            0.01 * np.random.randn(num_patients, seq_length), dtype),
        'recovery': jnp.asarray(
            np.random.rand(num_patients, seq_length), dtype),
        'chemo_rv': jnp.asarray(
            np.random.rand(num_patients, seq_length), dtype),
        'radio_rv': jnp.asarray(
            np.random.rand(num_patients, seq_length), dtype),
    }


def _cf_rvs(num_patients, seq_length, noise_len, dtype):
    """Per-patient interleaved draw order (cancer_simulation.py:440-453)."""
    noise = np.empty((num_patients, noise_len))
    recovery = np.empty((num_patients, seq_length))
    chemo = np.empty((num_patients, seq_length))
    radio = np.empty((num_patients, seq_length))
    for i in range(num_patients):
        noise[i] = 0.01 * np.random.randn(noise_len)
        recovery[i] = np.random.rand(seq_length)
        chemo[i] = np.random.rand(seq_length)
        radio[i] = np.random.rand(seq_length)
    return {'noise': jnp.asarray(noise, dtype),
            'recovery': jnp.asarray(recovery, dtype),
            'chemo_rv': jnp.asarray(chemo, dtype),
            'radio_rv': jnp.asarray(radio, dtype)}


def simulate_factual(simulation_params, seq_length: int, key=None,
                     dtype=None, extra_noise=False) -> dict:
    dtype = dtype or default_float()
    params = _device_params(simulation_params, dtype)
    n = params['initial_volumes'].shape[0]
    rvs = _factual_rvs(n, seq_length, dtype)
    out = factual_core(params, rvs, seq_length,
                       int(simulation_params['window_size']),
                       int(simulation_params['lag']))
    out = jax.device_get(out)   # one batched async fetch (link stalls on
    out = dict(out)             # serial per-array pulls)
    out['patient_types'] = np.asarray(simulation_params['patient_types'])
    if extra_noise:   # EQ_5 B/C/D observation noise (continuous.py:365-367)
        out['cancer_volume'] = out['cancer_volume'] + \
            0.01 * np.random.normal(size=out['cancer_volume'].shape)
    assert not np.any(np.isnan(out['cancer_volume']))
    return out


def simulate_counterfactual_1_step(simulation_params, seq_length: int,
                                   key=None, dtype=None,
                                   extra_noise=False,
                                   emit_dosage=False) -> dict:
    dtype = dtype or default_float()
    params = _device_params(simulation_params, dtype)
    n = params['initial_volumes'].shape[0]
    rvs = _cf_rvs(n, seq_length, seq_length, dtype)
    fact = cf_factual_core(params, rvs, seq_length,
                           int(simulation_params['window_size']),
                           int(simulation_params['lag']))
    (vol_rows, chemo_rows, radio_rows, seq_lengths,
     valid) = jax.device_get(cf_one_step_rows(
        params, fact, rvs['noise'], seq_length))

    valid = valid.reshape(-1)
    T = seq_length

    def flat(x):
        return np.asarray(x).reshape(-1, x.shape[-1])[valid]

    rows_pp = (seq_length - 1) * 4
    ptypes = np.repeat(np.asarray(simulation_params['patient_types']),
                       rows_pp)[valid]
    out = {'cancer_volume': flat(vol_rows),
           'chemo_application': flat(chemo_rows),
           'radio_application': flat(radio_rows),
           'sequence_lengths': np.asarray(seq_lengths).reshape(-1)[valid],
           'patient_types': ptypes}
    if emit_dosage:
        # continuous.py:571-577 also ships the factual chemo dosage rows;
        # the counterfactual last-step dosage replaces the final entry
        dose = np.asarray(fact['chemo_dosage'])
        prev = np.concatenate([np.zeros((n, 1)), dose[:, :-1]], axis=1)
        from insite_tpu.sim.tumor import CHEMO_AMT, DRUG_DECAY
        opt_c = np.array([0., 0., 1., 1.])
        t_grid = np.arange(T - 1)[:, None]
        j_grid = np.arange(T)[None, :]
        rows = np.where((j_grid < t_grid)[None, :, None, :],
                        np.pad(dose, ((0, 0), (0, 1)))[:, None, None, :],
                        0.0)
        cf_dose = prev[:, :, None] * DRUG_DECAY + CHEMO_AMT * opt_c
        rows = np.where((j_grid == t_grid)[None, :, None, :],
                        cf_dose[..., None], rows)
        out['chemo_dosage'] = rows.reshape(-1, T)[valid]
    if extra_noise:
        out['cancer_volume'] = out['cancer_volume'] + \
            0.01 * np.random.normal(size=out['cancer_volume'].shape)
    assert not np.any(np.isnan(out['cancer_volume']))
    return out


def simulate_counterfactuals_treatment_seq(simulation_params,
                                           seq_length: int,
                                           projection_horizon: int,
                                           key=None,
                                           cf_seq_mode='sliding_treatment',
                                           dtype=None, extra_noise=False,
                                           emit_dosage=False) -> dict:
    dtype = dtype or default_float()
    ph = projection_horizon
    params = _device_params(simulation_params, dtype)
    n = params['initial_volumes'].shape[0]
    rvs = _cf_rvs(n, seq_length, seq_length + ph, dtype)
    fact = cf_factual_core(params, rvs, seq_length,
                           int(simulation_params['window_size']),
                           int(simulation_params['lag']))

    if cf_seq_mode == 'sliding_treatment':
        eye = np.eye(ph, dtype=np.int64)
        zero = np.zeros((ph, ph), dtype=np.int64)
        chemo_arr = np.stack([eye, zero], axis=-1)
        radio_arr = np.stack([zero, eye], axis=-1)
        plans_np = np.concatenate([chemo_arr, radio_arr])   # [2ph, ph, 2]
        plans = np.broadcast_to(plans_np[None, None],
                                (n, seq_length - 1, 2 * ph, ph, 2))
    elif cf_seq_mode == 'random_trajectories':
        plans = np.random.randint(
            0, 2, (n, seq_length - 1, 2 * ph, ph, 2))
    else:
        raise NotImplementedError(cf_seq_mode)

    (vol_rows, chemo_rows, radio_rows, dose_rows, seq_lengths,
     valid) = jax.device_get(
        cf_seq_rows(params, fact, jnp.asarray(plans, dtype),
                    rvs['noise'], seq_length, ph))

    valid = valid.reshape(-1)
    rows_pp = (seq_length - 1) * 2 * ph
    patient_ids = np.repeat(np.arange(n), rows_pp)[valid]
    current_t = np.tile(np.repeat(np.arange(seq_length - 1), 2 * ph),
                        n)[valid]

    def flat(x):
        return np.asarray(x).reshape(-1, x.shape[-1])[valid]

    out = {'cancer_volume': flat(vol_rows),
           'chemo_application': flat(chemo_rows),
           'radio_application': flat(radio_rows),
           'sequence_lengths': np.asarray(seq_lengths).reshape(-1)[valid],
           'patient_types': np.asarray(
               simulation_params['patient_types'])[patient_ids],
           'patient_ids_all_trajectories': patient_ids.astype(np.float64),
           'patient_current_t': current_t.astype(np.float64)}
    if emit_dosage:
        out['chemo_dosage'] = flat(dose_rows)
    if extra_noise:
        out['cancer_volume'] = out['cancer_volume'] + \
            0.01 * np.random.normal(size=out['cancer_volume'].shape)
    assert not np.any(np.isnan(out['cancer_volume']))
    return out


def get_scaling_params(sim: dict):
    """Active-entry mean/std of volume + dosages + patient types
    (cancer_simulation.py:776-796), as dicts."""
    lengths = np.asarray(sim['sequence_lengths']).astype(np.int64)
    means, stds = {}, {}
    for k in ('cancer_volume', 'chemo_dosage', 'radio_dosage'):
        if k not in sim:
            continue
        arr = np.asarray(sim[k])
        mask = np.arange(arr.shape[1])[None, :] < lengths[:, None]
        active = arr[mask]
        means[k] = float(active.mean())
        stds[k] = float(active.std())
    means['patient_types'] = float(np.mean(sim['patient_types']))
    stds['patient_types'] = float(np.std(sim['patient_types']))
    return means, stds
