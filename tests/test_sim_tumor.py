"""Cancer PKPD + continuous (EQ_5) simulator tests.

Oracle strategy (SURVEY.md §4): drive the jitted scan core with hand-chosen
random variates and compare against a plain NumPy re-implementation of the
reference update rule (cancer_simulation.py:300-302), plus structural
invariants on the public generators (dosage decay law, truncation masking,
confounding direction).
"""

import numpy as np
import pytest

from insite_tpu.sim import cancer
from insite_tpu.sim.tumor import (CHEMO_AMT, DRUG_DECAY, RADIO_AMT,
                                  TUMOUR_DEATH_THRESHOLD, calc_diameter,
                                  calc_volume, factual_core)

SEQ = 20


def _params(n, chemo_coeff=2.0, radio_coeff=2.0, seed=0):
    np.random.seed(seed)
    return cancer.generate_params(n, chemo_coeff, radio_coeff,
                                  window_size=15, lag=0)


def test_factual_core_matches_numpy_oracle():
    """Noise-free, treatment-free scan == the analytic growth recursion."""
    import jax.numpy as jnp
    p = _params(8)
    dev = cancer._device_params(p, jnp.float64)
    rvs = {
        'noise': jnp.zeros((8, SEQ)),
        'recovery': jnp.ones((8, SEQ)),      # never recover (rv >= prob)
        'chemo_rv': jnp.full((8, SEQ), 2.0),  # never treat (prob <= 1 < 2)
        'radio_rv': jnp.full((8, SEQ), 2.0),
    }
    out = factual_core(dev, rvs, SEQ, 15, 0)
    vols = np.asarray(out['cancer_volume'])

    # numpy oracle: V[t] = V[t-1] * (1 + rho log(K / V[t-1])), capped at
    # death threshold then held (cancer_simulation.py:300-349)
    v = p['initial_volumes'].copy()
    alive = np.ones(8, bool)
    for t in range(1, SEQ - 1):
        v_next = v * (1.0 + p['rho'] * np.log(p['K'] / np.maximum(v, 1e-30)))
        died = v_next > TUMOUR_DEATH_THRESHOLD
        v_next = np.where(died, TUMOUR_DEATH_THRESHOLD, v_next)
        v_next = np.where(alive, v_next, 0.0)
        np.testing.assert_allclose(vols[:, t], v_next, rtol=1e-10)
        v = v_next
        alive &= ~died
    assert np.all(vols[:, -1] == 0)          # trailing pad column


def test_factual_truncation_and_flags():
    np.random.seed(0)
    p = _params(64, seed=1)
    sim = cancer.simulate_factual(p, SEQ)
    vols = sim['cancer_volume']
    lengths = sim['sequence_lengths'].astype(int)
    assert np.all(lengths >= 2) and np.all(lengths <= SEQ - 1)
    # beyond the sequence length everything is zeroed (masked fixed-length
    # scan replicating the reference's python `break`)
    for i in range(64):
        assert np.all(vols[i, lengths[i]:] == 0.0)
    # a death flag implies the last recorded volume hit the threshold
    death_t = sim['death_flags'].argmax(axis=1)
    for i in np.where(sim['death_flags'].any(axis=1))[0]:
        np.testing.assert_allclose(vols[i, death_t[i]],
                                   TUMOUR_DEATH_THRESHOLD, rtol=1e-6)


def test_chemo_dosage_decay_law():
    """C[t] = C[t-1]*2^{-1} + {0, 5}: the 1-day half-life concentration
    recursion (cancer_simulation.py:336-339)."""
    np.random.seed(0)
    p = _params(32, chemo_coeff=10.0, seed=2)
    sim = cancer.simulate_factual(p, SEQ)
    dose = sim['cancer_volume'] * 0 + sim['chemo_dosage']
    app = sim['chemo_application']
    lengths = sim['sequence_lengths'].astype(int)
    for i in range(32):
        for t in range(1, lengths[i]):
            expect = dose[i, t - 1] * DRUG_DECAY + CHEMO_AMT * app[i, t]
            np.testing.assert_allclose(dose[i, t], expect, rtol=1e-8)
    radio = sim['radio_dosage'][sim['radio_dosage'] != 0]
    assert np.all(radio == RADIO_AMT)


def test_confounding_direction():
    """Higher chemo_coeff concentrates treatment on large tumours."""
    def treat_rate_by_size(coeff):
        np.random.seed(3)
        p = _params(500, chemo_coeff=coeff, radio_coeff=coeff, seed=3)
        sim = cancer.simulate_factual(p, SEQ)
        lengths = sim['sequence_lengths'].astype(int)
        mask = np.arange(SEQ)[None, :] < lengths[:, None]
        diam = calc_diameter(sim['cancer_volume'])
        big = diam > calc_diameter(TUMOUR_DEATH_THRESHOLD) / 2
        app = sim['chemo_application'] > 0
        return (app[mask & big].mean() - app[mask & ~big].mean())

    assert treat_rate_by_size(10.0) > treat_rate_by_size(0.0) + 0.05


def test_cf_one_step_rows_layout():
    np.random.seed(0)
    p = _params(6, seed=4)
    out = cancer.simulate_counterfactual_1_step(p, SEQ)
    n_rows = out['cancer_volume'].shape[0]
    assert out['chemo_application'].shape == (n_rows, SEQ)
    assert out['sequence_lengths'].max() <= SEQ
    # the 4 counterfactual rows per (patient, t) share the factual prefix
    assert n_rows % 4 == 0
    v = out['cancer_volume']
    L = out['sequence_lengths'].astype(int)
    for base in range(0, min(n_rows, 32), 4):
        ls = L[base:base + 4]
        assert len(set(ls)) == 1
        prefix = ls[0] - 1
        for j in range(1, 4):
            np.testing.assert_allclose(v[base, :prefix],
                                       v[base + j, :prefix], rtol=1e-8)


def test_cf_seq_rows_layout():
    np.random.seed(0)
    ph = 3
    p = _params(5, seed=5)
    out = cancer.simulate_counterfactuals_treatment_seq(
        p, SEQ, projection_horizon=ph)
    n_rows = out['cancer_volume'].shape[0]
    assert n_rows > 0
    assert out['patient_ids_all_trajectories'].shape == (n_rows,)
    assert np.all(out['sequence_lengths'] >= 1 + ph)
    # sliding plans: exactly one application per projected step
    tail_chemo = np.stack([
        out['chemo_application'][i, l - ph:l]
        for i, l in enumerate(out['sequence_lengths'].astype(int))])
    tail_radio = np.stack([
        out['radio_application'][i, l - ph:l]
        for i, l in enumerate(out['sequence_lengths'].astype(int))])
    assert np.all((tail_chemo + tail_radio).sum(axis=1) == 1)


def test_continuous_variants():
    from insite_tpu.sim import continuous
    from insite_tpu.sim.pkpd import Equation
    np.random.seed(0)
    pA = continuous.generate_params(50, 2.0, 2.0, window_size=15, lag=0,
                                    equation=Equation.EQ_5_A)
    assert set(np.unique(pA['patient_types'])) == {1}
    np.random.seed(0)
    pC = continuous.generate_params(50, 2.0, 2.0, window_size=15, lag=0,
                                    equation=Equation.EQ_5_C)
    assert set(np.unique(pC['patient_types'])) <= {1, 2, 3}
    # C: beta_c deterministic per type; D adds truncnorm noise
    np.random.seed(0)
    pD = continuous.generate_params(50, 2.0, 2.0, window_size=15, lag=0,
                                    equation=Equation.EQ_5_D)
    assert len(np.unique(pC['beta_c'])) <= 3
    assert len(np.unique(pD['beta_c'])) > 3


def test_factual_determinism():
    np.random.seed(7)
    p = _params(16, seed=7)
    np.random.seed(11)
    a = cancer.simulate_factual(p, SEQ)
    np.random.seed(11)
    b = cancer.simulate_factual(p, SEQ)
    np.testing.assert_array_equal(a['cancer_volume'], b['cancer_volume'])
    np.testing.assert_array_equal(a['sequence_lengths'],
                                  b['sequence_lengths'])


def test_cf_seq_rows_drops_log_domain_violations():
    """The reference drops any cf row whose trajectory NaNs
    (cancer_simulation.py:745-746): with its log(K/(V+1e-7)+1e-7) guard, a
    volume <= -1e-7 at a non-final plan step NaNs the next update.  Our
    update keeps negative volumes finite, so the drop is explicit: an
    extreme-alpha patient whose radio step sends the volume negative must
    be masked out of `valid`, while normal patients stay."""
    import jax.numpy as jnp
    from insite_tpu.sim.tumor import cf_factual_core, cf_seq_rows

    T, ph, n = 12, 3, 2
    f = jnp.float64
    params = {
        'initial_volumes': jnp.asarray([300.0, 300.0], f),
        # patient 0 normal, patient 1 extreme (alpha*d + beta*d^2 >> 1)
        'alpha': jnp.asarray([0.03, 2.0], f),
        'beta': jnp.asarray([0.003, 0.2], f),
        'beta_c': jnp.asarray([0.028, 0.028], f),
        'rho': jnp.asarray([7e-3, 7e-3], f),
        'K': jnp.full((n,), calc_volume(30.0), f),
        'chemo_sigmoid_intercepts': jnp.full((n,), 6.5, f),
        'radio_sigmoid_intercepts': jnp.full((n,), 6.5, f),
        'chemo_sigmoid_betas': jnp.full((n,), 0.1, f),
        'radio_sigmoid_betas': jnp.full((n,), 0.1, f),
    }
    rvs = {'noise': jnp.zeros((n, T + ph), f),
           'recovery': jnp.ones((n, T), f),
           'chemo_rv': jnp.full((n, T), 2.0, f),   # no factual treatment
           'radio_rv': jnp.full((n, T), 2.0, f)}
    fact = cf_factual_core(params, rvs, T, 15, 0)
    # one plan: radio at the first projected step, then nothing
    plans = jnp.zeros((n, T - 1, 1, ph, 2), f).at[:, :, :, 0, 1].set(1.0)
    vol_rows, _, _, _, _, valid = cf_seq_rows(params, fact, plans,
                                              rvs['noise'], T, ph)
    valid = np.asarray(valid)
    vols = np.asarray(vol_rows)
    assert valid[0].any()                      # normal patient rows kept
    assert not valid[1].any()                  # exploding rows all dropped
    # and the dropped rows are exactly the ones with a mid-plan negative
    assert (vols[1, 0, 0] < -1e-7).any()
