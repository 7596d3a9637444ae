"""EQ_4 simulator tests: oracle re-integration (the reference's
check_factual_data_with_oracle, pkpd_simulation.py:740-776), shape/layout
golden checks of the counterfactual row explosion, and determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insite_tpu.core import MAX_TIME_HORIZON, euler_rollout
from insite_tpu.sim import pkpd
from insite_tpu.sim.pkpd import Equation


def make(equation=Equation.EQ_4_A, n=64, seed=0):
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    params = pkpd.generate_params(n, conf_coeff=2.0, window_size=15, lag=0,
                                  key=sub, equation=equation)
    return key, params


def test_factual_oracle_reintegration():
    key, params = make()
    key, sub = jax.random.split(key)
    data = pkpd.simulate_factual(params, 60, sub, Equation.EQ_4_A)
    vol = jnp.asarray(data['cancer_volume'])
    treat = jnp.asarray(data['treatment_application'])
    lengths = np.asarray(data['sequence_lengths']).astype(int)

    # Re-integrate every patient with the true vector field and the generic
    # (scan-based) Euler integrator; factual closed form must match.
    # Note params were shuffled identically for data and params dict.
    ts = jnp.arange(0, 60) * (MAX_TIME_HORIZON / 60)
    arm = treat[:, 0].astype(jnp.int32)
    c = jnp.where(arm == 0, params['hidden_C_0'], params['hidden_C_1'])
    recreated = euler_rollout(lambda y, t: -c * y, vol[:, 0], ts).T
    for i in range(vol.shape[0]):
        L = max(lengths[i] - 1, 1)
        np.testing.assert_allclose(np.asarray(vol[i, :L]),
                                   np.asarray(recreated[i, :L]), rtol=1e-10)


def test_factual_truncation_semantics():
    key, params = make(n=256, seed=3)
    key, sub = jax.random.split(key)
    data = pkpd.simulate_factual(params, 60, sub, Equation.EQ_4_A)
    vol = data['cancer_volume']
    lengths = data['sequence_lengths'].astype(int)
    assert vol.shape == (256, 60)
    assert data['treatment_application'].shape == (256, 60)
    # last treatment column is the padding zero (pkpd_simulation.py:296)
    assert np.all(data['treatment_application'][:, -1] == 0)
    assert np.all(lengths >= 1) and np.all(lengths <= 59)
    # recovered patients end at zero; untruncated trajectories never hit 0
    for i in range(256):
        if lengths[i] < 59:
            tail = vol[i, lengths[i] - 1:]
            assert np.all(tail == 0) or np.all(tail == 50.0)


def test_cf_one_step_row_layout():
    key, params = make(n=8, seed=1)
    key, sub = jax.random.split(key)
    data = pkpd.simulate_counterfactual_1_step(params, 60, sub,
                                               Equation.EQ_4_A)
    n_rows = 8 * 59 * 2
    assert data['cancer_volume'].shape == (n_rows, 60)
    assert data['treatment_application'].shape == (n_rows, 60)
    assert data['sequence_lengths'].shape == (n_rows,)
    assert data['observed_static_c_0'].shape == (n_rows,)

    vol = data['cancer_volume']
    treat = data['treatment_application']
    sl = data['sequence_lengths'].astype(int)
    # rows interleave factual/counterfactual with equal sequence lengths
    assert np.all(sl[0::2] == sl[1::2])
    # pair (factual, cf) shares its prefix and differs in the last action
    for r in range(0, 40, 2):
        t = sl[r]
        np.testing.assert_allclose(vol[r, :t], vol[r + 1, :t], rtol=1e-12)
        assert treat[r, t - 1] == 1 - treat[r + 1, t - 1]
        if t > 1:
            np.testing.assert_allclose(treat[r, :t - 1], treat[r + 1, :t - 1])
        # the cf outcome is one flipped-arm Euler interval from vol[t-1]
        arm = int(treat[r + 1, t - 1])
        c = float(np.where(arm == 0, params['hidden_C_0'][r // 118],
                           params['hidden_C_1'][r // 118]))
        h = (MAX_TIME_HORIZON / 60) / 5
        np.testing.assert_allclose(vol[r + 1, t], vol[r + 1, t - 1] *
                                   (1 - c * h) ** 5, rtol=1e-10)


def test_cf_treatment_seq_layout():
    key, params = make(n=4, seed=2)
    key, sub = jax.random.split(key)
    data = pkpd.simulate_counterfactuals_treatment_seq(
        params, 60, 5, sub, Equation.EQ_4_A, cf_seq_mode='sliding_treatment')
    n_rows = 4 * 59 * 10
    assert data['cancer_volume'].shape == (n_rows, 65)
    assert data['treatment_application'].shape == (n_rows, 65)
    sl = data['sequence_lengths'].astype(int)
    assert sl.min() == 6 and sl.max() == 64

    # first ten rows of patient 0 share the factual prefix (t=0) and apply the
    # sliding one-hot / complement-one-hot plans
    treat = data['treatment_application']
    eye = np.eye(5, dtype=float)
    plans = np.concatenate([eye, 1 - eye], axis=0)
    for p in range(10):
        np.testing.assert_allclose(treat[p, 1:6], plans[p])


@pytest.mark.parametrize('equation', [Equation.EQ_4_B, Equation.EQ_4_D])
def test_observation_noise_applied(equation):
    key, params = make(equation=equation, n=64, seed=4)
    key, sub = jax.random.split(key)
    noisy = pkpd.simulate_factual(params, 60, sub, equation)
    clean = pkpd.simulate_factual(params, 60, sub, Equation.EQ_4_A)
    diff = noisy['cancer_volume'] - clean['cancer_volume']
    assert 0.001 < np.std(diff) < 0.1   # ~ N(0, 0.01)


def test_determinism():
    for fn in [lambda p, k: pkpd.simulate_factual(p, 60, k, Equation.EQ_4_A),
               lambda p, k: pkpd.simulate_counterfactual_1_step(
                   p, 60, k, Equation.EQ_4_A)]:
        key, params = make(n=16, seed=7)
        key, sub = jax.random.split(key)
        a = fn(params, sub)
        b = fn(params, sub)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
