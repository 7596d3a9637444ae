""""Continuous" EQ_5 A-D benchmark family: the tumor model re-parameterised
into four heterogeneity variants (reference:
libs_m/ct/src/data/continuous/continuous.py).

Differences from cancer_sim (continuous.py:176-199, 365-367):
- A/B: a single patient type (no heterogeneity); C/D: three types
- D alone keeps the truncated-normal beta_c noise
- B/C/D add observation noise to every emitted cancer volume
- counterfactual sets also ship the chemo dosage rows (continuous.py:571-577)
  so SINDy-family methods can use the dosage as a continuous covariate
"""

from __future__ import annotations

from insite_tpu.sim import cancer
from insite_tpu.sim.cancer import get_scaling_params  # noqa: F401  (re-export)
from insite_tpu.sim.pkpd import Equation


def _variant(equation: Equation):
    name = equation.name
    types = (1,) if name in ('EQ_5_A', 'EQ_5_B') else (1, 2, 3)
    beta_c_noise = (name == 'EQ_5_D')
    obs_noise = name.split('_')[-1] in ('B', 'C', 'D')
    return types, beta_c_noise, obs_noise


def generate_params(num_patients: int, chemo_coeff: float,
                    radio_coeff: float, window_size: int, lag: int,
                    key=None, equation: Equation = Equation.EQ_5_A) -> dict:
    types, beta_c_noise, _ = _variant(equation)
    return cancer.generate_params(num_patients, chemo_coeff, radio_coeff,
                                  window_size, lag, key=key,
                                  patient_type_choices=types,
                                  beta_c_noise=beta_c_noise)


def simulate_factual(params, seq_length: int, key=None,
                     equation: Equation = Equation.EQ_5_A,
                     dtype=None) -> dict:
    _, _, obs_noise = _variant(equation)
    return cancer.simulate_factual(params, seq_length, key=key, dtype=dtype,
                                   extra_noise=obs_noise)


def simulate_counterfactual_1_step(params, seq_length: int, key=None,
                                   equation: Equation = Equation.EQ_5_A,
                                   dtype=None) -> dict:
    _, _, obs_noise = _variant(equation)
    return cancer.simulate_counterfactual_1_step(
        params, seq_length, key=key, dtype=dtype, extra_noise=obs_noise,
        emit_dosage=True)


def simulate_counterfactuals_treatment_seq(
        params, seq_length: int, projection_horizon: int, key=None,
        equation: Equation = Equation.EQ_5_A,
        cf_seq_mode='sliding_treatment', dtype=None) -> dict:
    _, _, obs_noise = _variant(equation)
    return cancer.simulate_counterfactuals_treatment_seq(
        params, seq_length, projection_horizon, key=key,
        cf_seq_mode=cf_seq_mode, dtype=dtype, extra_noise=obs_noise,
        emit_dosage=True)
