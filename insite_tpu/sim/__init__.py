from insite_tpu.sim.pkpd import (
    Equation,
    generate_params,
    simulate_factual,
    simulate_counterfactual_1_step,
    simulate_counterfactuals_treatment_seq,
    get_scaling_params,
)
