from insite_tpu.eval.metrics import (
    normalised_masked_rmse,
    normalised_n_step_rmses,
)
