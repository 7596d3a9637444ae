from insite_tpu.core.constants import (
    MAX_VALUE,
    MAX_TIME_HORIZON,
    MAX_SEQUENCE_LENGTH,
    STANDARD_DT,
    STEPS_FOR_DT,
    HMAX,
    SMOOTHER_WINDOW,
    SMOOTHER_POLYORDER,
)
from insite_tpu.core.integrate import euler_odeint, euler_step, euler_rollout
from insite_tpu.core.masking import length_mask, prefix_mask
