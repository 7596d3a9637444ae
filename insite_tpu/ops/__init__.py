from insite_tpu.ops.pallas_rollout import (pallas_batched_rollout,
                                           pallas_rollout_with_sens)
