from insite_tpu.models.base import CausalEstimator
from insite_tpu.models.sindy import SINDyConfig, SINDyRegressor
