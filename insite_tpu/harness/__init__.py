from insite_tpu.harness.runner import (Experiment, run_experiment, sweep,
                                       METHODS)
from insite_tpu.harness.results import (ci, df_from_log,
                                        generate_main_results_table)
