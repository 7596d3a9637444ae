from insite_tpu.utils.profiling import (time_blocked, trace,
                                        wall_clock_logger)
