from insite_tpu.parallel.mesh import (batch_mesh, pad_rows, shard_rows,
                                      unpad_rows)
