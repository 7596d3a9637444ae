from insite_tpu.parallel.mesh import (batch_mesh, pad_rows, row_mask,
                                      shard_rows, unpad_rows)
