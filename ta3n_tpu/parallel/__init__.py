from ta3n_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    make_mesh_2d, pad_to_multiple,
                                    replicated_sharding, shard_train_step)

__all__ = ["make_mesh", "make_mesh_2d", "batch_sharding",
           "replicated_sharding", "pad_to_multiple", "shard_train_step"]
