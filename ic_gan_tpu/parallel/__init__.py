from ic_gan_tpu.parallel import mesh, stats
from ic_gan_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch

__all__ = ["mesh", "stats", "batch_sharding", "make_mesh", "shard_batch"]
