from scenedino_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch  # noqa: F401
