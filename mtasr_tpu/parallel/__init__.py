from mtasr_tpu.parallel.mesh import (
    make_mesh, partition_spec_for_tree, shard_params, batch_sharding,
    DEFAULT_RULES,
)
