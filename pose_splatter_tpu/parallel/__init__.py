from pose_splatter_tpu.parallel.mesh import make_mesh  # noqa: F401
from pose_splatter_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
