from pose_splatter_tpu.parallel.mesh import make_mesh  # noqa: F401
from pose_splatter_tpu.parallel.multihost import (  # noqa: F401
    assemble_global_batch,
    global_mesh,
    initialize_distributed,
    measure_steps_per_s,
    process_local_indices,
    scaling_report,
)
from pose_splatter_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
