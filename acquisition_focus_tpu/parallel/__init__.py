from acquisition_focus_tpu.parallel.mesh import (
    batch_shardings,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
