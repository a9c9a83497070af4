from mobilenet_yolo_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    initialize_distributed,
    mesh_from_spec,
    global_batch,
    multihost_env_detected,
    replicated,
    shard_batch,
    warmup_collectives,
)
from mobilenet_yolo_tpu.parallel.sharding import (  # noqa: F401
    replicate,
    shard_over_model_axis,
)
