from yolo_dual_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    cross_replica_mean,
    init_distributed,
    sync_hosts,
)
