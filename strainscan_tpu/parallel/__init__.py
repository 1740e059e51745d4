from strainscan_tpu.parallel.sharded import (  # noqa: F401
    ShardedCountPipeline,
    ShardedTable,
    make_mesh,
    sharded_count,
    sharded_l2_stats,
)
