from strainscan_tpu.parallel.sharded import (  # noqa: F401
    ShardedCountPipeline,
    ShardedTable,
    l2_mesh,
    make_mesh,
    sharded_colsum_fn,
    sharded_colsum_unused_fn,
    sharded_count,
    sharded_fold_grams_fn,
    sharded_l2_stats,
    sharded_or_col_fn,
)
