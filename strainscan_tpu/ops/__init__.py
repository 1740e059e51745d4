from strainscan_tpu.ops.count import CountPipeline  # noqa: F401
