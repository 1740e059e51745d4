from strainscan_tpu.index.hashtable import KmerTable  # noqa: F401
