"""Subprocess worker for the 2-process jax.distributed CPU test.

Usage: python _dist_worker.py <coordinator> <n_procs> <pid> <data.npz>
       <fq> <out.npz>

Brings up jax.distributed, streams its share of the read batches
(count_sample round-robins batch indices across processes and merges the
per-host vectors over DCN), and writes the merged counts.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, n, pid, data_npz, fq, out_npz = sys.argv[1:7]
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from strainscan_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=coord, num_processes=int(n),
                    process_id=int(pid))
    from strainscan_tpu.config import IdentifyConfig
    from strainscan_tpu.identify.count import count_sample
    from strainscan_tpu.index.hashtable import KmerTable

    keys = np.load(data_npz)["keys"]
    table = KmerTable.build(keys, k=31)
    cfg = IdentifyConfig(read_batch=256)  # small batches: both hosts work
    counts = count_sample(table, fq, cfg)
    np.savez(out_npz, counts=counts,
             pidx=jax.process_index(), pcount=jax.process_count())


if __name__ == "__main__":
    main()
