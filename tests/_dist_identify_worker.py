"""Subprocess worker for the 2-process FULL-identify e2e test.

Usage: python _dist_identify_worker.py <coordinator> <n_procs> <pid>
       <db_dir> <fq> <out_dir>

Brings up jax.distributed and runs the COMPLETE identify pipeline
(count -> CST search -> L2 vote -> reports).  Each host streams its
share of the read batches; the per-host count vectors merge over DCN
inside count_sample (both for the tree table and the per-sample L2
union), and all downstream host logic runs replicated — so every
process writes a full, identical report tree.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    coord, n, pid, db_dir, fq, out_dir = sys.argv[1:7]
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from strainscan_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=coord, num_processes=int(n),
                    process_id=int(pid))
    from strainscan_tpu.config import IdentifyConfig
    from strainscan_tpu.identify.pipeline import run_identify

    cfg = IdentifyConfig(read_batch=256, min_snv_num=10)
    res = run_identify(fq, "", db_dir, out_dir, cfg)
    assert res is not None, "no clusters detected in distributed run"


if __name__ == "__main__":
    main()
