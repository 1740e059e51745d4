"""2-process DCN count merge at the E. coli BASELINE scale
(round-3 VERDICT next-round item 6: the multi-host claim rested on a toy
30 kb table).

Spawns two ``jax.distributed`` CPU processes that each build the full
28.6M-key fingerprint table, stream their round-robin share of a read
file through the count pipeline, and merge the per-host 28.6M-entry
int32 vectors over DCN (``process_allgather`` — a ~114 MB payload per
direction); the parent asserts the merged counts equal a single-process
run bit-for-bit and records per-phase seconds.

Usage: python benchmarks/dist_merge_scale.py [--reads 100000]
Writes benchmarks/DIST_MERGE_r04.json.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "DIST_MERGE_r04.json")
GENOME_LEN = 14_300_000     # -> ~28.6M table keys (both strands)
READ_LEN = 150
K = 31

WORKER = r"""
import json, os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

coord, n, pid, keys_npy, fq, out_npz = sys.argv[1:7]
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
from strainscan_tpu.parallel import distributed as dist
dist.initialize(coordinator_address=coord, num_processes=int(n),
                process_id=int(pid))
from strainscan_tpu.config import IdentifyConfig
from strainscan_tpu.identify.count import count_sample
from strainscan_tpu.index.hashtable import KmerTable

t0 = time.time()
keys = np.load(keys_npy)
t_load = time.time() - t0
t0 = time.time()
table = KmerTable.build(keys, k=31)
t_table = time.time() - t0
# phase-split the merge: count_sample merges internally, so time the
# whole call, then re-merge the local vector once to isolate DCN seconds
t0 = time.time()
counts = count_sample(table, fq, IdentifyConfig())
t_count = time.time() - t0
t0 = time.time()
again = dist.merge_counts(np.asarray(counts // 2, np.int32))
t_merge = time.time() - t0
np.savez(out_npz, counts=counts,
         phases=np.array([t_load, t_table, t_count, t_merge]),
         pcount=jax.process_count())
"""


def log(m):
    print(f"[dist_merge] {m}", file=sys.stderr, flush=True)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    global GENOME_LEN
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--genome-len", type=int, default=GENOME_LEN)
    args = ap.parse_args()
    GENOME_LEN = args.genome_len
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from strainscan_tpu.config import IdentifyConfig
    from strainscan_tpu.identify.count import count_sample
    from strainscan_tpu.index.hashtable import KmerTable
    from strainscan_tpu.kmer import pack

    tmp = tempfile.mkdtemp(prefix="sst_distmerge_")
    rng = np.random.default_rng(0)
    log(f"synthesizing {GENOME_LEN/1e6:.1f} Mb genome + "
        f"{args.reads/1e3:.0f}k reads")
    genome_codes = rng.integers(0, 4, size=GENOME_LEN).astype(np.uint8)
    km, _ = pack.pack_kmers(genome_codes, K)
    keys = np.unique(np.concatenate([km, pack.revcomp_packed(km, K)]))
    keys_npy = os.path.join(tmp, "keys.npy")
    np.save(keys_npy, keys)
    starts = rng.integers(0, GENOME_LEN - READ_LEN, size=args.reads)
    idx = starts[:, None] + np.arange(READ_LEN)[None, :]
    reads = genome_codes[idx]
    flips = rng.random(args.reads) < 0.5
    reads[flips] = (3 - reads[flips])[:, ::-1]
    ascii_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    fq = os.path.join(tmp, "sample.fq")
    with open(fq, "wb") as f:
        qual = b"I" * READ_LEN
        seqs = ascii_map[reads]
        for i in range(args.reads):
            f.write(b"@r\n" + seqs[i].tobytes() + b"\n+\n" + qual + b"\n")
    log(f"{keys.size/1e6:.1f}M table keys")

    log("single-process oracle")
    t0 = time.time()
    table = KmerTable.build(keys, k=K)
    expected = count_sample(table, fq, IdentifyConfig())
    t_single = time.time() - t0
    log(f"oracle: {t_single:.1f}s, {int((expected > 0).sum())} keys hit")

    worker_py = os.path.join(tmp, "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER % {"repo": REPO})
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs, outs = [], []
    t0 = time.time()
    for pid in range(2):
        out = os.path.join(tmp, f"out{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker_py, coord, "2", str(pid), keys_npy,
             fq, out], env=env, stderr=subprocess.PIPE))
    errs = [p.communicate(timeout=3600)[1].decode(errors="replace")
            for p in procs]
    t_two = time.time() - t0
    for p, e in zip(procs, errs):
        if p.returncode != 0:
            log(f"WORKER FAILED:\n{e[-3000:]}")
            sys.exit(1)

    res = {"n_keys": int(keys.size), "n_reads": args.reads,
           "single_process_s": round(t_single, 1),
           "two_process_wall_s": round(t_two, 1),
           "merge_payload_MB": round(keys.size * 4 / 1e6, 1),
           "workers": []}
    ok = True
    for pid, out in enumerate(outs):
        z = np.load(out)
        match = bool(np.array_equal(z["counts"], expected))
        ok &= match
        ph = z["phases"]
        res["workers"].append({
            "pid": pid, "match": match, "pcount": int(z["pcount"]),
            "keys_load_s": round(float(ph[0]), 1),
            "table_build_s": round(float(ph[1]), 1),
            "count_and_merge_s": round(float(ph[2]), 1),
            "dcn_merge_only_s": round(float(ph[3]), 1),
        })
    res["bit_exact"] = ok
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")
    print(json.dumps(res))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
