"""Multi-host execution: 2-process jax.distributed CPU mesh must produce
counts identical to a single-process run (SURVEY §4 multi-host tests;
round-1 VERDICT item 6 — the helpers existed but were wired into
nothing).  count_sample round-robins read batches across processes and
merges the per-host vectors with a DCN allgather."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from strainscan_tpu.config import IdentifyConfig
from strainscan_tpu.identify.count import count_sample
from strainscan_tpu.index.hashtable import KmerTable
from strainscan_tpu.kmer import pack

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_shard_paths_and_range():
    from strainscan_tpu.parallel import distributed as dist

    # single-process defaults
    assert dist.process_info()[1] >= 1
    assert dist.shard_paths(["a", "b", "c"]) == ["a", "b", "c"]
    assert dist.shard_range(10) == (0, 10)


def test_two_process_counts_match(tmp_path):
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, size=30_000).astype(np.uint8)
    km, _ = pack.pack_kmers(genome, 31)
    keys = np.unique(np.concatenate([km, pack.revcomp_packed(km, 31)]))
    np.savez(tmp_path / "data.npz", keys=keys)

    # reads from the genome (forward only is fine for a count test)
    ascii_map = np.frombuffer(b"ACGT", dtype=np.uint8)
    fq = tmp_path / "sample.fq"
    with open(fq, "w") as f:
        for i in range(2000):
            p = int(rng.integers(0, genome.size - 100))
            seq = ascii_map[genome[p : p + 100]].tobytes().decode()
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 100}\n")

    # oracle: single-process counts with the same batch size
    table = KmerTable.build(keys, k=31)
    expected = count_sample(table, str(fq), IdentifyConfig(read_batch=256))

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # children need no virtual-device mesh
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.npz"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_worker.py"),
             coord, "2", str(pid), str(tmp_path / "data.npz"), str(fq),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        errs.append(err.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), \
        f"worker failed:\n{errs[0][-2000:]}\n----\n{errs[1][-2000:]}"
    for pid, out in enumerate(outs):
        z = np.load(out)
        assert int(z["pcount"]) == 2
        assert np.array_equal(z["counts"], expected), \
            f"process {pid} merged counts differ"


def test_two_process_full_identify(tmp_path):
    """Round-4 VERDICT item 7: the FULL identify pipeline (count -> CST
    search -> L2 vote incl. the per-sample union count -> reports) under
    a 2-process jax.distributed run must write byte-identical reports to
    a single-process run.  The fixture forms a genuine 2-strain cluster
    so the Pre-Scan + Elastic-Net path (and its DCN-merged union counts)
    is exercised."""
    import glob

    from strainscan_tpu.build.pipeline import build_database
    from strainscan_tpu.config import BuildConfig
    from strainscan_tpu.identify.pipeline import run_identify

    rng = np.random.default_rng(9)
    bases = np.array(list("ACGT"))

    def rand_genome(n):
        return "".join(rng.choice(bases, size=n))

    def mutate(seq, n_snps):
        s = np.array(list(seq))
        for p in rng.choice(len(s), size=n_snps, replace=False):
            s[p] = rng.choice([b for b in bases if b != s[p]])
        return "".join(s)

    gdir = tmp_path / "genomes"
    gdir.mkdir()
    base = rand_genome(30_000)
    strains = {"A1": base, "A2": mutate(base, 15), "B1": rand_genome(30_000)}
    for name, seq in strains.items():
        with open(gdir / f"{name}.fa", "w") as f:
            f.write(f">{name}\n{seq}\n")
    db = str(tmp_path / "DB")
    build_database(str(gdir), db, BuildConfig())

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    fq = tmp_path / "mix.fq"
    with open(fq, "w") as f:
        i = 0
        for src in ("A1", "A2"):
            seq = strains[src]
            for _ in range(int(len(seq) * 6.0 / 100)):
                p = int(rng.integers(0, len(seq) - 100))
                r = seq[p : p + 100]
                if rng.random() < 0.5:
                    r = "".join(comp[c] for c in reversed(r))
                f.write(f"@r{i}\n{r}\n+\n{'I' * 100}\n")
                i += 1

    # single-process oracle with the same cfg
    out_single = str(tmp_path / "out_single")
    res = run_identify(str(fq), "", db, out_single,
                       IdentifyConfig(read_batch=256, min_snv_num=10))
    assert res is not None

    def report_files(out_dir):
        files = {}
        for path in sorted(glob.glob(os.path.join(out_dir, "**", "*"),
                                     recursive=True)):
            if os.path.isfile(path):
                with open(path, "rb") as f:
                    files[os.path.relpath(path, out_dir)] = f.read()
        return files

    expected = report_files(out_single)
    assert "final_report.txt" in expected
    assert any(k.endswith("StrainVote.report") for k in expected), \
        "fixture must exercise the L2 vote"

    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for pid in range(2):
        out = str(tmp_path / f"out_p{pid}")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_dist_identify_worker.py"),
             coord, "2", str(pid), db, str(fq), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        errs.append(err.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), \
        f"worker failed:\n{errs[0][-2500:]}\n----\n{errs[1][-2500:]}"
    for pid, out in enumerate(outs):
        got = report_files(out)
        assert got == expected, (
            f"process {pid} reports diverge on: "
            f"{[k for k in expected if expected.get(k) != got.get(k)]} "
            f"(extra: {[k for k in got if k not in expected]})")
