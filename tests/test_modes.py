"""Mode coverage: -b probability report, memory-efficient DB, low-dep
ladders, custom clusters."""

import os

import numpy as np
import pytest

from strainscan_tpu.build.pipeline import build_database
from strainscan_tpu.config import BuildConfig, IdentifyConfig
from strainscan_tpu.identify.pipeline import run_identify

RNG = np.random.default_rng(31)
BASES = np.array(list("ACGT"))
GLEN = 60_000


def _rand_genome(n):
    return "".join(RNG.choice(BASES, size=n))


def _mutate(seq, n_snps):
    s = np.array(list(seq))
    for p in RNG.choice(len(s), size=n_snps, replace=False):
        s[p] = RNG.choice([b for b in BASES if b != s[p]])
    return "".join(s)


def _revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def _sim_reads(seq, depth, read_len=100):
    reads = []
    for _ in range(int(len(seq) * depth / read_len)):
        s = int(RNG.integers(0, len(seq) - read_len))
        r = seq[s : s + read_len]
        if RNG.random() < 0.5:
            r = _revcomp(r)
        reads.append(r)
    return reads


def _write_fq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("modes")
    gdir = d / "genomes"
    gdir.mkdir()
    base = _rand_genome(GLEN)
    strains = {
        "X1": base,
        "X2": _mutate(base, 40),
        "Y1": _rand_genome(GLEN),
    }
    for n, s in strains.items():
        with open(gdir / f"{n}.fa", "w") as f:
            f.write(f">{n}\n{s}\n")
    return str(d), str(gdir), strains


def test_subsample_cli(setup, tmp_path):
    """subsample subcommand end-to-end (reference
    StrainScan_subsample.py:46-96): cluster at 1-dist, copy one
    representative genome per cluster into Rep_ref.  X1/X2 (40 SNPs over
    60 kb, d ~ 0.02) merge at dist 0.95 (cutoff 0.05) and Y1 stays
    apart -> exactly 2 reps."""
    import subprocess
    import sys

    d, gdir, strains = setup
    out = str(tmp_path / "sub")
    r = subprocess.run(
        [sys.executable, "-m", "strainscan_tpu.cli", "subsample",
         "-i", gdir, "-o", out, "-c", "single", "-d", "0.95"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    reps = sorted(os.listdir(os.path.join(out, "Rep_ref")))
    assert len(reps) == 2, reps
    names = {p.split(".")[0] for p in reps}
    assert "Y1" in names
    assert names & {"X1", "X2"}
    # cluster map written with the reference's cutoff-percent naming
    cmap = os.path.join(out, "Cls_res", "hclsMap_95.txt")
    assert os.path.exists(cmap)
    lines = [l.split("\t") for l in open(cmap).read().splitlines() if l]
    assert len(lines) == 2
    sizes = sorted(int(l[1]) for l in lines)
    assert sizes == [1, 2]


def test_memory_efficient_db(setup):
    d, gdir, strains = setup
    db_dir = os.path.join(d, "DB_mem")
    build_database(gdir, db_dir, BuildConfig(memory_efficient=True))
    assert os.path.exists(os.path.join(db_dir, "Memory_DB"))
    fq = os.path.join(d, "y1.fq")
    _write_fq(fq, _sim_reads(strains["Y1"], 6))
    out = os.path.join(d, "out_mem")
    res = run_identify(fq, "", db_dir, out)
    assert res is not None
    assert next(iter(res.values()))["strain"] == "Y1"
    # canonical half-size DB counted WITHOUT -C (reference
    # identify_low_mem.py:74): only same-orientation reads hit, so
    # effective depth halves -> coverage ~1-e^-2.1
    assert next(iter(res.values()))["cls_cov"] > 0.8


def test_strain_prob_report(setup):
    d, gdir, strains = setup
    db_dir = os.path.join(d, "DB_std")
    build_database(gdir, db_dir, BuildConfig())
    fq = os.path.join(d, "x1_low.fq")
    _write_fq(fq, _sim_reads(strains["X1"], 0.5))
    out = os.path.join(d, "out_prob")
    cfg = IdentifyConfig(strain_prob=True, low_dep=2)
    run_identify(fq, "", db_dir, out, cfg)
    prob_file = os.path.join(out, "strain_prob.txt")
    assert os.path.exists(prob_file)
    with open(prob_file) as f:
        header = f.readline().split("\t")
        rows = [line.split("\t") for line in f if line.strip()]
    assert header[0] == "Cluster_ID"
    assert rows, "no clusters ranked"
    # the X cluster (containing X1) must rank first
    top = rows[0]
    assert "X1" in top[-1]


def test_low_depth_ladder(setup):
    d, gdir, strains = setup
    db_dir = os.path.join(d, "DB_std")
    fq = os.path.join(d, "y1_low.fq")
    _write_fq(fq, _sim_reads(strains["Y1"], 1.0))
    out = os.path.join(d, "out_ldep")
    res = run_identify(fq, "", db_dir, out, IdentifyConfig(low_dep=1))
    assert res is not None
    assert next(iter(res.values()))["strain"] == "Y1"


def test_custom_cluster_file(setup, tmp_path):
    d, gdir, strains = setup
    cls_file = tmp_path / "custom.txt"
    with open(cls_file, "w") as f:
        f.write("1\t2\tX1,X2\n2\t1\tY1\n")
    db_dir = os.path.join(d, "DB_custom")
    build_database(gdir, db_dir, BuildConfig(),
                   custom_cls_file=str(cls_file))
    import json
    man = json.load(open(os.path.join(db_dir, "manifest.json")))
    assert man["n_clusters"] == 2


def test_plasmid_mode_extract_and_rebuild(setup):
    """-p 1: detected singleton clusters' short contigs (<100 kb) become a
    plasmid reference set, a fresh DB is built over them, and the sample is
    re-identified against it (StrainScan.py:225-266)."""
    d, gdir, strains = setup
    db_dir = os.path.join(d, "DB_std")
    if not os.path.exists(db_dir):
        build_database(gdir, db_dir, BuildConfig())
    # reads from the multi-strain X cluster: L1 leaves strain==0 there,
    # which is the trigger for plasmid-reference extraction
    fq = os.path.join(d, "x1_plas.fq")
    _write_fq(fq, _sim_reads(strains["X1"], 6))
    out = os.path.join(d, "out_plasmid")
    cfg = IdentifyConfig(plasmid_mode=1)
    res = run_identify(fq, "", db_dir, out, cfg, rgenome=gdir)
    assert res is not None
    # the 60 kb test contigs all fall under the 100 kb plasmid threshold
    plas_list = os.path.join(out, "possible_plasmids.txt")
    assert os.path.exists(plas_list)
    listed = open(plas_list).read()
    assert "X1" in listed and "X2" in listed
    assert os.path.exists(os.path.join(out, "DB_plasmid", "manifest.json"))
    assert os.path.exists(os.path.join(out, "final_report.txt"))
    report = open(os.path.join(out, "final_report.txt")).read()
    assert "X1" in report


def test_resume_skips_completed_stages(setup, tmp_path, caplog):
    """build --resume: finished stages are reused, missing ones rebuilt."""
    import logging

    d, gdir, strains = setup
    db_dir = str(tmp_path / "DB_resume")
    build_database(gdir, db_dir, BuildConfig())
    # wipe one L2 cluster; resume must rebuild only it and reuse the rest
    import shutil

    l2 = os.path.join(db_dir, "l2")
    victims = os.listdir(l2)
    shutil.rmtree(os.path.join(l2, victims[0]))
    with caplog.at_level(logging.INFO, logger="strainscan_tpu.build"):
        build_database(gdir, db_dir, BuildConfig(), resume=True)
    assert any("resume: reusing" in r.message for r in caplog.records)
    assert os.path.exists(os.path.join(l2, victims[0], "data.npz"))


def test_batch_identify_cli(tmp_path):
    """batch-identify: N samples in one process, per-sample output dirs,
    reports byte-identical to individual identify runs."""
    import numpy as np

    from strainscan_tpu.build.pipeline import build_database
    from strainscan_tpu.cli import main as cli_main
    from strainscan_tpu.config import BuildConfig

    rng = np.random.default_rng(13)
    bases = np.array(list("ACGT"))
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    strains = {}
    for name in ("A1", "B1"):
        strains[name] = "".join(rng.choice(bases, size=25_000))
        with open(gdir / f"{name}.fa", "w") as f:
            f.write(f">{name}\n{strains[name]}\n")
    db = str(tmp_path / "DB")
    build_database(str(gdir), db, BuildConfig())

    def sim(seq, depth):
        out = []
        for _ in range(int(len(seq) * depth / 100)):
            p = int(rng.integers(0, len(seq) - 100))
            out.append(seq[p : p + 100])
        return out

    fqs = []
    for name in ("A1", "B1"):
        fq = tmp_path / f"s_{name}.fq"
        with open(fq, "w") as f:
            for i, r in enumerate(sim(strains[name], 8)):
                f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
        fqs.append(str(fq))

    batch_out = str(tmp_path / "batch")
    rc = cli_main(["batch-identify", "-i", *fqs, "-d", db, "-o", batch_out])
    assert rc == 0
    for name, fq in zip(("A1", "B1"), fqs):
        single_out = str(tmp_path / f"single_{name}")
        assert cli_main(["identify", "-i", fq, "-d", db,
                         "-o", single_out]) == 0
        a = open(os.path.join(batch_out, f"s_{name}",
                              "final_report.txt")).read()
        b = open(os.path.join(single_out, "final_report.txt")).read()
        assert a == b
        assert name in a


def test_degenerate_samples_graceful(tmp_path):
    """Empty FASTQ, all-N reads, and reads shorter than k must run the
    full pipeline without crashing and report no clusters (the
    reference's 'Warning: No clusters can be detected!' contract,
    StrainScan.py:203-204)."""
    import numpy as np

    from strainscan_tpu.build.pipeline import build_database
    from strainscan_tpu.config import BuildConfig, IdentifyConfig
    from strainscan_tpu.identify.pipeline import run_identify

    rng = np.random.default_rng(17)
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    for name in ("A", "B"):
        with open(gdir / f"{name}.fa", "w") as f:
            f.write(f">{name}\n" +
                    "".join(rng.choice(list("ACGT"), size=20_000)) + "\n")
    db = str(tmp_path / "DB")
    build_database(str(gdir), db, BuildConfig())

    empty = tmp_path / "empty.fq"
    empty.write_text("")
    weird = tmp_path / "weird.fq"
    weird.write_text("@r0\n" + "N" * 36 + "\n+\n" + "I" * 36 + "\n"
                     "@r1\nACGT\n+\nIIII\n")
    for fq in (empty, weird):
        res = run_identify(str(fq), "", db, str(tmp_path / f"out_{fq.stem}"),
                           IdentifyConfig())
        assert res is None
