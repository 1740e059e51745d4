"""End-to-end: build DB from simulated strains, identify simulated samples.

Mirrors the reference smoke tests (test_run.sh + Output_Example golden
semantics): single-strain sample, cross-cluster mixture, and an
intra-cluster mixture that exercises Pre-Scan + Elastic-Net.
"""

import os

import numpy as np
import pytest

from strainscan_tpu.build.pipeline import build_database
from strainscan_tpu.config import BuildConfig, IdentifyConfig
from strainscan_tpu.identify.pipeline import run_identify

RNG = np.random.default_rng(21)
BASES = np.array(list("ACGT"))
GLEN = 100_000


def _rand_genome(n):
    return "".join(RNG.choice(BASES, size=n))


def _mutate(seq, n_snps):
    s = np.array(list(seq))
    pos = RNG.choice(len(s), size=n_snps, replace=False)
    for p in pos:
        s[p] = RNG.choice([b for b in BASES if b != s[p]])
    return "".join(s)


def _revcomp(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def _write_fa(path, name, seq):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")


def _sim_reads(seq, depth, read_len=100):
    n_reads = int(len(seq) * depth / read_len)
    reads = []
    for _ in range(n_reads):
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
def db_and_strains(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    gdir = d / "genomes"
    gdir.mkdir()
    base_a = _rand_genome(GLEN)
    base_d = _rand_genome(GLEN)
    strains = {
        "A1": base_a,
        "A2": _mutate(base_a, 60),
        "B1": _rand_genome(GLEN),
        "D1": base_d,
        "D2": _mutate(base_d, 70),
    }
    for name, seq in strains.items():
        _write_fa(gdir / f"{name}.fa", name, seq)
    db_dir = str(d / "DB")
    build_database(str(gdir), db_dir, BuildConfig())
    return str(d), db_dir, strains


def _read_report(out_dir):
    path = os.path.join(out_dir, "final_report.txt")
    assert os.path.exists(path), "final_report.txt missing"
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in f if line.strip()]
    return header, rows


def test_db_layout(db_and_strains):
    _, db_dir, _ = db_and_strains
    for p in ("manifest.json", "tree/structure.json", "tree/kmers.npz",
              "tree/table.npz", "cluster/hclsMap_95.txt",
              "cluster/hclsMap_95_recls.txt"):
        assert os.path.exists(os.path.join(db_dir, p)), p
    import json
    man = json.load(open(os.path.join(db_dir, "manifest.json")))
    assert man["n_strains"] == 5
    assert man["n_clusters"] == 3
    # two multi-strain clusters have L2 data
    l2_dirs = sorted(os.listdir(os.path.join(db_dir, "l2")))
    assert len(l2_dirs) == 2


def test_single_strain_sample(db_and_strains):
    d, db_dir, strains = db_and_strains
    fq = os.path.join(d, "b1.fq")
    _write_fq(fq, _sim_reads(strains["B1"], depth=5))
    out = os.path.join(d, "out_b1")
    res = run_identify(fq, "", db_dir, out)
    assert res is not None and len(res) == 1
    only = next(iter(res.values()))
    assert only["strain"] == "B1"
    # per-entry depth ~ Poisson(5 * 0.7 / 2) => coverage ~ 1-e^-1.75 ~ 0.83
    assert only["cls_cov"] > 0.75
    header, rows = _read_report(out)
    assert rows[0][1] == "B1"
    # depth ~ depth * (readlen-k+1)/readlen / 2 orientations = 5*0.7/2
    depth = float(rows[0][4])
    assert 1.2 < depth < 2.4


def test_cross_cluster_mixture(db_and_strains):
    d, db_dir, strains = db_and_strains
    fq = os.path.join(d, "mix_bd.fq")
    reads = _sim_reads(strains["B1"], 8) + _sim_reads(strains["D1"], 8)
    RNG.shuffle(reads)
    _write_fq(fq, reads)
    out = os.path.join(d, "out_bd")
    res = run_identify(fq, "", db_dir, out)
    assert res is not None and len(res) == 2
    _, rows = _read_report(out)
    found = {r[1] for r in rows}
    assert "B1" in found
    assert "D1" in found
    assert "D2" not in found
    # roughly equal relative abundance
    abs_ = sorted(float(r[3]) for r in rows)
    assert abs_[0] > 0.3


def test_intra_cluster_mixture_enet(db_and_strains):
    d, db_dir, strains = db_and_strains
    fq = os.path.join(d, "mix_aa.fq")
    reads = _sim_reads(strains["A1"], 10) + _sim_reads(strains["A2"], 10)
    RNG.shuffle(reads)
    _write_fq(fq, reads)
    out = os.path.join(d, "out_aa")
    res = run_identify(fq, "", db_dir, out)
    assert res is not None and len(res) == 1
    header, rows = _read_report(out)
    # single multi-strain cluster: final report is the StrainVote layout
    assert header[0] == "Strain_ID"
    assert header[-1] == "Exist_Evidence"
    found = {r[1] for r in rows}
    assert found == {"A1", "A2"}
    rel = {r[1]: float(r[3]) for r in rows}
    assert 0.3 < rel["A1"] < 0.7
    assert 0.3 < rel["A2"] < 0.7


def test_dominant_only_sample(db_and_strains):
    """A1 alone: the cluster is multi-strain, but only A1 should report."""
    d, db_dir, strains = db_and_strains
    fq = os.path.join(d, "a1.fq")
    _write_fq(fq, _sim_reads(strains["A1"], 10))
    out = os.path.join(d, "out_a1")
    res = run_identify(fq, "", db_dir, out)
    assert res is not None and len(res) == 1
    _, rows = _read_report(out)
    names = [r[1] for r in rows]
    assert names == ["A1"]


def test_fp_sidecar_written_and_backcompat(db_and_strains):
    """Builds persist tree/fptable.npz; loading attaches it so cold
    identify skips the fp-table derivation, and a DB WITHOUT the sidecar
    (pre-round-4 layout) still loads by deriving it on demand."""
    import shutil

    from strainscan_tpu.build.db import _load_tree_db_uncached
    from strainscan_tpu.index.hashtable import FpTable
    from strainscan_tpu.ops.count import CountPipeline

    _, db_dir, _ = db_and_strains
    side = os.path.join(db_dir, "tree", "fptable.npz")
    assert os.path.exists(side), "build must write the fp sidecar"
    db = _load_tree_db_uncached(db_dir)
    fpt = getattr(db.table, "_fp_cache", None)
    assert fpt is not None, "loader must attach the sidecar fp table"
    # pipeline must reuse the attached table, not rebuild
    pipe = CountPipeline(db.table)
    assert pipe.fpt is fpt
    # back-compat: sidecar removed -> derive path, identical table
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        legacy = os.path.join(tmp, "DB")
        shutil.copytree(db_dir, legacy)
        os.remove(os.path.join(legacy, "tree", "fptable.npz"))
        db2 = _load_tree_db_uncached(legacy)
        assert getattr(db2.table, "_fp_cache", None) is None
        pipe2 = CountPipeline(db2.table)
        derived = pipe2.fpt
        assert np.array_equal(derived.fp, fpt.fp)
        assert np.array_equal(derived.val, fpt.val)


def test_fp_sidecar_corrupt_and_foreign(db_and_strains):
    """A truncated sidecar must not make the DB unloadable, and a
    sidecar from a DIFFERENT build (same n_keys/k, different keys) must
    be rejected via the content checksum — both fall back to deriving."""
    import shutil
    import tempfile

    from strainscan_tpu.build.db import _load_tree_db_uncached
    from strainscan_tpu.index.hashtable import FpTable, keys_checksum

    _, db_dir, _ = db_and_strains
    with tempfile.TemporaryDirectory() as tmp:
        # corrupt/truncated sidecar
        bad = os.path.join(tmp, "DBbad")
        shutil.copytree(db_dir, bad)
        with open(os.path.join(bad, "tree", "fptable.npz"), "wb") as f:
            f.write(b"PK\x03\x04 truncated")
        db = _load_tree_db_uncached(bad)
        assert getattr(db.table, "_fp_cache", None) is None
        assert db.table.n_keys > 0  # eager table fully loaded

        # foreign sidecar: same n_keys/k but different key content
        foreign = os.path.join(tmp, "DBforeign")
        shutil.copytree(db_dir, foreign)
        rng = np.random.default_rng(123)
        other = np.unique(rng.integers(
            0, 1 << 62, size=db.table.n_keys * 2, dtype=np.uint64)
        )[: db.table.n_keys]
        FpTable.build(other, k=db.table.k).save(
            os.path.join(foreign, "tree", "fptable.npz"),
            content_csum=keys_checksum(other))
        db2 = _load_tree_db_uncached(foreign)
        assert getattr(db2.table, "_fp_cache", None) is None, \
            "checksum mismatch must reject the foreign sidecar"
