"""Reference-layout DB converter: export -> import round trip must
preserve identification behavior (SURVEY §7 design stance: a converter
tool for parity testing against reference-built DBs)."""

import os

import numpy as np
import pytest

from strainscan_tpu.build.convert import (export_reference_db,
                                          import_reference_db)
from strainscan_tpu.build.db import load_l2_db, load_tree_db
from strainscan_tpu.build.pipeline import build_database
from strainscan_tpu.config import BuildConfig
from strainscan_tpu.identify.pipeline import run_identify

RNG = np.random.default_rng(97)
BASES = np.array(list("ACGT"))
GLEN = 50_000


def _rand_genome(n):
    return "".join(RNG.choice(BASES, size=n))


def _mutate(seq, n_snps):
    s = np.array(list(seq))
    for p in RNG.choice(len(s), size=n_snps, replace=False):
        s[p] = RNG.choice([b for b in BASES if b != s[p]])
    return "".join(s)


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    d = tmp_path_factory.mktemp("convert")
    gdir = d / "genomes"
    gdir.mkdir()
    base = _rand_genome(GLEN)
    strains = {
        "A1": base,
        "A2": _mutate(base, 30),
        "B1": _rand_genome(GLEN),
    }
    for n, s in strains.items():
        with open(gdir / f"{n}.fa", "w") as f:
            f.write(f">{n}\n{s}\n")
    native = str(d / "DB_native")
    build_database(str(gdir), native, BuildConfig())
    ref = str(d / "DB_ref_layout")
    export_reference_db(native, ref)
    back = str(d / "DB_back")
    import_reference_db(ref, back)
    return str(d), strains, native, ref, back


def test_reference_layout_files(dbs):
    d, strains, native, ref, back = dbs
    tdir = os.path.join(ref, "Tree_database")
    for fn in ("tree_structure.txt", "hclsMap_95_recls.txt",
               "node_length.txt", "reconstructed_nodes.txt", "kmer.fa"):
        assert os.path.exists(os.path.join(tdir, fn)), fn
    assert os.path.isdir(os.path.join(tdir, "kmers"))
    # one line per node, reference column layout
    with open(os.path.join(tdir, "tree_structure.txt")) as f:
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    assert all(len(r) >= 3 for r in rows)
    assert sum(1 for r in rows if r[1] == "N") == 1  # exactly one root
    # kmer.fa entries count matches node id space
    n_fa = sum(1 for l in open(os.path.join(tdir, "kmer.fa"))
               if not l.startswith(">"))
    tdb = load_tree_db(native)
    assert n_fa == tdb.all_kmers.size
    # L2 cluster artifacts
    l2 = os.path.join(ref, "Kmer_Sets_L2", "Kmer_Sets")
    assert os.path.isdir(l2)
    cdir = os.path.join(l2, sorted(os.listdir(l2))[0])
    for fn in ("all_kmer.fasta", "all_kid.pkl", "all_strains_re.npz",
               "id2strain_re.pkl", "overlap_matrix.npz",
               "Re_Cluster_info.txt"):
        assert os.path.exists(os.path.join(cdir, fn)), fn


def test_round_trip_preserves_tree(dbs):
    d, strains, native, ref, back = dbs
    a = load_tree_db(native)
    b = load_tree_db(back)
    assert a.tree.root == b.tree.root
    assert a.tree.children == b.tree.children
    assert a.node_length == b.node_length
    assert a.recls == b.recls
    assert a.gcf == b.gcf
    assert sorted(a.reconstructed) == sorted(b.reconstructed)
    # same k-mer CONTENT per node (global id spaces may be permuted)
    for n, ids in a.node_kmers.items():
        ka = np.sort(a.all_kmers[ids])
        kb = np.sort(b.all_kmers[b.node_kmers[n]])
        assert np.array_equal(ka, kb), f"node {n} k-mers differ"


def test_round_trip_preserves_l2(dbs):
    d, strains, native, ref, back = dbs
    import json

    man = json.load(open(os.path.join(native, "manifest.json")))
    for cid in man["cluster_ids"]:
        a = load_l2_db(native, cid)
        b = load_l2_db(back, cid)
        if a is None:
            assert b is None
            continue
        assert np.array_equal(a.kmers, b.kmers)
        assert (a.matrix != b.matrix).nnz == 0
        assert (a.overlap != b.overlap).nnz == 0
        assert a.strains == b.strains
        assert a.recluster == b.recluster


def test_round_trip_identify_parity(dbs):
    d, strains, native, ref, back = dbs
    reads = []
    seq = strains["A1"]
    for _ in range(int(len(seq) * 6 / 100)):
        s = int(RNG.integers(0, len(seq) - 100))
        reads.append(seq[s:s + 100])
    fq = os.path.join(d, "a1.fq")
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    out_a = os.path.join(d, "out_native")
    out_b = os.path.join(d, "out_converted")
    res_a = run_identify(fq, "", native, out_a)
    res_b = run_identify(fq, "", back, out_b)
    assert res_a is not None and res_b is not None
    assert sorted(res_a) == sorted(res_b)
    ra = open(os.path.join(out_a, "final_report.txt")).read()
    rb = open(os.path.join(out_b, "final_report.txt")).read()
    assert ra == rb


def test_export_writes_tree_pkl_and_distance_text(tmp_path):
    """Export-fidelity nits (round-4 VERDICT missing #4): tree.pkl is
    present for MULTI-node trees too (the reference writes it always,
    reads it only single-node), and the Cluster_Result text distance
    matrices exist in the reference formats."""
    import pickle
    import sys

    import numpy as np

    from strainscan_tpu.build.convert import export_reference_db
    from strainscan_tpu.build.pipeline import build_database
    from strainscan_tpu.config import BuildConfig

    rng = np.random.default_rng(4)
    bases = np.array(list("ACGT"))
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    for name in ("A", "B", "C"):
        seq = "".join(rng.choice(bases, size=20_000))
        with open(gdir / f"{name}.fa", "w") as f:
            f.write(f">{name}\n{seq}\n")
    db = str(tmp_path / "DB")
    build_database(str(gdir), db, BuildConfig())
    ref = str(tmp_path / "REF")
    export_reference_db(db, ref)

    pkl = os.path.join(ref, "Tree_database", "tree.pkl")
    assert os.path.exists(pkl)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo_root, "tools", "refcompat"))
    t = pickle.load(open(pkl, "rb"))
    assert len(t.all_nodes()) >= 3, "multi-node tree must be pickled"

    dm = os.path.join(ref, "Cluster_Result", "distance_matrix.txt")
    dr = os.path.join(ref, "Cluster_Result", "distance_matrix_rebuild.txt")
    assert os.path.exists(dm) and os.path.exists(dr)
    header = open(dm).readline().rstrip("\n").split("\t")
    assert len(header) == 4  # ##Names + 3 strains
    rrows = open(dr).read().rstrip("\n").split("\n")
    assert len(rrows) == 4   # header + 3 rows
    # rebuild file carries distances (self-distance 0)
    first = rrows[1].split("\t")
    assert float(first[1]) == 0.0
