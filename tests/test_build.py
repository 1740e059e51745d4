"""Build-side tests: distances, clustering, rep selection, CST invariants,
L2 matrices — over simulated strain genomes."""

import numpy as np
import pytest

from strainscan_tpu.build import cluster as cluster_mod
from strainscan_tpu.build import distance, l2_build, select_rep, tree_build
from strainscan_tpu.config import BuildConfig
from strainscan_tpu.io import fastx
from strainscan_tpu.kmer import pack

RNG = np.random.default_rng(7)
BASES = np.array(list("ACGT"))


def _rand_genome(n):
    return "".join(RNG.choice(BASES, size=n))


def _mutate(seq, n_snps):
    s = np.array(list(seq))
    pos = RNG.choice(len(s), size=n_snps, replace=False)
    for p in pos:
        cur = s[p]
        s[p] = RNG.choice([b for b in BASES if b != cur])
    return "".join(s)


def _write_fa(path, name, seq):
    with open(path, "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")


@pytest.fixture(scope="module")
def strain_dir(tmp_path_factory):
    """5 strains in 3 true clusters: {A1,A2}, {B1}, {D1,D2}."""
    d = tmp_path_factory.mktemp("genomes")
    base_a = _rand_genome(50_000)
    base_d = _rand_genome(50_000)
    strains = {
        "A1": base_a,
        "A2": _mutate(base_a, 20),
        "B1": _rand_genome(50_000),
        "D1": base_d,
        "D2": _mutate(base_d, 25),
    }
    for name, seq in strains.items():
        _write_fa(d / f"{name}.fa", name, seq)
    return str(d), strains


def test_distance_matrix_clusters(strain_dir):
    d, _ = strain_dir
    genomes = fastx.list_genomes(d)
    names, dist = distance.distance_matrix(genomes, sketch_size=2048)
    i = {n: j for j, n in enumerate(names)}
    assert dist[i["A1"], i["A2"]] < 0.05
    assert dist[i["D1"], i["D2"]] < 0.05
    assert dist[i["A1"], i["B1"]] > 0.5
    assert dist[i["A1"], i["D1"]] > 0.5
    # sketch estimate close to exact
    _, exact = distance.distance_matrix(genomes, exact=True)
    assert np.allclose(dist, exact, atol=0.02)


def test_hcls_and_pick_rep(strain_dir):
    d, _ = strain_dir
    genomes = fastx.list_genomes(d)
    names, dist = distance.distance_matrix(genomes, sketch_size=2048)
    cls = cluster_mod.hcls(names, dist, "single", 0.05)
    groups = sorted(tuple(sorted(v)) for v in cls.values())
    assert groups == [("A1", "A2"), ("B1",), ("D1", "D2")]
    reps, recls, moved = select_rep.pick_rep(names, dist, cls)
    assert len(reps) == 3
    assert moved == []
    assert sorted(tuple(sorted(v)) for v in recls.values()) == groups


@pytest.fixture(scope="module")
def built_cst(strain_dir):
    d, _ = strain_dir
    genomes = fastx.list_genomes(d)
    genome_of = {fastx.genome_prefix(p): p for p in genomes}
    names, dist = distance.distance_matrix(genomes, sketch_size=2048)
    cls = cluster_mod.hcls(names, dist, "single", 0.05)
    _, recls, _ = select_rep.pick_rep(names, dist, cls)
    cfg = BuildConfig(min_kmer=500, max_kmer=30000)
    cst = tree_build.build_cst(names, dist, recls, genome_of, cfg)
    return cst, genome_of


def test_cst_structure(built_cst):
    cst, _ = built_cst
    tree = cst.tree
    leaves = tree.leaves()
    assert len(leaves) == 3
    assert len(tree.nodes()) == 5
    # every node has a k-mer set and a length
    for n in tree.nodes():
        assert n in cst.node_kmers
        assert cst.node_length[n] == cst.node_kmers[n].size
    # ids into the global k-mer space are valid
    for n, ids in cst.node_kmers.items():
        if ids.size:
            assert ids.max() < cst.all_kmers.size
    # singleton leaf carries its strain name
    singles = [l for l in leaves if len(cst.recls[l]) == 1]
    assert len(singles) == 1
    assert cst.gcf[singles[0]] == "B1"


def test_cst_node_sets_disjoint(built_cst):
    cst, _ = built_cst
    nodes = list(cst.node_kmers)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            ka = cst.all_kmers[cst.node_kmers[a]]
            kb = cst.all_kmers[cst.node_kmers[b]]
            assert np.intersect1d(ka, kb).size == 0, (a, b)


def test_cst_node_kmers_specific(built_cst):
    """A node's k-mers must appear in every descendant leaf's genomes and in
    no non-descendant leaf's genomes (CST core invariant; reconstructed
    nodes may overlap lower leaves but record it in overlap_info)."""
    cst, genome_of = built_cst
    tree = cst.tree
    k = cst.k
    leaf_kmers = {}
    for leaf in tree.leaves():
        parts = [fastx.genome_kmers(genome_of[s], k, mode="both")
                 for s in cst.recls[leaf]]
        leaf_kmers[leaf] = np.unique(np.concatenate(parts))
    for n in tree.nodes():
        if n in cst.reconstructed:
            continue
        kn = cst.all_kmers[cst.node_kmers[n]]
        desc = set(tree.descendant_leaves(n))
        for leaf in tree.leaves():
            inter = np.intersect1d(kn, leaf_kmers[leaf]).size
            if leaf in desc:
                assert inter == kn.size, (n, leaf)
            else:
                assert inter == 0, (n, leaf)


def test_l2_matrix_properties(built_cst):
    cst, genome_of = built_cst
    cfg = BuildConfig()
    multi = [cid for cid, m in cst.recls.items() if len(m) > 1]
    assert multi
    cid = multi[0]
    cl = l2_build.build_cluster_matrix(cid, cst.recls[cid], genome_of, cfg)
    n = len(cst.recls[cid])
    assert cl.matrix.shape[0] == cl.kmers.size
    # with 2 strains ~20 SNPs apart, dedup must keep both
    assert len(cl.strains) == n == 2
    dense = np.asarray(cl.matrix.todense())
    # every k-mer row belongs to at least one but not all strains
    rowsum = dense.sum(axis=1)
    assert rowsum.min() >= 1
    assert (rowsum < n).all()
    # row content matches actual genome membership
    presence = {
        s: fastx.genome_kmers(genome_of[s], cfg.ksize, mode="both")
        for s in cl.strains
    }
    for si, s in enumerate(cl.strains):
        member = np.isin(cl.kmers, presence[s], assume_unique=True)
        assert np.array_equal(member, dense[:, si] > 0)


def test_overlap_matrix(built_cst):
    cst, genome_of = built_cst
    cfg = BuildConfig()
    multi = {cid: cst.recls[cid] for cid in cst.recls
             if len(cst.recls[cid]) > 1}
    l2 = {cid: l2_build.build_cluster_matrix(cid, m, genome_of, cfg)
          for cid, m in multi.items()}
    l2_build.build_overlap_matrices(l2, cst.recls, genome_of, cfg)
    cluster_ids = sorted(cst.recls)
    for cl in l2.values():
        om = np.asarray(cl.overlap.todense())
        assert om.shape == (cl.kmers.size, len(cluster_ids))
        # own-cluster column must be all ones (k-mers come from the cluster)
        own_col = cluster_ids.index(cl.cid)
        assert om[:, own_col].all()
        # cross-check one foreign column against genome membership
        other = [c for c in cluster_ids if c != cl.cid][0]
        union = np.unique(np.concatenate([
            fastx.genome_kmers(genome_of[s], cfg.ksize, mode="both")
            for s in cst.recls[other]
        ]))
        member = np.isin(cl.kmers, union, assume_unique=True)
        oc = cluster_ids.index(other)
        assert np.array_equal(member, om[:, oc] > 0)


def test_signature_jaccard_matmul_matches_loop_oracle():
    """The matmul reformulation must be bit-identical to the original
    blocked equality loop (exact integer counts either way)."""
    import numpy as np

    from strainscan_tpu.build import distance

    rng = np.random.default_rng(2)
    n, m = 37, 256
    sigs = distance.mix64(rng.integers(0, 1 << 62, size=(n, m),
                                       dtype=np.uint64))
    # inject shared values (pairs that actually match) and empties
    sigs[1] = sigs[0]
    sigs[2, :128] = sigs[0, :128]
    sigs[3, rng.integers(0, m, size=40)] = distance._EMPTY64
    sigs[4, :] = distance._EMPTY64

    def oracle(sigs, block=16):
        n, m = sigs.shape
        nonempty = sigs != distance._EMPTY64
        out = np.zeros((n, n))
        for i in range(0, n, block):
            a, an = sigs[i:i+block], nonempty[i:i+block]
            for j in range(0, n, block):
                b, bn = sigs[j:j+block], nonempty[j:j+block]
                eq = ((a[:, None, :] == b[None, :, :])
                      & an[:, None, :] & bn[None, :, :]).sum(-1)
                info = (an[:, None, :] | bn[None, :, :]).sum(-1)
                out[i:i+block, j:j+block] = np.where(
                    info > 0, eq / np.maximum(info, 1), 0.0)
        return out

    got = distance.signature_jaccard(sigs)
    want = oracle(sigs)
    assert np.array_equal(got, want)
    assert got[0, 1] == 1.0 and 0.4 < got[0, 2] < 0.6


def test_threaded_build_matches_serial(tmp_path):
    """threads=2 must produce a bit-identical DB to threads=1 (the
    thread pools in leaf_extract / id_space / overlap scans only
    parallelize independent per-leaf/per-cluster work)."""
    import numpy as np

    from strainscan_tpu.build.pipeline import build_database
    from strainscan_tpu.config import BuildConfig

    rng = np.random.default_rng(12)
    bases = np.array(list("ACGT"))
    gdir = tmp_path / "genomes"
    gdir.mkdir()
    base = "".join(rng.choice(bases, size=25_000))
    strains = {"A1": base}
    s = np.array(list(base))
    for p in rng.choice(25_000, size=15, replace=False):
        s[p] = rng.choice([b for b in bases if b != s[p]])
    strains["A2"] = "".join(s)
    strains["B1"] = "".join(rng.choice(bases, size=25_000))
    strains["C1"] = "".join(rng.choice(bases, size=25_000))
    for name, seq in strains.items():
        with open(gdir / f"{name}.fa", "w") as f:
            f.write(f">{name}\n{seq}\n")
    db1 = str(tmp_path / "DB1")
    db2 = str(tmp_path / "DB2")
    build_database(str(gdir), db1, BuildConfig(threads=1))
    build_database(str(gdir), db2, BuildConfig(threads=2))
    import glob as g
    import os

    for f in sorted(g.glob(os.path.join(db1, "**", "*.npz"),
                           recursive=True)):
        f2 = f.replace(db1, db2)
        a, b = np.load(f), np.load(f2)
        assert sorted(a.files) == sorted(b.files), f
        for k in a.files:
            assert np.array_equal(a[k], b[k]), (f, k)
