"""Sharded identify must produce the SAME final report as single-device.

Round-3 VERDICT item 1: the multi-device path had only ever been proven
bit-exact for raw *counts* on toy fixtures — nothing drove
``ShardedCountPipeline`` through CST search + L2 vote to a
``final_report.txt``.  These tests run the full identify pipeline twice on
the 8-virtual-device CPU mesh — once forced down the single-device
``CountPipeline`` (``shard_min_kmers`` above the table size) and once
through the sharded pipeline (``shard_min_kmers=1``, which also shards the
per-cluster L2 union counts inside ``vote_strain_l2_batch``) — and
byte-diffs every report file (reference end-to-end contract:
/root/reference/StrainScan.py:192-271).
"""

import dataclasses
import glob
import os

import numpy as np
import pytest

from strainscan_tpu.build.pipeline import build_database
from strainscan_tpu.config import BuildConfig, IdentifyConfig
from strainscan_tpu.identify.pipeline import run_identify

RNG = np.random.default_rng(33)
BASES = np.array(list("ACGT"))
GLEN = 30_000


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
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("sharded_e2e")
    gdir = d / "genomes"
    gdir.mkdir()
    base_a = _rand_genome(GLEN)
    strains = {
        "A1": base_a,
        "A2": _mutate(base_a, 40),   # same cluster as A1 -> Enet path
        "B1": _rand_genome(GLEN),    # its own cluster
    }
    for name, seq in strains.items():
        _write_fa(gdir / f"{name}.fa", name, seq)
    db_dir = str(d / "DB")
    build_database(str(gdir), db_dir, BuildConfig())
    return str(d), db_dir, strains


def _report_files(out_dir):
    files = {}
    for path in sorted(glob.glob(os.path.join(out_dir, "**", "*"),
                                 recursive=True)):
        if os.path.isfile(path):
            with open(path, "rb") as f:
                files[os.path.relpath(path, out_dir)] = f.read()
    return files


def _run_both(d, db_dir, reads, tag):
    """run_identify single-device vs sharded; return both output trees."""
    import jax

    assert jax.device_count() >= 8, "conftest must provide the virtual mesh"
    fq = os.path.join(d, f"{tag}.fq")
    _write_fq(fq, reads)
    out_single = os.path.join(d, f"out_single_{tag}")
    out_sharded = os.path.join(d, f"out_sharded_{tag}")
    cfg_single = dataclasses.replace(
        IdentifyConfig(), shard_min_kmers=10**12)
    cfg_sharded = dataclasses.replace(IdentifyConfig(), shard_min_kmers=1)
    res_s = run_identify(fq, "", db_dir, out_single, cfg_single)
    res_m = run_identify(fq, "", db_dir, out_sharded, cfg_sharded)
    assert (res_s is None) == (res_m is None)
    if res_s is not None:
        assert sorted(res_s) == sorted(res_m)
    return _report_files(out_single), _report_files(out_sharded)


def test_sharded_full_report_single_strain(fixture):
    d, db_dir, strains = fixture
    single, sharded = _run_both(
        d, db_dir, _sim_reads(strains["B1"], depth=8.0), "single")
    assert "final_report.txt" in single
    assert single == sharded, (
        "sharded identify diverged from single-device on files: "
        f"{[k for k in single if single.get(k) != sharded.get(k)]}")


def test_sharded_full_report_two_cluster_mixture(fixture):
    """Two-strain mixture across clusters through the sharded pipeline.

    NOTE: with this fixture's 40-SNP mutant the Jaccard distance
    (~2*40*31/60000 = 0.08) exceeds the 0.05 clustering cutoff, so A1
    and A2 land in separate singleton clusters — the L1 path + union
    counting is what this exercises.  The true intra-cluster Pre-Scan +
    Elastic-Net route is covered by ``l2_fixture`` below."""
    d, db_dir, strains = fixture
    reads = (_sim_reads(strains["A1"], depth=6.0)
             + _sim_reads(strains["A2"], depth=6.0))
    single, sharded = _run_both(d, db_dir, reads, "mix")
    assert "final_report.txt" in single
    assert single == sharded, (
        "sharded identify diverged from single-device on files: "
        f"{[k for k in single if single.get(k) != sharded.get(k)]}")


@pytest.fixture(scope="module")
def l2_fixture(tmp_path_factory):
    """DB where two strains genuinely share a cluster (15 SNPs ->
    Jaccard distance ~0.03 < the 0.05 cutoff), so identify runs the full
    Pre-Scan + Elastic-Net layer-2 route."""
    d = tmp_path_factory.mktemp("sharded_l2")
    gdir = d / "genomes"
    gdir.mkdir()
    base_a = _rand_genome(GLEN)
    strains = {
        "A1": base_a,
        "A2": _mutate(base_a, 15),
        "B1": _rand_genome(GLEN),
    }
    for name, seq in strains.items():
        _write_fa(gdir / f"{name}.fa", name, seq)
    db_dir = str(d / "DB")
    build_database(str(gdir), db_dir, BuildConfig())
    with open(os.path.join(db_dir, "cluster",
                           "hclsMap_95_recls.txt")) as f:
        sizes = [int(line.split("\t")[1]) for line in f]
    assert max(sizes) >= 2, "fixture must contain a multi-strain cluster"
    return str(d), db_dir, strains


def test_sharded_full_report_intra_cluster_enet(l2_fixture):
    """True same-cluster mixture: Pre-Scan + Elastic-Net runs on counts
    produced by the sharded pipeline (exercises the L2 union-table count
    through ShardedCountPipeline), byte-identical reports."""
    d, db_dir, strains = l2_fixture
    reads = (_sim_reads(strains["A1"], depth=6.0)
             + _sim_reads(strains["A2"], depth=6.0))
    single, sharded = _run_both(d, db_dir, reads, "enet_mix")
    assert "final_report.txt" in single
    assert any(k.endswith("StrainVote.report") for k in single), \
        "expected a layer-2 StrainVote.report (fixture must hit L2)"
    assert single == sharded, (
        "sharded identify diverged from single-device on files: "
        f"{[k for k in single if single.get(k) != sharded.get(k)]}")


def test_sharded_l2_moments_via_mesh(l2_fixture, monkeypatch):
    """Round-4 VERDICT item 2: the L2 Pre-Scan column sums and Enet fold
    Grams must actually route through the index-sharded mesh (not just
    exist) and leave every report byte-identical."""
    from strainscan_tpu.parallel import sharded as psh

    d, db_dir, strains = l2_fixture
    reads = (_sim_reads(strains["A1"], depth=6.0)
             + _sim_reads(strains["A2"], depth=6.0))
    fq = os.path.join(d, "l2mesh.fq")
    _write_fq(fq, reads)

    # min_snv_num lowered so the 15-SNP mutant clears the Pre-Scan
    # accept gate (msn*k covered k-mers) and the Elastic-Net runs
    out_plain = os.path.join(d, "out_l2_plain")
    cfg_plain = dataclasses.replace(
        IdentifyConfig(), shard_min_kmers=10**12, shard_min_l2_rows=10**12,
        min_snv_num=10)
    res_p = run_identify(fq, "", db_dir, out_plain, cfg_plain)

    calls = {"colsum": 0, "colsum_unused": 0, "grams": 0}
    orig = {
        "colsum": psh.sharded_colsum_fn,
        "colsum_unused": psh.sharded_colsum_unused_fn,
        "grams": psh.sharded_fold_grams_fn,
    }

    def counted(name):
        def wrap(mesh, *a, **kw):
            calls[name] += 1
            return orig[name](mesh, *a, **kw)
        return wrap

    monkeypatch.setattr(psh, "sharded_colsum_fn", counted("colsum"))
    monkeypatch.setattr(psh, "sharded_colsum_unused_fn",
                        counted("colsum_unused"))
    monkeypatch.setattr(psh, "sharded_fold_grams_fn", counted("grams"))

    out_mesh = os.path.join(d, "out_l2_mesh")
    cfg_mesh = dataclasses.replace(
        IdentifyConfig(), shard_min_kmers=10**12, shard_min_l2_rows=1,
        min_snv_num=10)
    res_m = run_identify(fq, "", db_dir, out_mesh, cfg_mesh)

    assert calls["colsum"] > 0, "Pre-Scan colsum never routed via mesh"
    assert calls["grams"] > 0, "Enet fold Grams never routed via mesh"
    assert (res_p is None) == (res_m is None)
    plain, mesh = _report_files(out_plain), _report_files(out_mesh)
    assert "final_report.txt" in plain
    assert plain == mesh, (
        "mesh-routed L2 moments changed reports: "
        f"{[k for k in plain if plain.get(k) != mesh.get(k)]}")
