"""L2 k-mer set features: gk_ratio (-g) partial-group filtering and the
SNV-k-mer subsumption claim behind the -m compat flag.

gk_ratio reference semantics (Build_kmer_sets...sp.py:239-251): partial
sibeliaz blocks are sorted by ascending strain count and only the first
int(gkratio * n_blocks) survive.  Our presence-pattern analog filters
shared-k-mer PATTERN GROUPS the same way (fewest-strain groups first).

SNV subsumption (-m / strainest MSA mode,
generate_kmer_with_sts_con_block.py:151-204): the reference aligns
global blocks and adds k-mers centered on polymorphic columns.  In the
presence-pattern design every k-mer overlapping a SNV is, by
construction, present only in the strains sharing that allele — i.e. it
is a strain-unique or shared-subset k-mer and lands in the matrix with
the correct columns.  test_snv_kmers_present proves it.
"""

import numpy as np
import pytest

from strainscan_tpu.build.l2_build import build_cluster_matrix
from strainscan_tpu.config import BuildConfig
from strainscan_tpu.kmer import pack

RNG = np.random.default_rng(13)
BASES = np.array(list("ACGT"))
K = 31


def _rnd(n):
    return "".join(RNG.choice(BASES, size=n))


def _build(genomes, tmp_path, **cfg_kw):
    gdir = tmp_path / "g"
    gdir.mkdir(exist_ok=True)
    genome_of = {}
    for n, s in genomes.items():
        p = gdir / f"{n}.fa"
        with open(p, "w") as f:
            f.write(f">{n}\n{s}\n")
        genome_of[n] = str(p)
    return build_cluster_matrix(1, sorted(genomes), genome_of,
                                BuildConfig(**cfg_kw))


def test_gk_ratio_filters_fewest_strain_groups_first(tmp_path):
    # three strains; three pairwise-shared segments -> 3 presence groups
    # of size 2 plus strain-unique content
    u1, u2, u3 = _rnd(4000), _rnd(4000), _rnd(4000)
    s12, s13, s23 = _rnd(2000), _rnd(3000), _rnd(4000)
    genomes = {
        "s1": u1 + s12 + s13,
        "s2": u2 + s12 + s23,
        "s3": u3 + s13 + s23,
    }
    full = _build(genomes, tmp_path, gk_ratio=1.0)
    half = _build(genomes, tmp_path, gk_ratio=0.4)  # int(0.4*3) = 1 group
    # gk_ratio < 1 must strictly shrink the shared set, keeping all
    # strain-unique k-mers
    assert half.kmers.size < full.kmers.size
    dense_full = np.asarray(full.matrix.todense())
    dense_half = np.asarray(half.matrix.todense())
    # strain-unique rows (row sum == 1) survive in both
    assert (dense_half.sum(axis=1) == 1).sum() == \
        (dense_full.sum(axis=1) == 1).sum()
    # full keeps 3 shared groups, half keeps exactly 1
    n_shared_full = int((dense_full.sum(axis=1) == 2).sum())
    n_shared_half = int((dense_half.sum(axis=1) == 2).sum())
    assert n_shared_full > n_shared_half > 0


def test_gk_ratio_one_is_identity(tmp_path):
    genomes = {"a": _rnd(5000) + _rnd(2000), "b": _rnd(5000)}
    m1 = _build(genomes, tmp_path, gk_ratio=1.0)
    m2 = _build(genomes, tmp_path)
    assert np.array_equal(m1.kmers, m2.kmers)


def test_snv_kmers_present(tmp_path):
    """Every k-mer overlapping a SNV (either allele) must be a matrix row
    assigned to exactly the allele's strains — the content the reference
    extracts via strainest MSA (-m 1) is already in the matrix."""
    base = _rnd(20_000)
    pos = 10_000
    alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[base[pos]]
    g_a = base
    g_b = base[:pos] + alt + base[pos + 1:]
    out = _build({"A": g_a, "B": g_b}, tmp_path)
    kmers = set(int(x) for x in out.kmers)
    dense = np.asarray(out.matrix.todense())
    row_of = {int(x): i for i, x in enumerate(out.kmers)}
    col = {s: i for i, s in enumerate(out.strains)}
    for genome, strain in ((g_a, "A"), (g_b, "B")):
        other = "B" if strain == "A" else "A"
        for off in range(K):
            s = genome[pos - off : pos - off + K]
            codes = pack.encode_seq(s)
            packed = 0
            for c in codes:
                packed = (packed << 2) | int(c)
            assert packed in kmers, f"SNV k-mer missing ({strain}, {off})"
            r = row_of[packed]
            assert dense[r, col[strain]] == 1
            assert dense[r, col[other]] == 0


def test_identical_genomes_zero_kmer_rep(tmp_path):
    """Byte-identical genomes in one cluster leave every member with ZERO
    discriminative matrix k-mers; the reference's pick_rep returns '' and
    crashes on the id lookup (Recls_withR_new.py:85-106).  The builder
    must fall back to a real member instead of raising."""
    g = _rnd(5_000)
    out = _build({"T1": g, "T2": g}, tmp_path)
    assert out.all_strains == ["T1", "T2"]
    assert len(out.strains) >= 1
    assert all(s in ("T1", "T2") for s in out.strains)
    assert out.matrix.shape[1] == len(out.strains)
