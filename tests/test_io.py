"""IO layer: python/native readers must agree; chunking must preserve k-mers."""

import gzip

import numpy as np
import pytest

from strainscan_tpu import native
from strainscan_tpu.io import fastx
from strainscan_tpu.kmer import pack

RNG = np.random.default_rng(3)


def _rand_seq(n):
    return "".join(RNG.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def sample_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("fx")
    reads = [_rand_seq(RNG.integers(40, 120)) for _ in range(37)]
    reads.append(_rand_seq(700))  # over-long: must be chunked
    fq = d / "sample.fq"
    with open(fq, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    fqgz = d / "sample.fq.gz"
    with gzip.open(fqgz, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    fa = d / "genome.fa"
    contigs = [_rand_seq(3000), _rand_seq(1500)]
    with open(fa, "w") as f:
        for i, c in enumerate(contigs):
            f.write(f">c{i}\n")
            for j in range(0, len(c), 70):
                f.write(c[j : j + 70] + "\n")
    return dict(fq=str(fq), fqgz=str(fqgz), fa=str(fa), reads=reads,
                contigs=contigs)


def _kmer_multiset_from_batches(batches, k):
    out = []
    for b in batches:
        for row in b:
            km, valid = pack.pack_kmers(row, k)
            out.append(km[valid])
    return np.sort(np.concatenate(out))


def _expected_kmer_multiset(reads, k):
    out = []
    for r in reads:
        km, valid = pack.pack_kmers(pack.encode_seq(r), k)
        out.append(km[valid])
    return np.sort(np.concatenate(out))


@pytest.mark.parametrize("use_native", [False, True])
@pytest.mark.parametrize("key", ["fq", "fqgz"])
def test_batches_preserve_kmers(sample_files, use_native, key):
    if use_native and native.get_lib() is None:
        pytest.skip("native lib unavailable")
    k = 31
    got = _kmer_multiset_from_batches(
        fastx.read_batches(sample_files[key], batch=16, maxlen=128, k=k,
                           use_native=use_native),
        k,
    )
    expect = _expected_kmer_multiset(sample_files["reads"], k)
    assert np.array_equal(got, expect)


def test_native_matches_python(sample_files):
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    k = 31
    a = _kmer_multiset_from_batches(
        fastx.read_batches(sample_files["fq"], batch=8, maxlen=100, k=k,
                           use_native=True), k)
    b = _kmer_multiset_from_batches(
        fastx.read_batches(sample_files["fq"], batch=8, maxlen=100, k=k,
                           use_native=False), k)
    assert np.array_equal(a, b)


def test_read_fasta(sample_files):
    recs = list(fastx.read_fasta(sample_files["fa"]))
    assert [n for n, _ in recs] == ["c0", "c1"]
    assert [s for _, s in recs] == sample_files["contigs"]


@pytest.mark.parametrize("use_native", [False, True])
@pytest.mark.parametrize("mode", ["fwd", "both", "canonical"])
def test_genome_kmers(sample_files, mode, use_native):
    if use_native and native.get_lib() is None:
        pytest.skip("native lib unavailable")
    k = 31
    got = fastx.genome_kmers(sample_files["fa"], k, mode=mode,
                             use_native=use_native)
    parts = []
    for c in sample_files["contigs"]:
        km, valid = pack.pack_kmers(pack.encode_seq(c), k)
        km = km[valid]
        if mode == "both":
            km = np.concatenate([km, pack.revcomp_packed(km, k)])
        elif mode == "canonical":
            km = pack.canonical_packed(km, k)
        parts.append(km)
    expect = np.unique(np.concatenate(parts))
    assert np.array_equal(got, expect)


def test_genome_prefix():
    assert fastx.genome_prefix("/x/GCF_000144385.1.fna.gz") == "GCF_000144385"


def test_genome_kmers_drop_last(tmp_path):
    """drop_last skips each contig's LAST window (the reference default
    tree build's off-by-one, Build_tree.py:100,113) — native and Python
    paths must agree, and drop_last=False keeps every window."""
    import numpy as np

    from strainscan_tpu.io import fastx

    rng = np.random.default_rng(6)
    c1 = "".join(rng.choice(list("ACGT"), size=100))
    c2 = "".join(rng.choice(list("ACGT"), size=64))
    path = str(tmp_path / "g.fa")
    with open(path, "w") as f:
        f.write(f">c1\n{c1}\n>c2\n{c2}\n")
    k = 31
    full = fastx.genome_kmers(path, k, mode="both", unique=False)
    dropped = fastx.genome_kmers(path, k, mode="both", unique=False,
                                 drop_last=True)
    # one window fewer per contig, two orientations each
    assert full.size == 2 * ((100 - k + 1) + (64 - k + 1))
    assert dropped.size == full.size - 4
    py_full = fastx.genome_kmers(path, k, mode="both", unique=False,
                                 use_native=False)
    py_drop = fastx.genome_kmers(path, k, mode="both", unique=False,
                                 use_native=False, drop_last=True)
    assert np.array_equal(np.sort(full), np.sort(py_full))
    assert np.array_equal(np.sort(dropped), np.sort(py_drop))
    # a contig of exactly k bases yields 1 window, 0 with drop_last
    with open(path, "w") as f:
        f.write(f">only\n{c1[:k]}\n")
    assert fastx.genome_kmers(path, k, mode="both", unique=False).size == 2
    assert fastx.genome_kmers(path, k, mode="both", unique=False,
                              drop_last=True).size == 0
