"""Unit tests for host-side 2-bit k-mer packing against string oracles."""

import numpy as np
import pytest

from strainscan_tpu.kmer import pack


def _revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def _pack_str(s: str) -> int:
    v = 0
    for c in s:
        v = (v << 2) | "ACGT".index(c)
    return v


RNG = np.random.default_rng(0)


def _random_seq(n, alphabet="ACGT"):
    return "".join(RNG.choice(list(alphabet), size=n))


def test_encode_decode_roundtrip():
    s = "ACGTNacgtX"
    codes = pack.encode_seq(s)
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]


@pytest.mark.parametrize("k", [5, 16, 21, 31])
def test_pack_matches_string_oracle(k):
    s = _random_seq(200)
    km, valid = pack.pack_kmers(pack.encode_seq(s), k)
    assert valid.all()
    for i in range(0, len(s) - k + 1, 17):
        assert int(km[i]) == _pack_str(s[i : i + k])


def test_invalid_windows_masked():
    s = "ACGTACGTACGTNACGTACGTACGTACGT"
    k = 5
    km, valid = pack.pack_kmers(pack.encode_seq(s), k)
    n_pos = s.index("N")
    for i in range(len(s) - k + 1):
        expect = not (i <= n_pos <= i + k - 1)
        assert valid[i] == expect


@pytest.mark.parametrize("k", [5, 16, 31])
def test_revcomp_matches_string_oracle(k):
    s = _random_seq(100)
    km, _ = pack.pack_kmers(pack.encode_seq(s), k)
    rc = pack.revcomp_packed(km, k)
    for i in range(0, len(s) - k + 1, 7):
        assert pack.decode_kmer(int(rc[i]), k) == _revcomp_str(s[i : i + k])


def test_revcomp_involution():
    k = 31
    s = _random_seq(500)
    km, _ = pack.pack_kmers(pack.encode_seq(s), k)
    assert np.array_equal(pack.revcomp_packed(pack.revcomp_packed(km, k), k), km)


def test_canonical_is_min():
    k = 31
    s = _random_seq(300)
    km, _ = pack.pack_kmers(pack.encode_seq(s), k)
    rc = pack.revcomp_packed(km, k)
    can = pack.canonical_packed(km, k)
    assert np.array_equal(can, np.minimum(km, rc))


def test_decode_kmer_roundtrip():
    k = 31
    s = _random_seq(k)
    km, _ = pack.pack_kmers(pack.encode_seq(s), k)
    assert pack.decode_kmer(int(km[0]), k) == s


def test_seq_kmer_set_both_strands():
    k = 7
    s = _random_seq(50)
    km = pack.seq_kmer_set(s, k, both_strands=True)
    fwd, valid = pack.pack_kmers(pack.encode_seq(s), k)
    expect = np.unique(
        np.concatenate([fwd[valid], pack.revcomp_packed(fwd[valid], k)])
    )
    assert np.array_equal(km, expect)


def test_split_join_u32():
    x = RNG.integers(0, 2**62, size=100, dtype=np.uint64)
    hi, lo = pack.split_u64(x)
    assert np.array_equal(pack.join_u32(hi, lo), x)


def test_valid_prefix_lens():
    from strainscan_tpu.kmer import pack

    # prefix-run validity (padded reads, no N): lens returned
    codes = np.full((3, 10), 4, dtype=np.uint8)
    codes[0, :7] = 1
    codes[1, :10] = 2
    codes[2, :0] = 0
    lens = pack.valid_prefix_lens(codes)
    assert lens is not None and lens.tolist() == [7, 10, 0]
    # an N mid-read breaks the prefix form -> None (vbytes fallback)
    codes[0, 3] = 4
    assert pack.valid_prefix_lens(codes) is None


def test_bitpack_codes_vlen_fused():
    """The fused native (words, vlen) pass must equal the two-pass NumPy
    flow bit-for-bit and refuse mid-read Ns."""
    from strainscan_tpu import native
    from strainscan_tpu.kmer import pack

    if native.get_lib() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    codes = np.full((37, 53), 4, dtype=np.uint8)
    for i in range(37):
        n = int(rng.integers(0, 54))
        codes[i, :n] = rng.integers(0, 4, size=n)
    fused = pack.bitpack_codes_vlen(codes)
    assert fused is not None
    words_ref, _ = pack.bitpack_codes(codes)
    vlen_ref = pack.valid_prefix_lens(codes)
    assert np.array_equal(fused[0], words_ref)
    assert np.array_equal(fused[1], vlen_ref)
    dirty = codes.copy()
    dirty[3, 0] = 1
    dirty[3, 1] = 4
    dirty[3, 2] = 2  # mid-row invalid
    assert pack.bitpack_codes_vlen(dirty) is None


def test_vlen_and_vbytes_pipelines_agree():
    """A batch with a mid-read N must take the vbytes path and count
    identically to the same reads with the N zone excluded."""
    import jax.numpy as jnp

    from strainscan_tpu.index.hashtable import KmerTable
    from strainscan_tpu.kmer import pack
    from strainscan_tpu.ops.count import CountPipeline

    rng = np.random.default_rng(8)
    genome = rng.integers(0, 4, size=5000).astype(np.uint8)
    km, _ = pack.pack_kmers(genome, 31)
    db = np.unique(km)
    t = KmerTable.build(db, k=31)

    codes = np.full((64, 80), 4, dtype=np.uint8)
    for i in range(64):
        p = int(rng.integers(0, genome.size - 72))
        codes[i, :72] = genome[p : p + 72]
    dirty = codes.copy()
    dirty[5, 40] = 4  # N mid-read -> prefix form impossible
    assert pack.valid_prefix_lens(codes) is not None
    assert pack.valid_prefix_lens(dirty) is None

    def run(c):
        p = CountPipeline(t)
        p.add_batch(c)
        return p.finish()

    clean = run(codes)
    got = run(dirty)
    # oracle for the dirty batch: NumPy window count with the N masked
    exp = np.zeros(db.size, np.int64)
    for i in range(64):
        row = dirty[i]
        for j in range(80 - 31 + 1):
            w = row[j : j + 31]
            if (w >= 4).any():
                continue
            v = 0
            for c in w:
                v = (v << 2) | int(c)
            idx = np.searchsorted(db, np.uint64(v))
            if idx < db.size and db[idx] == np.uint64(v):
                exp[idx] += 1
    assert np.array_equal(got, exp)
    assert got.sum() < clean.sum()


def test_decode_kmers_batch_and_fa(tmp_path):
    rng = np.random.default_rng(11)
    k = 31
    km = rng.integers(0, 1 << 62, size=1000, dtype=np.uint64)
    km &= (np.uint64(1) << np.uint64(2 * k)) - np.uint64(1)
    rows = pack.decode_kmers(km, k)
    assert rows.shape == (1000, k)
    for i in [0, 17, 999]:
        assert rows[i].tobytes().decode() == pack.decode_kmer(int(km[i]), k)
    fa = tmp_path / "kmer.fa"
    pack.write_kmer_fa(str(fa), km, k)
    lines = fa.read_bytes().decode().splitlines()
    assert len(lines) == 2000
    assert lines[0] == ">1"
    assert lines[3] == pack.decode_kmer(int(km[1]), k)


def test_sort_unique_and_lookup_u64():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 1 << 62, size=300_000, dtype=np.uint64)
    arr = np.concatenate([arr, arr[:50_000]])          # force duplicates
    expect = np.unique(arr)
    got = pack.sort_unique_u64(arr.copy())
    assert np.array_equal(got, expect)
    # lookup over sorted subsets reproduces searchsorted ids
    sub = np.unique(rng.choice(expect, size=80_000, replace=False))
    ids = pack.lookup_sorted_u64(expect, sub)
    assert ids.dtype == np.int32
    assert np.array_equal(ids, np.searchsorted(expect, sub).astype(np.int32))
    # empty inputs
    assert pack.sort_unique_u64(np.empty(0, np.uint64)).size == 0
    assert pack.lookup_sorted_u64(expect, np.empty(0, np.uint64)).size == 0
    # a value outside the universe must raise, not alias
    missing = expect[12] + np.uint64(1)
    if missing not in expect:
        with pytest.raises(AssertionError):
            pack.lookup_sorted_u64(expect, np.array([missing], np.uint64))
    # edge values: below min and above max
    with pytest.raises(AssertionError):
        pack.lookup_sorted_u64(
            expect, np.array([expect[-1] + np.uint64(1)], np.uint64))


def test_sorted_intersect_diff():
    rng = np.random.default_rng(9)
    for dtype, hi in ((np.int32, 1 << 30), (np.uint64, 1 << 60)):
        for na, nb in [(0, 10), (10, 0), (1000, 1000), (100_000, 50),
                       (50, 100_000), (7, 7)]:
            a = np.unique(rng.integers(0, hi, size=na).astype(dtype))
            b = np.unique(rng.integers(0, hi, size=nb).astype(dtype))
            # overlap half of a into b so intersections are non-trivial
            if a.size and b.size:
                b = np.unique(np.concatenate([b, a[::2]]))
            assert np.array_equal(
                pack.sorted_intersect(a, b),
                np.intersect1d(a, b, assume_unique=True))
            assert np.array_equal(
                pack.sorted_diff(a, b),
                np.setdiff1d(a, b, assume_unique=True))


def test_merge_unique_sorted_u64():
    rng = np.random.default_rng(13)
    pool = np.unique(rng.integers(0, 1 << 62, size=200_000, dtype=np.uint64))
    arrays = [np.unique(rng.choice(pool, size=rng.integers(1, 5000)))
              for _ in range(150)]
    arrays += [np.empty(0, np.uint64), np.unique(rng.choice(pool, 50_000))]
    got = pack.merge_unique_sorted_u64(arrays)
    expect = np.unique(np.concatenate(arrays))
    assert np.array_equal(got, expect)
    assert pack.merge_unique_sorted_u64([]).size == 0
    one = np.unique(rng.choice(pool, 100))
    assert np.array_equal(pack.merge_unique_sorted_u64([one]), one)
