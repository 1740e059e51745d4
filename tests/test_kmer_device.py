"""Device k-mer extraction must agree with host packing bit-for-bit."""

import numpy as np

from strainscan_tpu.kmer import device as kdev
from strainscan_tpu.kmer import pack

RNG = np.random.default_rng(1)


def _random_reads(n, length, n_rate=0.0):
    codes = RNG.integers(0, 4, size=(n, length)).astype(np.uint8)
    if n_rate:
        mask = RNG.random((n, length)) < n_rate
        codes[mask] = 4
    return codes


def test_extract_matches_host():
    k = 31
    codes = _random_reads(16, 100, n_rate=0.02)
    hi, lo, valid = (np.asarray(x) for x in kdev.extract_kmers(codes, k))
    for r in range(16):
        km, v = pack.pack_kmers(codes[r], k)
        got = pack.join_u32(hi[r], lo[r])
        assert np.array_equal(v, valid[r])
        assert np.array_equal(got[v], km[v])


def test_extract_small_k():
    k = 9
    codes = _random_reads(4, 40)
    hi, lo, valid = (np.asarray(x) for x in kdev.extract_kmers(codes, k))
    assert (hi == 0).all()
    for r in range(4):
        km, v = pack.pack_kmers(codes[r], k)
        assert np.array_equal(pack.join_u32(hi[r], lo[r])[v], km[v])


def test_device_revcomp_matches_host():
    k = 31
    codes = _random_reads(8, 64)
    hi, lo, _ = kdev.extract_kmers(codes, k)
    rhi, rlo = (np.asarray(x) for x in kdev.revcomp(hi, lo, k))
    for r in range(8):
        km, _ = pack.pack_kmers(codes[r], k)
        expect = pack.revcomp_packed(km, k)
        assert np.array_equal(pack.join_u32(rhi[r], rlo[r]), expect)


def test_device_canonical_matches_host():
    k = 31
    codes = _random_reads(8, 64)
    hi, lo, _ = kdev.extract_kmers(codes, k)
    chi, clo = (np.asarray(x) for x in kdev.canonical(hi, lo, k))
    for r in range(8):
        km, _ = pack.pack_kmers(codes[r], k)
        expect = pack.canonical_packed(km, k)
        assert np.array_equal(pack.join_u32(chi[r], clo[r]), expect)


def test_fetch_counts_encodings():
    """fetch_counts must be bit-exact with a plain dense device_get across
    its three encodings (sparse, uint16-dense, int32-dense)."""
    import jax.numpy as jnp

    from strainscan_tpu.ops.count import fetch_counts

    rng = np.random.default_rng(3)
    n = 100_000
    # sparse + small values
    a = np.zeros(n, np.int32)
    idx = rng.choice(n, size=500, replace=False)
    a[idx] = rng.integers(1, 60000, size=500)
    assert np.array_equal(fetch_counts(jnp.asarray(a), n), a)
    # sparse + one huge value (forces int32 values)
    b = a.copy()
    b[idx[0]] = 1 << 20
    assert np.array_equal(fetch_counts(jnp.asarray(b), n), b)
    # dense small values -> uint16 fetch
    c = rng.integers(0, 65535, size=n).astype(np.int32)
    assert np.array_equal(fetch_counts(jnp.asarray(c), n), c)
    # dense with large values -> plain int32
    d = c.copy()
    d[7] = 1 << 30
    assert np.array_equal(fetch_counts(jnp.asarray(d), n), d)
    # all-zero
    z = np.zeros(n, np.int32)
    assert np.array_equal(fetch_counts(jnp.asarray(z), n), z)


def test_fetch_counts_dtype_boundaries():
    """Exact behavior at the uint8/uint16 encoding boundaries."""
    import jax.numpy as jnp

    from strainscan_tpu.ops.count import fetch_counts

    n = 4096
    for boundary in (255, 256, 65535, 65536):
        a = np.zeros(n, np.int32)
        a[0] = boundary
        a[1] = 1
        assert np.array_equal(fetch_counts(jnp.asarray(a), n), a), boundary
        d = np.full(n, boundary, np.int32)
        assert np.array_equal(fetch_counts(jnp.asarray(d), n), d), boundary
