"""Pallas probe-prep kernel vs the jnp/NumPy oracles (interpret mode on the
CPU test mesh; the same kernel compiles for TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from strainscan_tpu.index.hashtable import (FpTable, fp2_np, mix_seeded_np,
                                            lookup_fp_device)  # noqa: E402
from strainscan_tpu.kmer import device as kdev  # noqa: E402
from strainscan_tpu.kmer import pack  # noqa: E402
from strainscan_tpu.ops.pallas_probe import (lookup_fp_from_prep,
                                             probe_prep)  # noqa: E402


def _random_codes(rng, b, length, n_frac=0.05):
    codes = rng.integers(0, 4, size=(b, length)).astype(np.uint8)
    mask = rng.random((b, length)) < n_frac
    codes[mask] = 4
    return codes


@pytest.mark.parametrize("k", [31, 21, 15])
def test_probe_prep_matches_extract_and_hash(k):
    rng = np.random.default_rng(0)
    b, length = 16, 64
    codes = _random_codes(rng, b, length)
    n_buckets, seed = 1 << 12, 3

    bucket, fp = probe_prep(jnp.asarray(codes), k=k, n_buckets=n_buckets,
                            seed=seed, interpret=True)
    bucket, fp = np.asarray(bucket), np.asarray(fp)

    hi, lo, valid = kdev.extract_kmers(codes, k)
    hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
    exp_bucket = (mix_seeded_np(hi, lo, seed).astype(np.int64)
                  & (n_buckets - 1)).astype(np.int32)
    exp_fp = fp2_np(hi, lo)

    assert bucket.shape == (b, length - k + 1)
    np.testing.assert_array_equal(bucket[valid], exp_bucket[valid])
    np.testing.assert_array_equal(fp[valid], exp_fp[valid])
    assert (bucket[~valid] == -1).all()


@pytest.mark.parametrize("k", [31, 16])
def test_probe_prep_canonical_matches_device_canonicalize(k):
    rng = np.random.default_rng(2)
    b, length = 16, 64
    codes = _random_codes(rng, b, length)
    n_buckets, seed = 1 << 10, 0

    bucket, fp = probe_prep(jnp.asarray(codes), k=k, n_buckets=n_buckets,
                            seed=seed, canonical=True, interpret=True)
    bucket, fp = np.asarray(bucket), np.asarray(fp)

    hi, lo, valid = kdev.extract_kmers(codes, k)
    chi, clo = kdev.canonical(hi, lo, k)
    chi, clo, valid = np.asarray(chi), np.asarray(clo), np.asarray(valid)
    exp_bucket = (mix_seeded_np(chi, clo, seed).astype(np.int64)
                  & (n_buckets - 1)).astype(np.int32)
    exp_fp = fp2_np(chi, clo)

    np.testing.assert_array_equal(bucket[valid], exp_bucket[valid])
    np.testing.assert_array_equal(fp[valid], exp_fp[valid])
    assert (bucket[~valid] == -1).all()


def test_probe_prep_plus_lookup_matches_host_oracle():
    k = 31
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, size=4000).astype(np.uint8)
    km, _ = pack.pack_kmers(genome, k)
    db = np.unique(km)
    table = FpTable.build(db, k=k)

    codes = np.full((8, 80), 4, np.uint8)
    for i in range(8):
        st = int(rng.integers(0, genome.size - 72))
        codes[i, :72] = genome[st:st + 72]

    bucket, fp = probe_prep(jnp.asarray(codes), k=k,
                            n_buckets=table.n_buckets, seed=table.seed,
                            interpret=True)
    slots = np.asarray(lookup_fp_from_prep(
        table.device_arrays(), bucket, fp, table.bucket))

    hi, lo, valid = (np.asarray(x) for x in kdev.extract_kmers(codes, k))
    keys = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    exp = table.lookup_host(keys.reshape(-1)).reshape(hi.shape)
    exp[~valid] = -1

    np.testing.assert_array_equal(slots, exp)
    # reference path agreement, too
    ref = np.array(lookup_fp_device(
        table.device_arrays(), table.n_buckets, table.bucket, table.seed,
        jnp.asarray(hi), jnp.asarray(lo)))
    ref[~valid] = -1
    np.testing.assert_array_equal(slots, ref)
