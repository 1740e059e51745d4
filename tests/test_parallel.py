"""Sharded counting / stats on the 8-virtual-device CPU mesh must equal the
single-device pipeline bit-for-bit."""

import jax
import numpy as np
import pytest

from strainscan_tpu.index.hashtable import KmerTable
from strainscan_tpu.kmer import pack
from strainscan_tpu.ops.count import CountPipeline
from strainscan_tpu.parallel import (ShardedTable, make_mesh, sharded_count,
                                     sharded_l2_stats)

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def problem():
    genome = "".join(RNG.choice(list("ACGT"), size=5000))
    db = pack.seq_kmer_set(genome, 31, both_strands=True)
    reads = []
    for _ in range(256):
        s = RNG.integers(0, len(genome) - 90)
        reads.append(genome[s : s + 90])
    codes = np.full((256, 96), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = pack.encode_seq(r)
    return db, codes


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "index")


def test_sharded_count_matches_single(problem):
    db, codes = problem
    mesh = make_mesh(8)
    n_index = mesh.shape["index"]
    st = ShardedTable.build(db, k=31, n_shards=n_index)
    out = np.asarray(jax.device_get(sharded_count(mesh, st, codes)))
    # single-device oracle
    t = KmerTable.build(db, k=31)
    pipe = CountPipeline(t)
    pipe.add_batch(codes)
    expect = pipe.finish()
    assert np.array_equal(out[: db.size], expect)
    assert out[db.size :].sum() == 0


def test_sharded_count_data_axis_only(problem):
    db, codes = problem
    mesh = make_mesh(8, index_shards=1)
    st = ShardedTable.build(db, k=31, n_shards=1)
    out = np.asarray(jax.device_get(sharded_count(mesh, st, codes)))
    t = KmerTable.build(db, k=31)
    pipe = CountPipeline(t)
    pipe.add_batch(codes)
    assert np.array_equal(out[: db.size], pipe.finish())


def test_sharded_l2_stats(problem):
    mesh = make_mesh(8)
    n, s = 4096, 6
    X = (RNG.random((n, s)) < 0.3).astype(np.float32)
    y = RNG.integers(0, 10, size=n).astype(np.float32)
    m, g = (np.asarray(x) for x in sharded_l2_stats(mesh, X, y))
    assert np.allclose(m, X.T @ y, rtol=1e-5)
    assert np.allclose(g, X.T @ X, rtol=1e-5)


def test_sharded_pipeline_matches_single(problem):
    """ShardedCountPipeline accumulates batches and returns counts in the
    caller's id space (here: sorted order, same as KmerTable.build)."""
    from strainscan_tpu.parallel.sharded import ShardedCountPipeline

    db, codes = problem
    table = KmerTable.build(db, k=31)
    single = CountPipeline(table)
    single.add_batch(codes[:128])
    single.add_batch(codes[128:])
    want = single.finish()

    pipe = ShardedCountPipeline(db, k=31, mesh=make_mesh(8))
    pipe.add_batch(codes[:128])
    pipe.add_batch(codes[128:])
    got = pipe.finish()
    assert np.array_equal(got, want)


def test_sharded_pipeline_permuted_values(problem):
    """An arbitrary external id order (converted-DB case) round-trips."""
    from strainscan_tpu.parallel.sharded import ShardedCountPipeline

    db, codes = problem
    perm = RNG.permutation(db.size).astype(np.int32)
    keys_perm = db[np.argsort(perm)]      # keys listed in permuted order
    pipe = ShardedCountPipeline(keys_perm, k=31, mesh=make_mesh(8))
    pipe.add_batch(codes)
    got = pipe.finish()

    table = KmerTable.build(db, k=31)
    single = CountPipeline(table)
    single.add_batch(codes)
    want = single.finish()
    # got[i] is the count of keys_perm[i]
    idx = np.searchsorted(db, keys_perm)
    assert np.array_equal(got, want[idx])


def test_sharded_pipeline_odd_batch(problem):
    """Batch sizes not divisible by the data axis are padded, not dropped."""
    from strainscan_tpu.parallel.sharded import ShardedCountPipeline

    db, codes = problem
    table = KmerTable.build(db, k=31)
    single = CountPipeline(table)
    single.add_batch(codes[:37])
    want = single.finish()
    pipe = ShardedCountPipeline(db, k=31, mesh=make_mesh(8))
    pipe.add_batch(codes[:37])
    assert np.array_equal(pipe.finish(), want)


def test_distributed_helpers_single_process():
    """Host-sharding helpers degrade to identity when not distributed."""
    from strainscan_tpu.parallel import distributed as dist

    idx, n = dist.process_info()
    assert (idx, n) == (0, 1)
    assert dist.shard_paths(["a.fq", "b.fq"]) == ["a.fq", "b.fq"]
    assert dist.shard_range(10) == (0, 10)
    import numpy as np

    c = np.arange(5)
    assert np.array_equal(np.asarray(dist.merge_counts(c)), c)
