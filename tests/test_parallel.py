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


def test_sharded_finish_uint16_overflow(problem):
    """Counts >= 2^16 must survive the compact d2h fetch bit-exactly.

    The finish path picks uint8/uint16/sparse encodings from device-side
    stats (ops.count.fetch_counts, shared by the sharded finish); a slot
    counted >65535 times must force the int32 fallback on BOTH paths.
    Poly-A reads hammer one k-mer ~16.9k times per batch; four batches
    push it past 2^16."""
    from strainscan_tpu.parallel.sharded import ShardedCountPipeline

    db, _ = problem
    polyA = pack.seq_kmer_set("A" * 40, 31, both_strands=True)
    keys = np.unique(np.concatenate([db, polyA]))
    codes = np.zeros((256, 96), dtype=np.uint8)  # all-A reads

    table = KmerTable.build(keys, k=31)
    single = CountPipeline(table)
    for _ in range(4):
        single.add_batch(codes)
    want = single.finish()
    assert want.max() > 65535, "fixture must actually overflow uint16"

    pipe = ShardedCountPipeline(keys, k=31, mesh=make_mesh(8))
    for _ in range(4):
        pipe.add_batch(codes)
    got = pipe.finish()
    assert np.array_equal(got, want)


def test_sharded_pipeline_large_uneven_table():
    """>=1M-key table on the 8-device mesh (round-3 VERDICT weak #5):
    exercises real shard geometry — an ODD key count makes the last shard
    one key short of shard_cap, so value_map padding, per-shard fp
    geometry, and the slot->id remap all run off the toy regime."""
    from strainscan_tpu.parallel.sharded import ShardedCountPipeline

    rng = np.random.default_rng(99)
    genome = "".join(rng.choice(list("ACGT"), size=5000))
    hit_keys = pack.seq_kmer_set(genome, 31, both_strands=True)
    filler = rng.integers(0, 1 << 62, size=1_100_000, dtype=np.uint64)
    keys = np.unique(np.concatenate([hit_keys, filler]))
    if keys.size % 2 == 0:          # force uneven shards at index=2
        keys = keys[1:]
    assert keys.size >= 1_000_000 and keys.size % 2 == 1

    codes = np.full((256, 96), 4, dtype=np.uint8)
    for i in range(256):
        s = int(rng.integers(0, len(genome) - 90))
        codes[i, :90] = pack.encode_seq(genome[s : s + 90])

    table = KmerTable.build(keys, k=31)
    single = CountPipeline(table)
    single.add_batch(codes)
    want = single.finish()
    assert want.sum() > 0

    mesh = make_mesh(8)
    assert mesh.shape["index"] == 2
    pipe = ShardedCountPipeline(keys, k=31, mesh=mesh)
    assert pipe.st.shard_cap * 2 != keys.size  # padding actually exercised
    pipe.add_batch(codes)
    got = pipe.finish()
    assert np.array_equal(got, want)


def test_sharded_cache_content_keyed(problem):
    """A rebuilt-but-equal key array must HIT the pipeline cache (round-4
    VERDICT weak #5: vote rebuilds the L2 union per sample, and an
    identity-keyed cache re-ran the joint-seed ShardedFpTable.build every
    time)."""
    from strainscan_tpu.config import IdentifyConfig
    from strainscan_tpu.identify import count as icount

    db, _ = problem
    keys1 = np.sort(np.fromiter(db, dtype=np.uint64))
    keys2 = keys1.copy()          # equal content, distinct array object
    assert keys1 is not keys2
    table = KmerTable.build(keys1, k=31)
    cfg = IdentifyConfig()
    icount._SHARDED_CACHE.clear()
    p1 = icount._sharded_pipeline(keys1, table, False, cfg)
    p2 = icount._sharded_pipeline(keys2, table, False, cfg)
    assert p2 is p1
    # identity fast path still works and refreshes the LRU entry
    p3 = icount._sharded_pipeline(keys2, table, False, cfg)
    assert p3 is p1
    # different content -> different pipeline
    keys3 = keys1[:-1].copy()
    table3 = KmerTable.build(keys3, k=31)
    p4 = icount._sharded_pipeline(keys3, table3, False, cfg)
    assert p4 is not p1
    icount._SHARDED_CACHE.clear()


def test_sharded_cache_eviction_closes(problem):
    """Evicted pipelines must release their device buffers eagerly."""
    from strainscan_tpu.config import IdentifyConfig
    from strainscan_tpu.identify import count as icount

    db, codes = problem
    keys = np.sort(np.fromiter(db, dtype=np.uint64))
    table = KmerTable.build(keys, k=31)
    cfg = IdentifyConfig()
    icount._SHARDED_CACHE.clear()
    pipes = []
    for i in range(icount._SHARDED_CACHE_MAX + 1):
        kv = keys[: keys.size - i].copy()
        tv = KmerTable.build(kv, k=31)
        p = icount._sharded_pipeline(kv, tv, False, cfg)
        p.add_batch(codes)        # materialize device buffers
        pipes.append(p)
    assert len(icount._SHARDED_CACHE) == icount._SHARDED_CACHE_MAX
    evicted = pipes[0]
    assert evicted._table_dev is None and evicted._total is None
    assert evicted._fns == {} and evicted._fin is None
    # a pipeline re-pins its batch shape after reset (ADVICE count.py:64)
    kept = pipes[-1]
    assert kept._shape is not None
    kept.reset()
    assert kept._shape is None and kept._total is None
    icount._SHARDED_CACHE.clear()


def test_sharded_cache_identity_respects_canonical(problem):
    """The identity fast path must not reuse a pipeline across a
    canonical-flag change (different probe semantics)."""
    from strainscan_tpu.config import IdentifyConfig
    from strainscan_tpu.identify import count as icount

    db, _ = problem
    keys = np.sort(np.fromiter(db, dtype=np.uint64))
    table = KmerTable.build(keys, k=31)
    cfg = IdentifyConfig()
    icount._SHARDED_CACHE.clear()
    p1 = icount._sharded_pipeline(keys, table, False, cfg)
    p2 = icount._sharded_pipeline(keys, table, True, cfg)
    assert p2 is not p1
    assert p2.canonical and not p1.canonical
    icount._SHARDED_CACHE.clear()


def test_sharded_pipeline_three_device_mesh(problem):
    """Odd device count (3 -> data=3, index=1): row padding to a
    non-power-of-two multiple, per-device plain-transfer assembly, and
    the index all_gather must stay bit-exact."""
    from strainscan_tpu.parallel import ShardedCountPipeline, make_mesh

    db, codes = problem
    keys = np.sort(np.fromiter(db, dtype=np.uint64))
    table = KmerTable.build(keys, k=31)
    single = CountPipeline(table)
    single.add_batch(codes)
    want = np.asarray(single.finish(), np.int64)

    mesh = make_mesh(3)
    assert mesh.shape["data"] * mesh.shape["index"] == 3
    pipe = ShardedCountPipeline(keys, k=31, mesh=mesh)
    for payloads in [pipe.ship(pipe.prepare_batch(codes))]:
        pipe.add_prepared(payloads)
    got = np.asarray(pipe.finish(), np.int64)
    assert np.array_equal(got, want)
