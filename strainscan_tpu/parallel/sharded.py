"""Multi-chip scale-out: sharded k-mer index + data-parallel read streams.

The reference is strictly single-node (SURVEY §2.3) — this module is the
TPU-native scale-out design mandated by BASELINE.json: the hash table is
sharded across devices along an ``index`` mesh axis (the capacity axis —
an E. coli-scale DB's k-mer table outgrows one chip's HBM), read batches
stream data-parallel along a ``data`` axis, and per-k-mer hit counts are
merged with ``psum`` over ICI.  Downstream L2 statistics (X^T y moments,
Gram matrices for the Elastic-Net) reduce over the sharded k-mer axis the
same way, so only O(strains) values ever cross chips.

Layout
------
* global k-mer array (sorted) is split into ``n_shards`` contiguous
  chunks; each chunk gets its own bucketed hash table, padded to the max
  shard table size so the stack is one rectangular array per field;
* ``codes`` [B, L] is sharded along ``data`` and replicated along
  ``index``; each (data, index) program probes its read block against its
  table shard;
* local counts [shard_capacity] are psum-reduced over ``data`` and stay
  sharded over ``index`` — exactly the layout the L2 matvecs want.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from strainscan_tpu.index.hashtable import BUCKET, KmerTable, lookup_device
from strainscan_tpu.kmer import device as kdev


def make_mesh(n_devices: Optional[int] = None,
              index_shards: Optional[int] = None) -> Mesh:
    """Mesh over ('data', 'index').  index axis defaults to 2 when the
    device count allows, else 1 (pure data parallelism)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if index_shards is None:
        index_shards = 2 if n % 2 == 0 and n >= 2 else 1
    data_shards = n // index_shards
    arr = np.array(devs[: data_shards * index_shards]).reshape(
        data_shards, index_shards)
    return Mesh(arr, ("data", "index"))


@dataclasses.dataclass
class ShardedTable:
    """Rectangular stack of per-shard hash tables + shard id offsets."""

    table: np.ndarray    # [n_shards, n_buckets, BUCKET*3] interleaved
    n_buckets: int       # per shard (uniform)
    max_probe: int       # max across shards
    shard_sizes: np.ndarray  # [n_shards] number of keys per shard
    shard_cap: int       # padded per-shard key capacity (id space stride)
    n_keys: int
    k: int
    # sharded slot -> caller id space (-1 = padding).  Lets a sharded count
    # vector map back onto an arbitrary external k-mer id order (e.g. a
    # converted reference DB's kmer.fa order).
    value_map: Optional[np.ndarray] = None

    @classmethod
    def build(cls, keys: np.ndarray, k: int, n_shards: int,
              values: Optional[np.ndarray] = None) -> "ShardedTable":
        """``keys`` in any order; ``values`` (default ``arange``) are the
        caller's global ids for each key.  Internally keys are sorted and
        split into contiguous shards (good hash-balance per shard)."""
        n = keys.shape[0]
        if values is None:
            values = np.arange(n, dtype=np.int32)
        order = np.argsort(keys, kind="stable")
        keys_sorted = keys[order]
        vals_sorted = values[order].astype(np.int32)
        cap = -(-max(n, 1) // n_shards)
        tables = []
        sizes = []
        value_map = np.full(n_shards * cap, -1, dtype=np.int32)
        for s in range(n_shards):
            chunk = keys_sorted[s * cap : (s + 1) * cap]
            sizes.append(chunk.size)
            tables.append(KmerTable.build(chunk, k=k))
            value_map[s * cap : s * cap + chunk.size] = (
                vals_sorted[s * cap : (s + 1) * cap])
        n_buckets = max(t.n_buckets for t in tables)
        max_probe = max(t.max_probe for t in tables)
        # rebuild smaller shards at the common bucket count so the stack is
        # rectangular and the mix/probe math is uniform
        for i, t in enumerate(tables):
            if t.n_buckets != n_buckets:
                chunk = keys_sorted[i * cap : (i + 1) * cap]
                # force the bucket count by lowering the load factor
                lf = max(len(chunk), 1) / (n_buckets * BUCKET)
                tables[i] = KmerTable.build(chunk, k=k, load_factor=lf)
                max_probe = max(max_probe, tables[i].max_probe)
        table = np.stack([t.interleaved() for t in tables])
        return cls(table=table,
                   n_buckets=n_buckets, max_probe=max_probe,
                   shard_sizes=np.array(sizes), shard_cap=cap, n_keys=n,
                   k=k, value_map=value_map)


def sharded_count(mesh: Mesh, st: ShardedTable, codes: jax.Array,
                  canonical: bool = False) -> jax.Array:
    """Counts [n_shards * shard_cap] (global id = shard * cap + local id),
    sharded over the 'index' axis; psum over 'data' merges read blocks.

    jit once per codes shape; shard_map places the collectives on ICI.
    """
    k = st.k
    n_buckets = st.n_buckets
    max_probe = st.max_probe
    cap = st.shard_cap

    def local(codes_blk, table):
        # codes_blk: [B/d, L]; table: [1, n_buckets, BUCKET*3] (this shard)
        hi, lo, valid = kdev.extract_kmers(codes_blk, k)
        if canonical:
            hi, lo = kdev.canonical(hi, lo, k)
        ids = lookup_device(table[0], n_buckets, max_probe, hi, lo)
        ids = jnp.where(valid, ids, -1).reshape(-1)
        safe = jnp.where(ids >= 0, ids, cap)
        counts = jnp.zeros((cap + 1,), jnp.int32).at[safe].add(
            jnp.ones_like(safe, dtype=jnp.int32), mode="drop")[:cap]
        counts = jax.lax.psum(counts, "data")
        return counts[None, :]

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("index", None, None)),
        out_specs=P("index", None),
    ))
    out = fn(codes, jnp.asarray(st.table))
    return out.reshape(-1)


class ShardedCountPipeline:
    """Multi-device drop-in for ops.count.CountPipeline: the hash table
    lives sharded over the mesh's ``index`` axis, read batches stream over
    ``data``, per-batch counts psum over ICI, and the running total stays
    device-resident until ``finish()``.

    ``finish()`` returns counts in the CALLER's k-mer id space (the
    ``values`` passed to ``ShardedTable.build``), so it is interchangeable
    with the single-device pipeline for any DB layout.
    """

    def __init__(self, keys: np.ndarray, k: int,
                 mesh: Optional[Mesh] = None,
                 values: Optional[np.ndarray] = None,
                 canonical: bool = False):
        self.mesh = mesh if mesh is not None else make_mesh()
        n_index = self.mesh.shape["index"]
        self.st = ShardedTable.build(keys, k=k, n_shards=n_index,
                                     values=values)
        self.canonical = canonical
        self._table_dev = None
        self._total = None
        self._fns = {}
        self._pad_cache = None

    def _fn(self, shape):
        if shape not in self._fns:
            st, mesh = self.st, self.mesh
            k, n_buckets, max_probe, cap = (st.k, st.n_buckets,
                                            st.max_probe, st.shard_cap)
            canonical = self.canonical

            def local(codes_blk, table, total_blk):
                hi, lo, valid = kdev.extract_kmers(codes_blk, k)
                if canonical:
                    hi, lo = kdev.canonical(hi, lo, k)
                ids = lookup_device(table[0], n_buckets, max_probe, hi, lo)
                ids = jnp.where(valid, ids, -1).reshape(-1)
                safe = jnp.where(ids >= 0, ids, cap)
                counts = jnp.zeros((cap + 1,), jnp.int32).at[safe].add(
                    jnp.ones_like(safe, dtype=jnp.int32),
                    mode="drop")[:cap]
                counts = jax.lax.psum(counts, "data")
                return total_blk + counts[None, :]

            self._fns[shape] = jax.jit(
                jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(P("data", None), P("index", None, None),
                              P("index", None)),
                    out_specs=P("index", None),
                ),
                donate_argnums=(2,),
            )
        return self._fns[shape]

    def add_batch(self, codes: np.ndarray) -> None:
        d = self.mesh.shape["data"]
        n_index = self.mesh.shape["index"]
        b = codes.shape[0]
        if b % d:        # pad the read batch to the data-axis multiple
            pad = d - b % d
            codes = np.concatenate(
                [codes, np.full((pad, codes.shape[1]), 4, codes.dtype)])
        if self._table_dev is None:
            self._table_dev = jax.device_put(
                self.st.table,
                NamedSharding(self.mesh, P("index", None, None)))
        if self._total is None:
            self._total = jax.device_put(
                np.zeros((n_index, self.st.shard_cap), np.int32),
                NamedSharding(self.mesh, P("index", None)))
        self._total = self._fn(codes.shape)(
            codes, self._table_dev, self._total)

    def reset(self) -> None:
        self._total = None

    def finish(self) -> np.ndarray:
        out = np.zeros(self.st.n_keys, dtype=np.int64)
        if self._total is None:
            return out
        flat = np.asarray(jax.device_get(self._total)).reshape(-1)
        vm = self.st.value_map
        valid = vm >= 0
        out[vm[valid]] = flat[valid]
        return out


def sharded_l2_stats(mesh: Mesh, X: jax.Array, y: jax.Array
                     ) -> Tuple[jax.Array, jax.Array]:
    """(X^T y, X^T X) with the k-mer axis sharded over the whole mesh.

    X: [n_kmers, s] float; y: [n_kmers] float, both sharded on axis 0.
    Returns replicated moments — the O(s) surface the host Enet consumes.
    """

    def local(Xb, yb):
        m = Xb.T @ yb
        g = Xb.T @ Xb
        m = jax.lax.psum(jax.lax.psum(m, "data"), "index")
        g = jax.lax.psum(jax.lax.psum(g, "data"), "index")
        return m, g

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(("data", "index"), None), P(("data", "index"))),
        out_specs=(P(None), P(None, None)),
    ))
    return fn(X, y)
