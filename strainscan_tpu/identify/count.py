"""Sample counting: FASTQ -> per-DB-k-mer hit counts (jellyfish replacement).

The device pipeline (strainscan_tpu/ops/count.py) replaces
``jellyfish count --if kmer.fa <fastq>`` + ``dump -c``
(reference library/identify.py:73-103).  Counts are dense int32 arrays over
the table's k-mer id space; dump semantics (0-count entries included) fall
out naturally.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from strainscan_tpu.config import IdentifyConfig
from strainscan_tpu.index.hashtable import KmerTable
from strainscan_tpu.io import fastx
from strainscan_tpu.ops.count import CountPipeline

PathLike = Union[str, Sequence[str]]

# Tiny LRU of ShardedCountPipelines (see count_sample): 2 entries so the
# big main-table pipeline survives the per-sample L2-union pipeline.
# Entries are CONTENT-keyed — (n, k, geometry, keys_checksum) — so a
# rebuilt-but-equal key array (e.g. vote's per-sample L2 union of the
# same detected clusters) hits the cache instead of re-running the
# joint-seed ShardedFpTable.build every sample (round-4 VERDICT weak #5).
# The first-seen keys array is kept alive for the cheap identity
# fast-path check.
_SHARDED_CACHE: list = []
_SHARDED_CACHE_MAX = 2


def _sharded_cache_key(keys: np.ndarray, table: KmerTable, canonical: bool,
                       cfg: IdentifyConfig):
    from strainscan_tpu.index.hashtable import keys_checksum

    return (keys.size, table.k, canonical, cfg.max_read_len,
            cfg.read_batch, keys_checksum(keys))


def _sharded_pipeline(keys: np.ndarray, table: KmerTable, canonical: bool,
                      cfg: IdentifyConfig):
    """Cached ShardedCountPipeline for this key set (content-keyed LRU)."""
    from strainscan_tpu.parallel.sharded import ShardedCountPipeline

    # identity fast path still checks the SEMANTIC fields (k, canonical)
    # — the same array probed with a different canonicalization must not
    # reuse a pipeline; batch geometry re-pins on reset() so it is not
    # part of identity
    for i, (ckeys, cmeta, cpipe) in enumerate(_SHARDED_CACHE):
        if ckeys is keys and cmeta[1] == table.k and cmeta[2] == canonical:
            _SHARDED_CACHE.insert(0, _SHARDED_CACHE.pop(i))
            cpipe.reset()
            return cpipe
    cfg_key = _sharded_cache_key(keys, table, canonical, cfg)
    for i, (ckeys, cmeta, cpipe) in enumerate(_SHARDED_CACHE):
        if cmeta == cfg_key:
            _SHARDED_CACHE.insert(0, _SHARDED_CACHE.pop(i))
            # keep the new array alive under the entry (the old one may
            # be garbage; the checksum already proved content equality)
            _SHARDED_CACHE[0] = (keys, cmeta, cpipe)
            cpipe.reset()
            return cpipe
    pipe = ShardedCountPipeline(keys, k=table.k, canonical=canonical)
    _SHARDED_CACHE.insert(0, (keys, cfg_key, pipe))
    evicted = _SHARDED_CACHE[_SHARDED_CACHE_MAX:]
    del _SHARDED_CACHE[_SHARDED_CACHE_MAX:]
    for _, _, old in evicted:
        old.close()   # free HBM now, not at GC time
    return pipe


def count_sample(
    table: KmerTable,
    fq_paths: PathLike,
    cfg: IdentifyConfig = IdentifyConfig(),
    canonical: bool = False,
    use_native: bool = True,
    keys: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Stream the sample through the device count pipeline.

    With >1 visible device, the DB's key array supplied, AND a table big
    enough to be worth sharding (``cfg.shard_min_kmers`` — sharding a
    tiny L2 table would only add collective latency), the hash table is
    sharded over the mesh's ``index`` axis and batches stream
    data-parallel (SURVEY §2.3 TPU-native scale-out); otherwise the fused
    single-device pipeline runs.  Both return counts in the table's id
    space.
    """
    import jax

    from strainscan_tpu.parallel import distributed as dist

    pidx, pcount = dist.process_info()
    # The sharded pipeline is single-process only: its finish() runs a
    # device_put gather of the mesh-sharded result onto one device, which
    # raises on non-addressable shards.  Multi-host runs use the
    # batch-modulo split + DCN merge below with per-host single-device
    # pipelines (round-4 ADVICE sharded.py:450).
    if (keys is not None and pcount == 1 and jax.device_count() > 1
            and keys.size >= cfg.shard_min_kmers):
        # pipeline cache: repeat samples against the cached TreeDB (or a
        # rebuilt-but-equal L2 union) reuse the sharded fp build and the
        # device-resident table + slot_of_id (114 MB h2d each at E. coli
        # scale) instead of re-deriving per sample.
        pipe = _sharded_pipeline(keys, table, canonical, cfg)
    else:
        pipe = CountPipeline(table, canonical=canonical)
    # Multi-host (jax.distributed up): each host streams every Nth read
    # batch — deterministic, no duplicated reads — and the per-host count
    # vectors merge once over DCN (SURVEY §2.3 TPU-native scale-out).
    from strainscan_tpu.utils.prefetch import prefetch_iter
    batches = fastx.read_batches(
        fq_paths, batch=cfg.read_batch, maxlen=cfg.max_read_len,
        k=table.k, use_native=use_native)
    if hasattr(pipe, "prepare_batch"):
        # parse + pack (and, on the sharded pipeline, the h2d ship) in
        # the producer thread; the main thread only dispatches — so the
        # host->device transfer overlaps device compute
        ship = getattr(pipe, "ship", None)

        def produce():
            for bi, batch in enumerate(batches):
                if bi % pcount != pidx:
                    continue
                payloads = pipe.prepare_batch(batch)
                yield ship(payloads) if ship is not None else payloads

        for payloads in prefetch_iter(produce()):
            pipe.add_prepared(payloads)
    else:
        for bi, batch in enumerate(prefetch_iter(batches)):
            if bi % pcount != pidx:
                continue
            pipe.add_batch(batch)
    counts = pipe.finish()
    if pcount > 1:
        counts = np.asarray(dist.merge_counts(counts))
    return counts
