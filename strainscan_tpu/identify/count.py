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
# Entries hold the keys ARRAY (identity-checked and kept alive — a bare
# data-pointer key could alias a recycled buffer).
_SHARDED_CACHE: list = []
_SHARDED_CACHE_MAX = 2


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

    if (keys is not None and jax.device_count() > 1
            and keys.size >= cfg.shard_min_kmers):
        from strainscan_tpu.parallel.sharded import ShardedCountPipeline

        # pipeline cache: repeat samples against the cached TreeDB reuse
        # the sharded fp build and the device-resident table +
        # slot_of_id (114 MB h2d each at E. coli scale) instead of
        # re-deriving per sample.  Hits require the SAME keys array
        # object and the same batch geometry (the pipeline pins its
        # first-seen batch shape, so a different max_read_len must get a
        # fresh pipeline).
        cfg_key = (table.k, canonical, cfg.max_read_len, cfg.read_batch)
        pipe = None
        for i, (ckeys, cmeta, cpipe) in enumerate(_SHARDED_CACHE):
            if ckeys is keys and cmeta == cfg_key:
                pipe = cpipe
                _SHARDED_CACHE.insert(0, _SHARDED_CACHE.pop(i))
                pipe.reset()
                break
        if pipe is None:
            pipe = ShardedCountPipeline(keys, k=table.k,
                                        canonical=canonical)
            _SHARDED_CACHE.insert(0, (keys, cfg_key, pipe))
            del _SHARDED_CACHE[_SHARDED_CACHE_MAX:]
    else:
        pipe = CountPipeline(table, canonical=canonical)
    # Multi-host (jax.distributed up): each host streams every Nth read
    # batch — deterministic, no duplicated reads — and the per-host count
    # vectors merge once over DCN (SURVEY §2.3 TPU-native scale-out).
    from strainscan_tpu.parallel import distributed as dist

    from strainscan_tpu.utils.prefetch import prefetch_iter

    pidx, pcount = dist.process_info()
    batches = fastx.read_batches(
        fq_paths, batch=cfg.read_batch, maxlen=cfg.max_read_len,
        k=table.k, use_native=use_native)
    if hasattr(pipe, "prepare_batch"):
        # parse + pack in the producer thread, dispatch on the main thread
        def produce():
            for bi, batch in enumerate(batches):
                if bi % pcount != pidx:
                    continue
                yield pipe.prepare_batch(batch)

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
