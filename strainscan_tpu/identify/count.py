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


def count_sample(
    table: KmerTable,
    fq_paths: PathLike,
    cfg: IdentifyConfig = IdentifyConfig(),
    canonical: bool = False,
    use_native: bool = True,
) -> np.ndarray:
    """Stream the sample through the device count pipeline."""
    pipe = CountPipeline(table, canonical=canonical)
    for batch in fastx.read_batches(
        fq_paths, batch=cfg.read_batch, maxlen=cfg.max_read_len,
        k=table.k, use_native=use_native,
    ):
        pipe.add_batch(batch)
    return pipe.finish()
