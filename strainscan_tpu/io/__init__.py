from strainscan_tpu.io.fastx import (  # noqa: F401
    read_fasta,
    read_batches,
    genome_kmers,
    list_genomes,
    genome_prefix,
)
