from strainscan_tpu.kmer.pack import (  # noqa: F401
    encode_seq,
    decode_kmer,
    pack_kmers,
    revcomp_packed,
    canonical_packed,
    split_u64,
    join_u32,
    seq_kmer_set,
)
