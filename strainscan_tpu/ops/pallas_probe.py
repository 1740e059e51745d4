"""Pallas TPU kernel for the count hot path's VPU stage.

The fused restricted-count pipeline (strainscan_tpu/ops/count.py, the
jellyfish-equivalent of reference library/identify.py:73-103) decomposes
per read batch into

  1. window extraction + hashing   (pure VPU arithmetic)   <- THIS KERNEL
  2. one fingerprint-row gather    (XLA gather unit)
  3. one scatter-add into counts   (XLA scatter unit)

Stages 2 and 3 are row/update-count-bound on the TPU's hardware
scatter/gather units; the round-3 study (benchmarks/PROBE_STUDY*.json)
showed the gather's cost is per ROW, almost independent of row WIDTH, so
the production FpTable uses 256 B rows (bucket=64) — see
index/hashtable.py — and the remaining wall is the flat ~94 M upd/s
scatter.  Round 4 measured the two remaining alternatives
(benchmarks/PROBE_STUDY3.json): (a) a double-buffered
``pltpu.make_async_copy`` row-gather pipeline tops out at 40.7 M rows/s
vs XLA's 87.6 M at the same 512 B-row geometry — per-row DMA issue from
the scalar core is the cap, and Mosaic cannot even slice the production
256 B row (128-lane minimum); (b) multiplicity-compressed scatter
(sort + run-length compact + smaller scatter) LOSES to the plain
scatter even at synthetic slot multiplicity 64 (81.6 vs 93.4 M win/s;
46.6 vs 92.8 at mult 8) — the sort is cheap (~383 M elem/s) but the
run-compaction (``jnp.nonzero``) costs more than the updates it saves,
and real identify batches sit at multiplicity ~1.1-1.3 anyway.  Both
XLA units stand as the measured bound for this workload.  Stage 1 is where a hand-fused kernel
helps: one VMEM
pass produces every window's (bucket, fingerprint) pair straight from the
2-bit read codes, instead of materializing hi/lo k-mer halves through HBM.

The kernel reproduces, bit-for-bit, the composition of
``kmer.device.extract_kmers`` + ``index.hashtable.mix_jnp/fp2_jnp``:

  * windows are packed 5'-most base first into (hi, lo) uint32 halves,
  * ``mix`` (seeded murmur3 finalizer cascade) selects the bucket,
  * ``fp2`` (independent finalizer cascade) is the stored fingerprint,
  * windows containing any invalid code (>= 4: N base or padding) return
    bucket -1.

Outputs are ``(bucket_or_neg int32 [B, M], fp uint32 [B, M])`` with
``M = L - k + 1``; the caller finishes the probe with the XLA gather +
compare + scatter exactly as :func:`ops.count._count_core_fp`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32

# rows per grid program; 8-sublane-aligned, sized so all live [TB, L]
# uint32 intermediates stay well under the ~16 MB VMEM budget.
_TILE_ROWS = 256


def _fmix(h):
    h = h ^ (h >> 16)
    h = h * U32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * U32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _rev2(x):
    """Reverse the sixteen 2-bit groups of each uint32 lane (matches
    kmer.device._rev2)."""
    m2 = U32(0x33333333)
    m4 = U32(0x0F0F0F0F)
    m8 = U32(0x00FF00FF)
    x = ((x >> 2) & m2) | ((x & m2) << 2)
    x = ((x >> 4) & m4) | ((x & m4) << 4)
    x = ((x >> 8) & m8) | ((x & m8) << 8)
    x = (x >> 16) | (x << 16)
    return x


def _canonicalize(hi, lo, k):
    """min(fwd, revcomp) under 64-bit order (matches kmer.device.canonical)."""
    s = 64 - 2 * k
    r_hi = _rev2(~lo)
    r_lo = _rev2(~hi)
    if s == 0:
        new_hi, new_lo = r_hi, r_lo
    elif s < 32:
        new_lo = (r_lo >> s) | (r_hi << (32 - s))
        new_hi = r_hi >> s
    elif s == 32:
        new_lo, new_hi = r_hi, jnp.zeros_like(r_hi)
    else:
        new_lo = r_hi >> (s - 32)
        new_hi = jnp.zeros_like(r_hi)
    mask_hi = U32((1 << max(2 * k - 32, 0)) - 1) if 2 * k > 32 else U32(0)
    mask_lo = U32(0xFFFFFFFF) if 2 * k >= 32 else U32((1 << (2 * k)) - 1)
    new_hi, new_lo = new_hi & mask_hi, new_lo & mask_lo
    fwd_less = (hi < new_hi) | ((hi == new_hi) & (lo <= new_lo))
    return (jnp.where(fwd_less, hi, new_hi),
            jnp.where(fwd_less, lo, new_lo))


def _probe_prep_kernel(codes_ref, bucket_ref, fp_ref, *, k: int,
                       n_buckets: int, seed: int, m: int, canonical: bool):
    c = codes_ref[:].astype(U32)                 # [TB, L]
    k_lo = min(k, 16)
    k_hi = k - k_lo
    hi = jnp.zeros((c.shape[0], m), dtype=U32)
    lo = jnp.zeros((c.shape[0], m), dtype=U32)
    bad = jnp.zeros((c.shape[0], m), dtype=U32)
    for j in range(k_hi):
        w = c[:, j:j + m]
        hi = (hi << 2) | (w & U32(3))
        bad = bad | (w >> 2)                     # any code >= 4 sets bits
    for j in range(k_lo):
        w = c[:, k_hi + j:k_hi + j + m]
        lo = (lo << 2) | (w & U32(3))
        bad = bad | (w >> 2)
    if canonical:
        hi, lo = _canonicalize(hi, lo, k)
    h = _fmix(hi ^ U32(0x9E3779B9 ^ seed))
    b = (_fmix(h ^ lo) & U32(n_buckets - 1)).astype(jnp.int32)
    f = _fmix(lo ^ U32(0x85EBCA6B))
    fp = _fmix(f ^ hi)
    bucket_ref[:] = jnp.where(bad == 0, b, -1)
    fp_ref[:] = fp


@functools.partial(
    jax.jit,
    static_argnames=("k", "n_buckets", "seed", "canonical", "interpret"))
def probe_prep(codes: jax.Array, *, k: int, n_buckets: int, seed: int,
               canonical: bool = False, interpret: bool = False):
    """All read windows' (bucket, fingerprint) pairs, fused in one kernel.

    Args:
      codes: uint8 [B, L] encoded reads (0..3 bases, >=4 invalid/pad).
        Any B works: rows are padded internally to the grid tile (pad
        rows are all-invalid and sliced off the outputs).
      k: k-mer size (<= 31).
      n_buckets: power-of-two bucket count of the fingerprint table.
      seed: bucket-hash seed of the table.
      canonical: hash min(fwd, revcomp) of each window (memory-efficient
        canonical-only DBs) instead of the forward orientation.
      interpret: run in the Pallas interpreter (CPU debugging/tests).

    Returns:
      (bucket_or_neg int32 [B, M], fp uint32 [B, M]); bucket is -1 for
      windows containing an invalid code.
    """
    b, length = codes.shape
    m = length - k + 1
    if m <= 0:
        raise ValueError(f"reads of length {length} cannot hold {k}-mers")
    # pad rows up to the grid tile (8-sublane-aligned below _TILE_ROWS);
    # pad rows are all-invalid (code 4) so their windows hash to bucket -1
    # and are sliced off before returning.
    bp = -(-b // 8) * 8 if b <= _TILE_ROWS else -(-b // _TILE_ROWS) * _TILE_ROWS
    tile = min(_TILE_ROWS, bp)
    if bp != b:
        codes = jnp.pad(codes, ((0, bp - b), (0, 0)), constant_values=4)
    kern = functools.partial(_probe_prep_kernel, k=k, n_buckets=n_buckets,
                             seed=seed, m=m, canonical=canonical)
    bucket_or_neg, fp = pl.pallas_call(
        kern,
        grid=(bp // tile,),
        in_specs=[pl.BlockSpec((tile, length), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, m), jnp.int32),
            jax.ShapeDtypeStruct((bp, m), U32),
        ),
        interpret=interpret,
    )(codes)
    if bp != b:
        bucket_or_neg, fp = bucket_or_neg[:b], fp[:b]
    return bucket_or_neg, fp


def lookup_fp_from_prep(fp_table, bucket_or_neg, fp, bucket: int):
    """Finish a fingerprint probe from kernel outputs (slot ids, -1 miss).

    ``fp_table``: uint32 [n_buckets, bucket]; the gather + lane compare are
    left to XLA's hardware gather (see module docstring).
    """
    shape = bucket_or_neg.shape
    b = jnp.maximum(bucket_or_neg, 0).reshape(-1)
    f = fp.reshape(-1)
    rows = fp_table.at[b].get(mode="promise_in_bounds")
    hit = rows == f[:, None]
    lane = jnp.argmax(hit, axis=1).astype(jnp.int32)
    found = jnp.any(hit, axis=1) & (bucket_or_neg.reshape(-1) >= 0)
    slot = b * jnp.int32(bucket) + lane
    return jnp.where(found, slot, -1).reshape(shape)
