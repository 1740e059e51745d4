"""Round-4 device-wall study: the two untried attacks on the 44M win/s
fused-probe bound (round-3 VERDICT weak #3 / next-round item 3).

The fused count step is one 256B fingerprint-row gather + one scatter-add
per window; at 28.6M keys it sustains ~44M windows/s ~= the harmonic
composition of XLA's measured gather (87.6M rows/s at 512MB) and scatter
(94M upd/s, flat) rates (benchmarks/PROBE_STUDY.json).  Two designs could
in principle beat those units:

(a) DMA-pipelined Pallas row gather — replace XLA's hardware gather with
    explicit double-buffered ``pltpu.make_async_copy`` of fp rows
    HBM->VMEM, K copies in flight, hoping many in-flight DMAs approach
    HBM random-read bandwidth instead of the gather unit's issue rate.
    The per-row DMA must be issued from the scalar core (dynamic index
    scalar-read + copy-start + semaphore wait per row), so the prior is
    that DMA ISSUE RATE (~tens of cycles/DMA) caps rows/s well below the
    gather unit.  This benchmark measures it.

(b) Multiplicity-compressed scatter — sort the batch's slot ids, compact
    runs to (unique slot, run length), scatter-add the compacted pairs.
    Scatter cost is per UPDATE (flat 94M upd/s, sortedness irrelevant —
    PROBE_STUDY), so a batch with mean slot multiplicity m cuts updates
    m-fold... after paying a full device sort + compaction of the window
    stream.  Identify batches have m ~= 1.1-1.3 (65k reads x 120 windows
    spread over 28.6M keys), so the win requires the sort+compact
    overhead to be near-free.  Measured here at synthetic m in {1,8,64}.

Usage: python benchmarks/probe_bench3.py   (run on the real TPU)
Writes benchmarks/PROBE_STUDY3.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "PROBE_STUDY3.json")
BUCKET = 64                     # production fp row: 64 uint32 = 256B
N_KEYS = 28_600_000             # E. coli scale
W = 1 << 23                     # windows per timed call (8.4M)
REPS = 5


def log(m):
    print(f"[probe3] {m}", file=sys.stderr, flush=True)


def _force(out):
    """Force REAL completion.  On the tunneled axon backend,
    ``jax.block_until_ready`` can return before the dispatched programs
    actually execute (measured: repeated 8.4M-row gathers "completed" in
    0.3 ms — 135,000 M rows/s — under block_until_ready, but 87.6 M
    rows/s, exactly PROBE_STUDY's value, when a device_get forces the
    result).  Fetching one element of the output is the only reliable
    barrier; its RTT (~0.1 ms warm) is noise at the >100 ms timescales
    measured here."""
    return jax.device_get(jnp.ravel(out)[:1])


def _timeit(fn, *args, reps=REPS):
    """Warm once, then time `reps` dispatches ended by a device_get
    barrier (see _force).  Big outputs are avoided by the benchmarked
    fns themselves — gathers reduce to small folds, scatters donate
    their accumulator."""
    out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.time() - t0) / reps


def _timeit_carry(fn, carry, *args, reps=REPS):
    """Like _timeit but threads a donated accumulator through the reps."""
    carry = fn(carry, *args)
    _force(carry)
    t0 = time.time()
    for _ in range(reps):
        carry = fn(carry, *args)
    _force(carry)
    return (time.time() - t0) / reps


# ------------------------------------------------------------------ (a)
def dma_gather_kernel(idx_ref, tab_ref, out_ref, rows, sems, *, tile,
                      nbuf):
    """Fetch tab_ref[idx[t]] rows via a nbuf-deep DMA pipeline, folding
    each row into a small per-tile XOR accumulator (so the benchmark's
    output stays tiny — the fold is one VPU op, the DMA is the cost).
    The tile's idx block lives in SMEM so the scalar core can read
    indices and issue copies ahead of the waits."""

    def start(t, slot):
        b = idx_ref[t]
        pltpu.make_async_copy(
            tab_ref.at[b], rows.at[slot], sems.at[slot]).start()

    out_ref[:] = jnp.zeros_like(out_ref)
    # prologue: fill the pipeline
    for s in range(nbuf):
        start(s, s)

    def body(t, _):
        slot = jnp.bitwise_and(t, nbuf - 1)
        pltpu.make_async_copy(
            tab_ref.at[idx_ref[t]], rows.at[slot],
            sems.at[slot]).wait()
        out_ref[pl.ds(slot, 1), :] ^= rows[pl.ds(slot, 1), :]

        @pl.when(t + nbuf < tile)
        def _():
            start(t + nbuf, slot)

        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def bench_dma_gather(table, idx, tile=2048, nbuf=8):
    """``table`` rows must be 128 uint32 wide (512 B): Mosaic requires
    VMEM slices 128-lane-aligned, so the production 64-wide (256 B) row
    cannot be DMA'd individually — already a structural point against
    per-row DMA, and the 512 B row only helps the DMA side (more bytes
    per issue).  Output: per-(tile, pipeline-slot) XOR folds, checked
    against a NumPy oracle."""
    w = idx.shape[0]
    roww = table.shape[1]
    n_tiles = w // tile
    kern = functools.partial(dma_gather_kernel, tile=tile, nbuf=nbuf)
    f = jax.jit(lambda i, t: pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nbuf, roww), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, roww), jnp.uint32),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        out_shape=jax.ShapeDtypeStruct((n_tiles * nbuf, roww), jnp.uint32),
    )(i, t))
    dt = _timeit(f, idx, table)
    # correctness: XOR-fold oracle over the first tile
    tab_np = np.asarray(jax.device_get(table))
    idx_np = np.asarray(idx[:tile])
    want = np.zeros((nbuf, roww), dtype=np.uint32)
    for t, b in enumerate(idx_np):
        want[t & (nbuf - 1)] ^= tab_np[b]
    got = np.asarray(jax.device_get(f(idx, table)))[:nbuf]
    ok = bool(np.array_equal(got, want))
    return w / dt / 1e6, ok


def bench_xla_gather(table, idx):
    # reduce so the rows are consumed without a GB-scale output
    # (probe_bench.py methodology)
    f = jax.jit(lambda i, t: t.at[i].get(
        mode="promise_in_bounds").sum(dtype=jnp.uint32))
    dt = _timeit(f, idx, table)
    return idx.shape[0] / dt / 1e6


# ------------------------------------------------------------------ (b)
def bench_plain_scatter(n_slots, slots):
    w = slots.shape[0]

    @functools.partial(jax.jit, donate_argnames=("c",))
    def f(c, s):
        return c.at[s].add(jnp.ones_like(s, dtype=jnp.int32),
                           mode="promise_in_bounds")

    c = jnp.zeros((n_slots + 1,), jnp.int32)
    dt = _timeit_carry(f, c, slots)
    return w / dt / 1e6


def bench_compressed_scatter(n_slots, slots, compact_div):
    """sort -> run-length compact to W//compact_div entries -> scatter.
    compact_div must be <= true multiplicity or counts are WRONG; the
    bench asserts correctness against the plain scatter."""
    w = slots.shape[0]
    m = w // compact_div

    @functools.partial(jax.jit, donate_argnames=("c",))
    def f(c, s):
        s = jnp.sort(s)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), s[1:] != s[:-1]])
        # run lengths = diffs of consecutive run-start positions — no
        # scan needed (an 8.4M associative_scan took >10 min of remote
        # compile).  fill_value=w makes both the last run's length and
        # every padding entry's length come out right.
        (start_idx,) = jnp.nonzero(is_start, size=m, fill_value=w)
        nxt = jnp.concatenate(
            [start_idx[1:], jnp.full((1,), w, jnp.int32)])
        length = (nxt - start_idx).astype(jnp.int32)
        valid = start_idx < w
        upd_slot = jnp.where(
            valid,
            s.at[jnp.minimum(start_idx, w - 1)].get(
                mode="promise_in_bounds"),
            n_slots)
        upd_val = jnp.where(valid, length, 0)
        return c.at[upd_slot].add(upd_val, mode="promise_in_bounds")

    # correctness vs plain (on fresh accumulators; f donates its input).
    # Compare ON DEVICE — fetching two 268 MB vectors over the tunnel d2h
    # would take tens of minutes.
    plain = jnp.zeros((n_slots + 1,), jnp.int32).at[slots].add(
        jnp.ones_like(slots, dtype=jnp.int32), mode="promise_in_bounds")
    got = f(jnp.zeros((n_slots + 1,), jnp.int32), slots)
    ok = bool(jax.device_get(
        jnp.array_equal(got[:n_slots], plain[:n_slots])))
    del got, plain
    c = jnp.zeros((n_slots + 1,), jnp.int32)
    dt = _timeit_carry(f, c, slots)
    return w / dt / 1e6, ok


def bench_sort_only(slots):
    f = jax.jit(lambda s: jnp.sort(s))
    dt = _timeit(f, slots)
    return slots.shape[0] / dt / 1e6


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gather", action="store_true",
                    help="rerun only the scatter section, merging into "
                         "an existing PROBE_STUDY3.json")
    args = ap.parse_args()
    dev = jax.devices()[0]
    log(f"device: {dev}")
    rng = np.random.default_rng(0)
    n_buckets = 1
    while n_buckets * BUCKET * 0.5 < N_KEYS:
        n_buckets *= 2
    n_slots = n_buckets * BUCKET
    log(f"table geometry: {n_buckets} buckets x {BUCKET} "
        f"({n_buckets * BUCKET * 4 / 1e6:.0f} MB)")
    table = jnp.asarray(
        rng.integers(0, 1 << 32, size=(n_buckets, BUCKET), dtype=np.uint32))
    idx = jnp.asarray(
        rng.integers(0, n_buckets, size=W, dtype=np.int32))
    res = {"device": str(dev), "n_keys": N_KEYS, "windows": W,
           "table_MB": round(n_buckets * BUCKET * 4 / 1e6)}
    if args.skip_gather and os.path.exists(OUT):
        with open(OUT) as fh:
            res.update(json.load(fh))

    if args.skip_gather:
        log("skipping gather section (merging prior results)")
        del table
        return scatter_section(res, rng, n_slots)

    log("XLA gather baseline (256B production rows)")
    res["xla_gather_Mrows_s_256B"] = round(bench_xla_gather(table, idx), 1)
    log(f"  {res['xla_gather_Mrows_s_256B']} M rows/s")

    # DMA experiment runs at 512B rows (Mosaic's 128-lane VMEM slice
    # minimum); XLA baseline at the same geometry for apples-to-apples
    table_wide = table.reshape(n_buckets // 2, 2 * BUCKET)
    idx_wide = jnp.asarray(
        rng.integers(0, n_buckets // 2, size=W, dtype=np.int32))
    res["xla_gather_Mrows_s_512B"] = round(
        bench_xla_gather(table_wide, idx_wide), 1)
    log(f"  512B rows: {res['xla_gather_Mrows_s_512B']} M rows/s")

    res["dma_gather_Mrows_s_512B"] = {}
    for tile, nbuf in ((2048, 8), (2048, 16), (8192, 16)):
        try:
            rate, ok = bench_dma_gather(table_wide, idx_wide, tile=tile,
                                        nbuf=nbuf)
            res["dma_gather_Mrows_s_512B"][f"tile{tile}_nbuf{nbuf}"] = {
                "Mrows_s": round(rate, 2), "bit_exact": ok}
            log(f"  dma tile={tile} nbuf={nbuf}: {rate:.2f} M rows/s "
                f"(exact={ok})")
        except Exception as e:
            res["dma_gather_Mrows_s_512B"][f"tile{tile}_nbuf{nbuf}"] = {
                "error": str(e)[:300]}
            log(f"  dma tile={tile} nbuf={nbuf} FAILED: {e}")

    del table, table_wide, idx, idx_wide
    scatter_section(res, rng, n_slots)


def scatter_section(res, rng, n_slots):
    log("plain scatter baseline")
    slots_uniform = jnp.asarray(
        rng.integers(0, n_slots, size=W, dtype=np.int32))
    res["plain_scatter_Mupd_s"] = round(
        bench_plain_scatter(n_slots, slots_uniform), 1)
    log(f"  {res['plain_scatter_Mupd_s']} M upd/s")

    res["sort_Melem_s"] = round(bench_sort_only(slots_uniform), 1)
    log(f"  sort: {res['sort_Melem_s']} M elem/s")
    del slots_uniform

    res["compressed_scatter_Mwin_s"] = {}
    for mult in (8, 64):
        # synthetic multiplicity: windows drawn from W//mult distinct slots
        pool = rng.integers(0, n_slots, size=W // mult, dtype=np.int32)
        slots_m = jnp.asarray(rng.choice(pool, size=W))
        rate, ok = bench_compressed_scatter(n_slots, slots_m,
                                            compact_div=max(mult // 4, 1))
        plain_rate = bench_plain_scatter(n_slots, slots_m)
        res["compressed_scatter_Mwin_s"][f"mult{mult}"] = {
            "compressed": round(rate, 1), "plain": round(plain_rate, 1),
            "bit_exact": ok}
        log(f"  mult={mult}: compressed {rate:.1f} vs plain "
            f"{plain_rate:.1f} M win/s (exact={ok})")

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
