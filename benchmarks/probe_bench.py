"""Device-side study of the count hot path's "speed of light"
(round-3 VERDICT #3).

Round 2 declared XLA's measured gather (~156M rows/s) + scatter
(~99M upd/s) rates a hardware wall without testing the assumptions.
This script measures, on the real device:

  1. gather rows/s vs table size, row width, and index locality
  2. scatter-add upd/s vs target size and index locality
  3. the full fused count kernel (windows/s) at 2M and 28M keys
  4. a co-located layout: fingerprints and counts in ONE donated
     [n_buckets, 2*bucket] array, so the probe's gather and the count's
     scatter touch the SAME random row (halves distinct random rows per
     window if the memory system is transaction-bound)
  5. gather+scatter issued on the same indices back-to-back (the count
     pipeline's actual dependency chain) to test additivity

Writes benchmarks/PROBE_STUDY.json and prints a summary table.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

Q = 8 * 1024 * 1024            # queries per timed op
ITERS = 6


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS


# ------------------------------------------------------------------ gather
@functools.partial(jax.jit, static_argnames=())
def _gather(tab, idx):
    rows = tab.at[idx].get(mode="promise_in_bounds")
    # reduce so the whole row is consumed (prevents DCE of lanes)
    return rows.sum(dtype=jnp.int32)


def bench_gather(n_rows, width, order, rng):
    tab = jnp.zeros((n_rows, width), jnp.int32)
    idx = rng.integers(0, n_rows, size=Q).astype(np.int32)
    if order == "sorted":
        idx = np.sort(idx)
    idx = jnp.asarray(idx)
    dt = timeit(_gather, tab, idx)
    return Q / dt / 1e6


# ------------------------------------------------------------------ scatter
@functools.partial(jax.jit, donate_argnames=("counts",))
def _scatter(counts, idx):
    return counts.at[idx].add(jnp.int32(1), mode="promise_in_bounds")


def bench_scatter(n_slots, order, rng):
    idx = rng.integers(0, n_slots, size=Q).astype(np.int32)
    if order == "sorted":
        idx = np.sort(idx)
    idx = jnp.asarray(idx)
    counts = jnp.zeros((n_slots,), jnp.int32)
    counts = _scatter(counts, idx)  # compile
    jax.block_until_ready(counts)
    t0 = time.time()
    for _ in range(ITERS):
        counts = _scatter(counts, idx)
    jax.block_until_ready(counts)
    dt = (time.time() - t0) / ITERS
    return Q / dt / 1e6


# ------------------------------------------- gather -> scatter (dependent)
@functools.partial(jax.jit, static_argnames=("bucket",),
                   donate_argnames=("counts",))
def _gather_scatter(counts, tab, idx, fp, bucket):
    rows = tab.at[idx].get(mode="promise_in_bounds")
    hit = rows == fp[:, None]
    lane = jnp.argmax(hit, axis=1).astype(jnp.int32)
    found = jnp.any(hit, axis=1)
    slot = jnp.where(found, idx * bucket + lane, counts.shape[0] - 1)
    return counts.at[slot].add(jnp.int32(1), mode="promise_in_bounds")


def bench_gather_scatter(n_buckets, bucket, rng):
    tab = jnp.asarray(
        rng.integers(0, 2**31, size=(n_buckets, bucket)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n_buckets, size=Q).astype(np.int32))
    fp = jnp.asarray(rng.integers(0, 2**31, size=Q).astype(np.int32))
    counts = jnp.zeros((n_buckets * bucket + 1,), jnp.int32)
    counts = _gather_scatter(counts, tab, idx, fp, bucket)
    jax.block_until_ready(counts)
    t0 = time.time()
    for _ in range(ITERS):
        counts = _gather_scatter(counts, tab, idx, fp, bucket)
    jax.block_until_ready(counts)
    dt = (time.time() - t0) / ITERS
    return Q / dt / 1e6


# ------------------------------------------------- co-located fp + counts
@functools.partial(jax.jit, static_argnames=("bucket",),
                   donate_argnames=("tab",))
def _colocated(tab, idx, fp, bucket):
    """tab [n_buckets, 2*bucket]: cols [0, bucket) hold fingerprints,
    cols [bucket, 2*bucket) hold counts.  One random ROW serves both the
    probe read and the count update."""
    rows = tab.at[idx, :bucket].get(mode="promise_in_bounds")
    hit = rows == fp[:, None]
    lane = jnp.argmax(hit, axis=1).astype(jnp.int32)
    found = jnp.any(hit, axis=1)
    col = jnp.where(found, bucket + lane, 2 * bucket - 1)
    return tab.at[idx, col].add(
        jnp.where(found, 1, 0).astype(jnp.int32), mode="promise_in_bounds")


def bench_colocated(n_buckets, bucket, rng):
    tab = jnp.asarray(
        rng.integers(0, 2**31, size=(n_buckets, 2 * bucket))
        .astype(np.int32))
    idx = jnp.asarray(rng.integers(0, n_buckets, size=Q).astype(np.int32))
    fp = jnp.asarray(rng.integers(0, 2**31, size=Q).astype(np.int32))
    tab = _colocated(tab, idx, fp, bucket)
    jax.block_until_ready(tab)
    t0 = time.time()
    for _ in range(ITERS):
        tab = _colocated(tab, idx, fp, bucket)
    jax.block_until_ready(tab)
    dt = (time.time() - t0) / ITERS
    return Q / dt / 1e6


def main():
    rng = np.random.default_rng(0)
    res = {"device": str(jax.devices()[0]), "queries": Q}
    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    # warm the d2h channel
    jax.device_get(jnp.ones((8,), jnp.int32))

    g = {}
    for mb in (32, 128, 512):
        for width in (4, 16, 64):
            n_rows = mb * 1024 * 1024 // (4 * width)
            for order in ("random", "sorted"):
                key = f"{mb}MB_w{width}_{order}"
                g[key] = round(bench_gather(n_rows, width, order, rng), 1)
                log(f"gather {key}: {g[key]}M rows/s")
    res["gather_Mrows_s"] = g

    s = {}
    for mb in (16, 128, 512):
        n_slots = mb * 1024 * 1024 // 4
        for order in ("random", "sorted"):
            key = f"{mb}MB_{order}"
            s[key] = round(bench_scatter(n_slots, order, rng), 1)
            log(f"scatter {key}: {s[key]}M upd/s")
    res["scatter_Mupd_s"] = s

    gs = {}
    for mb, bucket in ((32, 16), (512, 16)):
        n_buckets = mb * 1024 * 1024 // (4 * bucket)
        key = f"{mb}MB_b{bucket}"
        gs[key] = round(bench_gather_scatter(n_buckets, bucket, rng), 1)
        log(f"gather+scatter {key}: {gs[key]}M win/s")
    res["gather_scatter_Mwin_s"] = gs

    co = {}
    for mb, bucket in ((32, 16), (512, 16)):
        n_buckets = mb * 1024 * 1024 // (4 * 2 * bucket)
        key = f"{mb}MB_b{bucket}"
        co[key] = round(bench_colocated(n_buckets, bucket, rng), 1)
        log(f"colocated {key}: {co[key]}M win/s")
    res["colocated_Mwin_s"] = co

    out = os.path.join(REPO, "benchmarks", "PROBE_STUDY.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
