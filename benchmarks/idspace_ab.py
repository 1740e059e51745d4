"""A/B-settle the tree_build id_space optimization (round-3 VERDICT #5).

Commit 7ad3059 replaced ``np.unique`` + per-leaf ``np.searchsorted`` with
``pack.sort_unique_u64`` (np.sort + dedup mask) + native galloping
``lookup_sorted_u64`` and claimed 5x; across the four round-3 scale
builds the NEW code's id_space was *slower* (171.8 s vs 101.4 s) — but
each variant was measured once, on a host whose wall times swing 4-8x
run to run.  This benchmark reruns BOTH implementations on the stage's
exact workload shape, interleaved A/B/A/B (so host drift hits both
sides), median-of-3, and prints the verdict.

Workload (matches the E. coli-scale fixture): ~1650 leaves x ~180k
sorted-unique uint64 each, concatenated to ~300M entries deduping to a
~28.6M universe; then every leaf array is mapped to universe ids.

Usage: python benchmarks/idspace_ab.py [--leaves 1650] [--per-leaf 180000]
Writes benchmarks/IDSPACE_AB.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strainscan_tpu.kmer import pack  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "IDSPACE_AB.json")


def log(m):
    print(f"[idspace_ab] {m}", file=sys.stderr, flush=True)


def variant_old(leaves):
    t0 = time.time()
    concat = np.concatenate(leaves)
    universe = np.unique(concat)
    del concat
    ids = [np.searchsorted(universe, lf).astype(np.int32) for lf in leaves]
    dt = time.time() - t0
    return dt, universe, ids


def variant_new(leaves):
    t0 = time.time()
    concat = np.concatenate(leaves)
    universe = pack.sort_unique_u64(concat)
    del concat
    ids = [pack.lookup_sorted_u64(universe, lf) for lf in leaves]
    dt = time.time() - t0
    return dt, universe, ids


def variant_kway(leaves):
    """What build_cst actually runs (commit 0b135d9): native k-way heap
    merge of the sorted per-leaf arrays, no concat scratch."""
    t0 = time.time()
    universe = pack.merge_unique_sorted_u64(leaves)
    ids = [pack.lookup_sorted_u64(universe, lf) for lf in leaves]
    dt = time.time() - t0
    return dt, universe, ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", type=int, default=1650)
    ap.add_argument("--per-leaf", type=int, default=180_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    log("synthesizing leaf arrays (family-structured overlap)")
    # ~1/3 of leaves are family triplets sharing most k-mers (the scale
    # fixture's 823 families x up-to-3 variants), so the concat dedups
    # ~10x like the real stage.
    base_pool = rng.integers(0, 1 << 62, size=30_000_000, dtype=np.uint64)
    leaves = []
    for i in range(args.leaves):
        fam = i // 2
        fam_rng = np.random.default_rng(fam)
        start = (fam * 977) % (base_pool.size - args.per_leaf)
        chunk = base_pool[start:start + args.per_leaf]
        # variant jitter: drop ~2% and add ~2% private
        keep = fam_rng.random(args.per_leaf) > 0.02
        priv = rng.integers(0, 1 << 62, size=args.per_leaf // 50,
                            dtype=np.uint64)
        leaves.append(np.unique(np.concatenate([chunk[keep], priv])))
    total = sum(lf.size for lf in leaves)
    log(f"{len(leaves)} leaves, {total/1e6:.0f}M total entries")

    res = {"leaves": len(leaves), "total_entries": total,
           "old_s": [], "new_s": [], "kway_s": []}
    oracle = None
    for rep in range(args.reps):
        dt_o, uni_o, ids_o = variant_old(leaves)
        res["old_s"].append(round(dt_o, 1))
        log(f"rep {rep} old(np.unique+searchsorted): {dt_o:.1f}s")
        dt_n, uni_n, ids_n = variant_new(leaves)
        res["new_s"].append(round(dt_n, 1))
        log(f"rep {rep} new(sort_unique+gallop):     {dt_n:.1f}s")
        dt_k, uni_k, ids_k = variant_kway(leaves)
        res["kway_s"].append(round(dt_k, 1))
        log(f"rep {rep} kway(heap merge+gallop):     {dt_k:.1f}s")
        if oracle is None:
            assert np.array_equal(uni_o, uni_n), "universe mismatch"
            assert np.array_equal(uni_o, uni_k), "kway universe mismatch"
            for a, b, c in zip(ids_o, ids_n, ids_k):
                assert np.array_equal(a, b), "ids mismatch"
                assert np.array_equal(a, c), "kway ids mismatch"
            oracle = True
            res["bit_exact"] = True
            res["universe_size"] = int(uni_o.size)
        del uni_o, ids_o, uni_n, ids_n, uni_k, ids_k
    res["old_median_s"] = float(np.median(res["old_s"]))
    res["new_median_s"] = float(np.median(res["new_s"]))
    res["kway_median_s"] = float(np.median(res["kway_s"]))
    res["speedup_new_over_old"] = round(
        res["old_median_s"] / res["new_median_s"], 2)
    res["speedup_kway_over_new"] = round(
        res["new_median_s"] / res["kway_median_s"], 2)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote {OUT}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
