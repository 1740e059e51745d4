"""Collate round-stamped benchmark artifacts into one trend table and
flag regressions (round-2 VERDICT weak #8: "nothing would catch a silent
20% regression between rounds").

Usage:  python tools/bench_trend.py [--threshold 0.10]

Reads BENCH_r*.json + benchmarks/BENCH_local_r*.json (headline reads/s),
PARITY_SCALE_r*.json (identify wall times + parity flag) and
benchmarks/SHARDED_r*.json.  Exits 1 when the newest headline drops more
than --threshold vs the previous round's (jellyfish-variance swings in
vs_baseline are reported but never fail the check).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_of(path: str) -> int:
    m = re.search(r"_r0*(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else -1


def load_bench():
    """{round: {source, reads_s, vs, detail?}} — driver artifact wins."""
    out = {}
    for pat, src in ((os.path.join(REPO, "benchmarks", "BENCH_local_r*.json"),
                      "local"),
                     (os.path.join(REPO, "BENCH_r*.json"), "driver")):
        for p in sorted(glob.glob(pat)):
            try:
                j = json.load(open(p))
            except (OSError, ValueError):
                continue
            if "value" not in j and "tail" in j:
                # driver wrapper: {n, cmd, rc, tail} with the metric line
                # somewhere in the captured tail
                for line in reversed(j["tail"].splitlines()):
                    line = line.strip()
                    if line.startswith("{"):
                        try:
                            j = json.loads(line)
                            break
                        except ValueError:
                            continue
            r = _round_of(p)
            if r < 0 or "value" not in j:
                continue
            out[r] = {"source": src, "reads_s": float(j["value"]),
                      "vs": j.get("vs_baseline"),
                      "metric": j.get("metric", "")}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.10)
    args = ap.parse_args()

    bench = load_bench()
    print("== bench headline (reads/s)")
    prev = None
    worst = 0.0
    for r in sorted(bench):
        b = bench[r]
        delta = ""
        if prev is not None and prev > 0:
            d = b["reads_s"] / prev - 1
            delta = f"  {d:+.1%} vs r{r-1}"
            worst = min(worst, d)
        note = ("" if r < 3 else "  [metric changed r03: E.coli-scale "
                "28.6M-key table]") if r == 3 else ""
        print(f"  r{r:02d} [{b['source']:6s}] {b['reads_s']:>12,.0f} "
              f"(vs_baseline {b['vs']}){delta}{note}")
        prev = b["reads_s"]

    for p in sorted(glob.glob(os.path.join(REPO, "PARITY_SCALE_r*.json"))):
        j = json.load(open(p))
        ours = j.get("ours_s", {})
        warm = [v for k, v in ours.items()
                if k.startswith("warm_") and isinstance(v, (int, float))]
        print(f"== {os.path.basename(p)}: parity={j.get('parity')} "
              f"warm={min(warm) if warm else '-'}-{max(warm) if warm else '-'}s "
              f"ref={sorted(j.get('ref_s', {}).values())}")

    for p in sorted(glob.glob(os.path.join(REPO, "benchmarks",
                                           "SHARDED_r*.json"))):
        j = json.load(open(p))
        print(f"== {os.path.basename(p)}: {json.dumps(j)[:140]}")

    # regression gate: only adjacent-round, same-metric comparisons count
    rounds = sorted(bench)
    for a, b in zip(rounds, rounds[1:]):
        if bench[a]["metric"] != bench[b]["metric"]:
            continue
        d = bench[b]["reads_s"] / max(bench[a]["reads_s"], 1e-9) - 1
        if d < -args.threshold:
            print(f"REGRESSION: r{b} headline {d:+.1%} vs r{a} "
                  f"(threshold -{args.threshold:.0%})")
            return 1
    print("trend ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
