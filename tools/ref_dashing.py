"""dashing_s128 stand-in for reference plasmid-mode parity tests.

The real binary is absent from the reference checkout
(.MISSING_LARGE_BLOBS:4); the reference's plasmid mode re-invokes
StrainScan_build.py (StrainScan.py:235), which needs
``dashing dist -p10 -k31 -O distance_matrix.txt -o size_estimates.txt
-Q paths -F paths`` (library/Cluster.py:24-26).  This shim computes the
EXACT Jaccard similarity over canonical k-mers instead of dashing's
HyperLogLog estimate — same matrix contract, deterministic values.
Only used by the head-to-head test harness, never by strainscan_tpu.
"""

import sys


def canonical_kmers(path, k):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    seqs = []
    cur = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.upper())
    if cur:
        seqs.append("".join(cur))
    out = set()
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i : i + k]
            if any(c not in "ACGT" for c in km):
                continue
            rc = "".join(comp[c] for c in reversed(km))
            out.add(min(km, rc))
    return out


def main():
    args = sys.argv[1:]
    assert args and args[0] == "dist", args
    k = 31
    out_matrix = "distance_matrix.txt"
    out_sizes = "size_estimates.txt"
    qfile = None
    i = 1
    while i < len(args):
        a = args[i]
        if a.startswith("-k"):
            k = int(a[2:]) if len(a) > 2 else int(args[i + 1])
            i += 1 if len(a) > 2 else 2
            continue
        if a == "-O":
            out_matrix = args[i + 1]
            i += 2
            continue
        if a == "-o":
            out_sizes = args[i + 1]
            i += 2
            continue
        if a in ("-Q", "-F"):
            qfile = args[i + 1]
            i += 2
            continue
        i += 1
    paths = [l.strip() for l in open(qfile) if l.strip()]
    sets = [canonical_kmers(p, k) for p in paths]
    with open(out_sizes, "w") as o:
        for p, s in zip(paths, sets):
            o.write(f"{p}\t{len(s)}\n")
    with open(out_matrix, "w") as o:
        o.write("##Names\t" + "\t".join(paths) + "\n")
        for i, p in enumerate(paths):
            sims = []
            for j in range(len(paths)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                sims.append(f"{inter / union if union else 1.0:.6f}")
            o.write(p + "\t" + "\t".join(sims) + "\n")


if __name__ == "__main__":
    main()
