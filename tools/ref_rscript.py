"""Rscript stand-in for reference plasmid-mode parity tests.

The reference's build writes a fixed-template R script (hclust + cutree,
library/Cluster.py:56-66) and shells ``Rscript tem_hier.R``.  R is not
in this image; this shim parses that exact template and reproduces R's
semantics with scipy:

* ``hclust(d, method)``            -> scipy.cluster.hierarchy.linkage
* ``cutree(hc, h)``                -> fcluster(criterion='distance'),
  renumbered by first appearance in OBSERVATION order (R's cutree
  numbering contract)
* ``sort(res)``                    -> stable sort by cluster id
* console print of a named vector  -> alternating name/value lines,
  which Cluster.py:68-108 parses in reverse

Only used by the head-to-head test harness, never by strainscan_tpu.
"""

import re
import sys

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage
from scipy.spatial.distance import squareform


def main():
    script = open(sys.argv[1]).read()
    fname = re.search(r'read\.table\("([^"]+)"', script).group(1)
    method = re.search(r'method="([^"]+)"', script).group(1)
    h = float(re.search(r"h=([0-9.eE+-]+)", script).group(1))

    with open(fname) as f:
        header = f.readline().rstrip("\n")
        names = header.split("\t")[1:]
        rows = []
        for line in f:
            parts = line.rstrip("\n").split("\t")
            rows.append([float(x) for x in parts[1:]])
    m = np.array(rows)
    z = linkage(squareform(m, checks=False), method=method)
    raw = fcluster(z, t=h, criterion="distance")
    # R cutree numbering: cluster ids by first appearance in
    # observation order
    remap = {}
    out = np.empty_like(raw)
    for i, c in enumerate(raw):
        if c not in remap:
            remap[c] = len(remap) + 1
        out[i] = remap[c]
    order = np.argsort(out, kind="stable")
    for i in order:
        print(names[i])
        print(int(out[i]))


if __name__ == "__main__":
    main()
