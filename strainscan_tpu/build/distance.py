"""Pairwise genome Jaccard distances.

Replaces the ``dashing_s128 dist -p10 -k31`` HyperLogLog sketching step
(reference library/Cluster.py:13-53) with bottom-k minhash over canonical
packed k-mers (default) or exact Jaccard over full k-mer sets.  Both run
from the same native/NumPy k-mer extraction; the sketch path is O(genome)
per genome plus O(s) per pair.

The matrix convention matches the reference artifacts: ``similarity`` is
the Jaccard index (distance_matrix.txt), ``distance = 1 - similarity``
(distance_matrix_rebuild.txt, Cluster.py:32-53).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from strainscan_tpu.io import fastx


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a 64-bit mix for minhash sketching."""
    z = np.asarray(x, dtype=np.uint64).copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def genome_sketch(path: str, k: int, sketch_size: int,
                  use_native: bool = True) -> np.ndarray:
    """Sorted bottom-``sketch_size`` 64-bit hashes of canonical k-mers."""
    km = fastx.genome_kmers(path, k, mode="canonical", unique=True,
                            use_native=use_native)
    h = np.unique(mix64(km))
    if h.size > sketch_size:
        h = np.partition(h, sketch_size)[:sketch_size]
        h.sort()
    return h


def sketch_jaccard(a: np.ndarray, b: np.ndarray, s: int) -> float:
    """Bottom-k Jaccard estimate: |bottom_s(A∪B) ∩ A ∩ B| / |bottom_s(A∪B)|."""
    union = np.union1d(a, b)
    if union.size > s:
        x = union[:s]
    else:
        x = union
    if x.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True)
    both = np.intersect1d(x, inter, assume_unique=True)
    return both.size / x.size


def distance_matrix(
    genome_paths: Sequence[str],
    k: int = 31,
    sketch_size: int = 8192,
    exact: bool = False,
    use_native: bool = True,
) -> Tuple[List[str], np.ndarray]:
    """(names, distances) for a genome set; names are filename prefixes."""
    names = [fastx.genome_prefix(p) for p in genome_paths]
    n = len(genome_paths)
    dist = np.zeros((n, n), dtype=np.float64)
    if exact:
        sets = [
            fastx.genome_kmers(p, k, mode="canonical", use_native=use_native)
            for p in genome_paths
        ]
        for i in range(n):
            for j in range(i + 1, n):
                inter = np.intersect1d(sets[i], sets[j],
                                       assume_unique=True).size
                union = sets[i].size + sets[j].size - inter
                jac = inter / union if union else 0.0
                dist[i, j] = dist[j, i] = 1.0 - jac
    else:
        sketches = [
            genome_sketch(p, k, sketch_size, use_native=use_native)
            for p in genome_paths
        ]
        for i in range(n):
            for j in range(i + 1, n):
                jac = sketch_jaccard(sketches[i], sketches[j], sketch_size)
                dist[i, j] = dist[j, i] = 1.0 - jac
    return names, dist


def save_matrix(path: str, names: Sequence[str], dist: np.ndarray) -> None:
    np.savez_compressed(path, names=np.array(list(names)), dist=dist)


def load_matrix(path: str):
    z = np.load(path, allow_pickle=False)
    return [str(x) for x in z["names"]], z["dist"]
