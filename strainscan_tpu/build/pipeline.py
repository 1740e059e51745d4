"""End-to-end DB build (the reference StrainScan_build.py:46-158 pipeline).

    genomes -> distance matrix -> primary clustering -> representative
    selection -> CST -> per-cluster L2 matrices -> overlap matrices -> DB

Host-parallel over clusters (the reference forks a multiprocessing pool,
Build_kmer_sets...sp.py:621-627; we use threads — the heavy lifting is in
native code and NumPy which release the GIL).
"""

from __future__ import annotations

import concurrent.futures
import logging
import time
from typing import Dict, Optional

from strainscan_tpu.build import cluster as cluster_mod
from strainscan_tpu.build import db as db_mod
from strainscan_tpu.build import distance, l2_build, select_rep, tree_build
from strainscan_tpu.config import BuildConfig
from strainscan_tpu.io import fastx

log = logging.getLogger("strainscan_tpu.build")


def build_database(
    input_fa: str,
    out_dir: str,
    cfg: BuildConfig = BuildConfig(),
    custom_cls_file: Optional[str] = None,
    use_native: bool = True,
) -> None:
    t0 = time.time()
    genomes = fastx.list_genomes(input_fa)
    if not genomes:
        raise ValueError(f"no FASTA genomes found in {input_fa}")
    genome_of = {fastx.genome_prefix(p): p for p in genomes}
    log.info("building DB from %d genomes", len(genomes))

    log.info("constructing distance matrix (minhash jaccard)")
    names, dist = distance.distance_matrix(
        genomes, k=cfg.ksize, sketch_size=cfg.sketch_size,
        exact=cfg.exact_distance, use_native=use_native)

    log.info("hierarchical clustering (%s, h=%s)", cfg.cls_method,
             cfg.cls_cutoff)
    if custom_cls_file:
        cls95 = cluster_mod.read_cls_map(custom_cls_file)
    else:
        cls95 = cluster_mod.hcls(names, dist, cfg.cls_method, cfg.cls_cutoff)
    log.info("%d primary clusters", len(cls95))

    reps, recls, moved = select_rep.pick_rep(names, dist, cls95)

    log.info("constructing the cluster search tree")
    cst = tree_build.build_cst(names, dist, recls, genome_of, cfg,
                               use_native=use_native, log=log.debug)
    log.info("tree: %d nodes, %d leaves, %d k-mers, %d reconstructed",
             len(cst.node_length), len(cst.recls), cst.all_kmers.size,
             len(cst.reconstructed))

    log.info("building per-cluster strain k-mer matrices")
    multi = {cid: m for cid, m in cst.recls.items() if len(m) > 1}
    l2: Dict[int, l2_build.L2Cluster] = {}
    if cfg.threads > 1 and len(multi) > 1:
        with concurrent.futures.ThreadPoolExecutor(cfg.threads) as ex:
            futs = {
                ex.submit(l2_build.build_cluster_matrix, cid, m, genome_of,
                          cfg, log.debug): cid
                for cid, m in sorted(multi.items(),
                                     key=lambda kv: -len(kv[1]))
            }
            for f in concurrent.futures.as_completed(futs):
                res = f.result()
                l2[res.cid] = res
    else:
        for cid, m in sorted(multi.items(), key=lambda kv: -len(kv[1])):
            l2[cid] = l2_build.build_cluster_matrix(cid, m, genome_of, cfg,
                                                    log.debug)
    log.info("building overlap matrices")
    l2_build.build_overlap_matrices(l2, cst.recls, genome_of, cfg, log.debug)

    db_mod.save_db(out_dir, cst, l2, names, dist, cls95, moved,
                   memory_efficient=cfg.memory_efficient)
    log.info("DB written to %s in %.1fs", out_dir, time.time() - t0)
