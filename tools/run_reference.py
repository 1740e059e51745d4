"""Run the reference StrainScan CLI (python 3.7-era code) under the
modern interpreter in this image, for head-to-head parity testing.

Usage:
    python tools/run_reference.py <ref_root> <workdir> <script> [args...]

<ref_root>  a WRITABLE copy of /root/reference with an executable
            library/jellyfish-linux (see tests/ref_harness.py)
<workdir>   scratch cwd — the reference writes temp_<uuid>.jf/.fa there
<script>    StrainScan.py / StrainScan_build.py / StrainScan_subsample.py

Compatibility patches applied before the script runs (API renames only —
numerics are untouched):
  * scipy >= 1.14 removed sparse ``.A``            (used at
    identify_strains_L2_Enet_Pscan_new_sp.py:192,201)
  * sklearn >= 1.2 removed ElasticNet(normalize=)  (used at :440,451)
  * ``treelib`` is not installed — tools/refcompat provides a shim.
"""

import os
import runpy
import sys


def _patch_modern_apis():
    # Python >= 3.11 removed random.sample on sets (used for node k-mer
    # down-sampling, Build_tree.py:339,591,627); 3.7 listified internally.
    import random

    _sample = random.sample

    def sample(population, k, **kw):
        if isinstance(population, (set, frozenset, dict)):
            population = list(population)
        return _sample(population, k, **kw)

    random.sample = sample

    # Deterministic directory listings: the reference clusters genomes
    # in os.listdir order (Cluster.py:20-22, StrainScan.py:49), which is
    # filesystem-arbitrary; cutree cluster NUMBERING follows observation
    # order, so parity tests need a defined order.  Sorting is a
    # determinism patch only — no numeric behavior changes.
    _listdir = os.listdir

    def listdir(path="."):
        return sorted(_listdir(path))

    os.listdir = listdir

    import scipy.sparse as sp

    if not hasattr(sp.csr_matrix, "A"):
        sp.spmatrix.A = property(lambda self: self.toarray())

    import sklearn.linear_model as lm

    # Replace the names the reference imports with thin factories (sklearn
    # rejects patched __init__ signatures); numerics are unchanged —
    # normalize=False was the old no-op default and n_alphas=<int> folded
    # into alphas=<int> with the same auto grid.
    _EN, _ENCV = lm.ElasticNet, lm.ElasticNetCV

    def ElasticNet(*args, normalize=False, **kw):
        if normalize:
            raise TypeError("normalize=True unsupported by shim")
        return _EN(*args, **kw)

    def ElasticNetCV(*args, normalize=False, n_alphas=None, **kw):
        if normalize:
            raise TypeError("normalize=True unsupported by shim")
        if n_alphas is not None:
            kw.setdefault("alphas", n_alphas)
        return _ENCV(*args, **kw)

    lm.ElasticNet = ElasticNet
    lm.ElasticNetCV = ElasticNetCV


def main():
    ref_root = os.path.abspath(sys.argv[1])
    workdir = os.path.abspath(sys.argv[2])
    script = sys.argv[3]
    args = sys.argv[4:]

    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "refcompat")
    sys.path.insert(0, os.path.join(ref_root, "library"))
    sys.path.insert(0, ref_root)
    sys.path.insert(0, shim)
    # plasmid mode shells `python StrainScan_build.py` / `Rscript ...`
    # (StrainScan.py:235, Cluster.py:58): resolve them to the harness
    # wrappers staged by tests/ref_harness.ensure_ref_copy
    bin_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".refrun", "bin")
    if os.path.isdir(bin_dir):
        os.environ["PATH"] = bin_dir + os.pathsep + os.environ.get(
            "PATH", "")
    _patch_modern_apis()

    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    sys.argv = [script] + args
    try:
        runpy.run_path(os.path.join(ref_root, script), run_name="__main__")
    except SystemExit as e:
        code = e.code
        if code is None:
            code = 0
        sys.exit(code if isinstance(code, int) else 1)


if __name__ == "__main__":
    main()
