"""Helpers to run the actual reference implementation
(/root/reference/StrainScan.py) for head-to-head parity tests.

The reference checkout is read-only and its bundled jellyfish binary is
not executable, so we stage a minimal writable copy (python sources +
jellyfish) under <repo>/.refrun/ once per machine and drive it through
tools/run_reference.py (which shims treelib and two renamed
numpy/scipy/sklearn APIs).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from typing import Dict, List

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference"
REF_COPY = os.path.join(REPO, ".refrun", "reference")


def ensure_ref_copy() -> str:
    """Stage a writable reference copy with an executable jellyfish,
    plus the tool shims the plasmid path needs: a ``dashing_s128``
    stand-in (the real binary is absent from the checkout), and a bin/
    dir holding ``python`` and ``Rscript`` wrappers picked up via PATH
    when StrainScan.py re-invokes the build (StrainScan.py:235,
    Cluster.py:58-66)."""
    jf = os.path.join(REF_COPY, "library", "jellyfish-linux")
    bin_dir = os.path.join(REPO, ".refrun", "bin")
    dash = os.path.join(REF_COPY, "library", "dashing_s128")
    if not (os.path.isfile(jf) and os.access(jf, os.X_OK)
            and os.path.isfile(dash)
            and os.path.isfile(os.path.join(bin_dir, "python"))):
        if os.path.isdir(REF_COPY):
            shutil.rmtree(REF_COPY)
        os.makedirs(os.path.join(REF_COPY, "library"))
        for fn in os.listdir(REF_SRC):
            src = os.path.join(REF_SRC, fn)
            if fn.endswith(".py") and os.path.isfile(src):
                shutil.copy(src, os.path.join(REF_COPY, fn))
        libdir = os.path.join(REF_SRC, "library")
        for fn in os.listdir(libdir):
            src = os.path.join(libdir, fn)
            if (fn.endswith(".py") or fn == "jellyfish-linux") \
                    and os.path.isfile(src):
                shutil.copy(src, os.path.join(REF_COPY, "library", fn))
        os.chmod(jf, 0o755)
        with open(dash, "w") as f:
            f.write("#!/bin/sh\n"
                    f'exec "{sys.executable}" '
                    f'"{os.path.join(REPO, "tools", "ref_dashing.py")}" '
                    '"$@"\n')
        os.chmod(dash, 0o755)
        os.makedirs(bin_dir, exist_ok=True)
        runref = os.path.join(REPO, "tools", "run_reference.py")
        with open(os.path.join(bin_dir, "python"), "w") as f:
            # os.system('python StrainScan_build.py ...') from the
            # plasmid path -> re-enter the compat wrapper with the same
            # cwd so the child build gets the same shims
            f.write("#!/bin/sh\n"
                    f'exec "{sys.executable}" "{runref}" "{REF_COPY}" '
                    '"$PWD" "$@"\n')
        os.chmod(os.path.join(bin_dir, "python"), 0o755)
        with open(os.path.join(bin_dir, "Rscript"), "w") as f:
            f.write("#!/bin/sh\n"
                    f'exec "{sys.executable}" '
                    f'"{os.path.join(REPO, "tools", "ref_rscript.py")}" '
                    '"$@"\n')
        os.chmod(os.path.join(bin_dir, "Rscript"), 0o755)
    return REF_COPY


def jellyfish_ok() -> bool:
    try:
        ref = ensure_ref_copy()
        out = subprocess.run(
            [os.path.join(ref, "library", "jellyfish-linux"), "--version"],
            capture_output=True, timeout=30)
        return out.returncode == 0
    except Exception:
        return False


def run_reference(script: str, args: List[str], workdir: str,
                  timeout: int = 900) -> subprocess.CompletedProcess:
    """Run a reference CLI script in `workdir` via the compat wrapper."""
    os.makedirs(workdir, exist_ok=True)
    cmd = [sys.executable, os.path.join(REPO, "tools", "run_reference.py"),
           ensure_ref_copy(), workdir, script] + list(args)
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")  # wrapper never imports jax
    return subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, env=env)


def parse_report(path: str) -> List[Dict[str, str]]:
    """Parse a final_report.txt / StrainVote.report into header-keyed rows."""
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    header = lines[0].split("\t")
    return [dict(zip(header, l.split("\t"))) for l in lines[1:]]
