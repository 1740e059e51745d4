"""Phase timing / memory / device-trace observability.

The reference scatters wall-clock prints and psutil RSS dumps across
modules (identify.py:503, Build_tree.py:372-373, StrainScan_build.py:147 —
SURVEY §5).  Here: one ``phase`` context manager that logs elapsed time and
RSS, and an opt-in ``jax.profiler`` trace via STRAINSCAN_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("strainscan_tpu")

# last elapsed seconds per phase name — lets benchmarks (benchmarks/scale.py)
# record per-stage breakdowns without parsing log text
PHASE_TIMES: dict = {}


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return float("nan")


@contextlib.contextmanager
def phase(name: str):
    """Log elapsed wall time + RSS for a pipeline phase; when
    STRAINSCAN_TRACE_DIR is set, also capture a jax.profiler trace."""
    trace_dir = os.environ.get("STRAINSCAN_TRACE_DIR")
    t0 = time.time()
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax

        ctx = jax.profiler.trace(os.path.join(trace_dir, name))
    with ctx:
        yield
    dt = time.time() - t0
    PHASE_TIMES[name] = dt
    log.info("phase %-28s %8.2fs  rss %.2f GB", name, dt, _rss_gb())


@contextlib.contextmanager
def phase_acc(name: str):
    """Accumulating (silent) variant of :func:`phase` for hot spots called
    many times — e.g. the per-cluster L2 host loops; read the totals from
    PHASE_TIMES after the run."""
    t0 = time.time()
    yield
    PHASE_TIMES[name] = PHASE_TIMES.get(name, 0.0) + (time.time() - t0)
