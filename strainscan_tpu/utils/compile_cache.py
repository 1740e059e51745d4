"""Persistent XLA compilation cache setup (shared by the CLI and the
library entry points).

Repeat identify runs skip the one-time jit compiles — tens of seconds
per batch shape on remote-compile TPU setups — by pointing JAX at a
persistent on-disk cache.  Opt out with ``STRAINSCAN_JAX_CACHE=0``;
point it elsewhere with ``STRAINSCAN_JAX_CACHE=<dir>``.
"""

from __future__ import annotations

import logging
import os

_DONE = False


def enable_compile_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    loc = os.environ.get("STRAINSCAN_JAX_CACHE", "")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(os.path.expanduser("~"), ".cache",
                           "strainscan_tpu", "jax")
    try:
        import jax

        os.makedirs(loc, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is an optimization, never fatal
        logging.debug("compilation cache unavailable: %s", e)
