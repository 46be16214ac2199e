"""Persistent XLA compilation cache for production serving.

A cold one-shot calculator call at 131k atoms pays 83–177 s of XLA
compilation on TPU (`artifacts/bench_oneshot_r5.json`) against a warm
call of 2.8–6.9 s — the compile, not the compute, dominates any
process that evaluates a handful of frames and exits (the reference's
serving pattern: one `calculate()` per LAMMPS/ASE driver process).
JAX's persistent compilation cache serializes compiled executables to
disk keyed by (HLO, compile options, backend), so every process after
the first starts warm.

Enabled automatically (idempotent) by `TensorAlloyCalculator` and the
CLI on accelerator backends. Opt out with TENSORALLOY_NO_CACHE=1; move
it with TENSORALLOY_CACHE_DIR=<dir> (default
``~/.cache/tensoralloy_tpu/xla``).

CPU is excluded by default: test/dev runs would write thousands of
tiny executables for no wall-clock win (CPU compiles are fast), and
the suite pins numerics with fresh compiles on purpose.
"""
from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 1.0,
                             include_cpu: bool = False) -> bool:
    """Idempotently turn on JAX's persistent compilation cache.

    Returns True when the cache is active after the call. Safe to call
    before or after the backend initializes; a failure (read-only
    filesystem, unsupported backend) degrades to no caching rather
    than raising.
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("TENSORALLOY_NO_CACHE"):
        return False
    try:
        import jax

        if not include_cpu:
            # decide from the CONFIGURED platform without initializing
            # a backend: backend init here would contact the TPU
            # plugin, which blocks/retries for minutes when another
            # process holds the device — the known axon-tunnel hazard
            # (see tests/conftest.py)
            configured = (getattr(jax.config, "jax_platforms", None)
                          or os.environ.get("JAX_PLATFORMS", ""))
            first = str(configured).split(",")[0].strip().lower()
            if first == "cpu":
                return False
        path = (cache_dir
                or os.environ.get("TENSORALLOY_CACHE_DIR")
                or os.path.join(os.path.expanduser("~"), ".cache",
                                "tensoralloy_tpu", "xla"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        _enabled = True
        return True
    except Exception:
        return False
