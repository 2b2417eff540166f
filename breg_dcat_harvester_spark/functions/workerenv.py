"""Per-worker native-thread pinning for Arrow-batched UDFs.

A Spark python worker is a ONE-core unit of work: the scheduler already
runs `spark.executor.cores`-many of them per executor (local[N] runs N).
But the native libraries those workers call size their internal pools to
*hardware_concurrency* — pyarrow's compute/IO pools and any OpenMP-backed
BLAS each think they own the whole machine.  At 32 concurrent workers on a
32-core host that is up to 32x32 runnable threads; the resulting scheduler
thrash measurably collapses throughput (extract+merge on a cached 10M-turn
corpus at local[32]: 331k rows/s oversubscribed vs 503k rows/s pinned —
a 1.5x penalty, growing with core count).

``pin_native_threads()`` caps those pools at one thread and is called at
the top of every mapInPandas/pandas_udf hot path in this package.  It is
idempotent and per-process; with ``spark.python.worker.reuse`` (default
on) the cost is one call per task on an already-pinned worker (~ns).

The driver process is NOT pinned: driver-side pyarrow (toPandas of small
results, IVF centroid probes) keeps its default pool.
"""

from __future__ import annotations

import os

_PINNED = False

# BLAS pools read their env at library load; set before numpy's first use
# in this process.  Harmless if numpy is already loaded (pyarrow's pool is
# resized dynamically and is the dominant term anyway).
_ENV_CAPS = (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "VECLIB_MAXIMUM_THREADS",
    "NUMEXPR_NUM_THREADS",
)


def pin_native_threads() -> None:
    """Cap pyarrow + BLAS thread pools at 1 in this process (idempotent)."""
    global _PINNED
    if _PINNED:
        return
    for var in _ENV_CAPS:
        os.environ.setdefault(var, "1")
    try:
        import pyarrow as pa

        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
    except Exception:  # pragma: no cover — pyarrow always present in-sandbox
        pass
    _PINNED = True


def pinned(fn):
    """Decorator form: pin pools, then run the UDF body.

    Wrap any generator/function handed to mapInPandas / mapInArrow /
    applyInPandas so the pinning invariant is structural instead of a
    per-kernel incantation (tests/test_workerenv_lint.py enforces that
    every module with a Python boundary references one of the two forms).
    """
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        pin_native_threads()
        return fn(*args, **kwargs)

    return wrapper
