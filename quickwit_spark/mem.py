"""Allocator tuning for hosts with slow first-touch page faults.

Some virtualized hosts (lazy/ballooned guest memory) serve first-touch page
faults at ~0.05 GB/s while already-resident pages run at >15 GB/s.  glibc
malloc returns every allocation above M_MMAP_THRESHOLD (default 128 KiB)
straight to mmap and munmaps it on free, so each large numpy/pandas temp in
the build/search kernels re-faults all of its pages on every call — a 10-50x
slowdown under such hosts.

`tune_allocator()` flips glibc to arena-retention mode at runtime via
mallopt(3): large blocks come from the heap and freed memory is kept (never
trimmed back to the OS), so pages are faulted once per worker process and
then reused at full speed.  Workers are long-lived (spark.python.worker.reuse
defaults to true), so retention is bounded by each worker's peak working set.

Called from quickwit_spark/__init__.py, which every executor-side UDF module
imports — i.e. it runs once per python worker as well as in the driver.
No-op on non-glibc platforms.
"""
from __future__ import annotations

import os

# mallopt parameter numbers from glibc <malloc.h>
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_allocator() -> bool:
    """Idempotently apply the retention tuning; returns True if applied."""
    global _done
    if _done:
        return True
    if os.environ.get("QW_NO_MALLOC_TUNING") == "1":
        return False
    try:
        import ctypes

        libc = ctypes.CDLL(None, use_errno=True)
        mallopt = libc.mallopt
        mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
        mallopt.restype = ctypes.c_int
        # Serve allocations up to 1 GiB from the sbrk/arena heap instead of
        # per-allocation mmap, and never trim freed arena memory back to the
        # OS — freed pages stay resident and are reused warm.
        ok1 = mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        ok2 = mallopt(_M_TRIM_THRESHOLD, 2**31 - 1)
        _done = bool(ok1 and ok2)
    except Exception:
        _done = False
    try:
        # Arrow's default pool is jemalloc, which purges dirty pages after a
        # decay window — same refault problem for parquet/Arrow buffers.
        # -1 disables decay: freed pages are retained and reused warm.
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass
    return _done


def worker_env() -> dict[str, str]:
    """Env vars that apply the same tuning to child processes (JVM-spawned
    python workers inherit the JVM env, which inherits the driver env) —
    belt-and-braces for code paths that allocate before importing us."""
    return {
        "MALLOC_MMAP_THRESHOLD_": str(1 << 30),
        "MALLOC_TRIM_THRESHOLD_": str(2**31 - 1),
    }
