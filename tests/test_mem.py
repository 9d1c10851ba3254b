"""Allocator tuning (mem.py) is applied on package import and is idempotent."""

from quickwit_spark.mem import tune_allocator, worker_env


def test_tune_allocator_applied():
    # quickwit_spark/__init__ already called it; a second call is a no-op True
    assert tune_allocator() is True


def test_worker_env_values():
    env = worker_env()
    assert int(env["MALLOC_MMAP_THRESHOLD_"]) == 1 << 30
    assert int(env["MALLOC_TRIM_THRESHOLD_"]) > 0
