"""Prometheus-style metrics registry — the quickwit-common metrics analog.

The reference registers named int counters/gauges in a global prometheus
registry (quickwit-common/src/metrics.rs:22-33) and serves them in the
Prometheus text exposition format at ``GET /metrics``
(quickwit-serve/src/rest.rs:52-54, metrics.rs:35-41 ``metrics_handler``).
This module is the dependency-free equivalent: a process-global registry
of thread-safe counters and gauges plus a ``render()`` that emits the
text format (``# HELP`` / ``# TYPE`` / ``name value`` lines).

Metric names keep the reference's ``component:subsystem:name`` colon
convention (quickwit-serve/src/counters.rs:31 —
``rest_api:search:num_requests``); colons are valid Prometheus metric
name characters and round-trip through standard scrapers.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_registry: dict[str, "_Metric"] = {}


class _Metric:
    """One named int metric. Increments are lock-protected — the REST
    server handles requests on a thread pool (ThreadingHTTPServer), so
    bare ``+=`` would drop counts under contention."""

    kind = "counter"

    def __init__(self, name: str, description: str):
        self.name = name
        self.description = description
        self._value = 0
        self._mu = threading.Lock()

    def inc(self, n: int = 1) -> None:
        with self._mu:
            self._value += n

    def get(self) -> int:
        with self._mu:
            return self._value


class Counter(_Metric):
    kind = "counter"


class Gauge(_Metric):
    kind = "gauge"

    def set(self, v: int) -> None:
        with self._mu:
            self._value = int(v)

    def dec(self, n: int = 1) -> None:
        self.inc(-n)


def _register(metric: _Metric) -> _Metric:
    with _lock:
        existing = _registry.get(metric.name)
        if existing is not None:
            # idempotent re-registration (module reloads in tests); the
            # reference panics instead, but a long-lived Spark driver
            # re-importing serve must not lose its counts
            return existing
        _registry[metric.name] = metric
        return metric


def new_counter(name: str, description: str) -> Counter:
    """quickwit-common/src/metrics.rs:22-27 analog."""
    return _register(Counter(name, description))


def new_gauge(name: str, description: str) -> Gauge:
    """quickwit-common/src/metrics.rs:29-33 analog."""
    return _register(Gauge(name, description))


def render() -> str:
    """Prometheus text exposition format, one family per metric
    (metrics.rs:35-41 ``metrics_handler`` analog).  Sorted by name so
    the output is deterministic for scrapers and tests."""
    with _lock:
        metrics = sorted(_registry.values(), key=lambda m: m.name)
    lines = []
    for m in metrics:
        lines.append(f"# HELP {m.name} {m.description}")
        lines.append(f"# TYPE {m.name} {m.kind}")
        lines.append(f"{m.name} {m.get()}")
    return "\n".join(lines) + "\n"


# Prometheus text format content type (what the reference's TextEncoder
# advertises)
CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"
