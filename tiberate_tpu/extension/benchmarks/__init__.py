"""Benchmark registry with module auto-discovery (reference
``benchmarks/__init__.py:8-18``)."""

import importlib
import pkgutil

from tiberate_tpu.extension.benchmarks.interface import (
    BenchmarkBase,
    BenchmarkResult,
    Metric,
    MetricKind,
    benchreg,
)

# Auto-import every bench_* module in this package so registrations run.
for _mod in pkgutil.iter_modules(__path__):
    if _mod.name.startswith("bench_"):
        importlib.import_module(f"{__name__}.{_mod.name}")

__all__ = [
    "BenchmarkBase",
    "BenchmarkResult",
    "Metric",
    "MetricKind",
    "benchreg",
]
