"""Internal-telemetry analogs (SURVEY.md §2.6 A1-A5).

A1-A3 (processed/failed frame counts, fetch failures) are per-record
columns rolled up in ``pipeline.sink_aggregates``.  This module adds:

- A4 ``*_cache_size`` gauges: the reference reports LRU sizes
  (sourcemapprocessor/symbolicator.go:126,145 etc.); our "caches" are the
  broadcast dimension tables, so the gauge is their key cardinality.
- A5 ``symbolication_duration``: the reference records a per-record
  histogram; the batch analog is per-stage wall time captured by a Spark
  listener, reported as a small DataFrame-friendly dict.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import SparkSession, functions as F

from symspark.pipeline import Lookups


def store_gauges(lookups: Lookups) -> dict[str, int]:
    """A4: symbol-store sizes (distinct artifact keys, i.e. what the
    reference's LRU would hold at steady state)."""
    return {
        "sourcemap_cache_size": lookups.sourcemap_store.count(),
        "proguard_cache_size": lookups.proguard_store.count(),
        "dsym_cache_size": lookups.dsym_store.count(),
        "sourcemap_token_lines": lookups.sourcemap_tokens.select(
            "url_base", "build_uuid", "min_line"
        ).distinct().count(),
    }


@contextmanager
def stage_timer(metrics: dict, name: str):
    """A5: wall-time histogram entry per pipeline stage/action."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        metrics.setdefault(name, []).append(round(time.perf_counter() - t0, 4))


def duration_summary(metrics: dict) -> dict:
    out = {}
    for name, vals in metrics.items():
        s = sorted(vals)
        out[name] = {
            "count": len(s),
            "p50": s[len(s) // 2],
            "max": s[-1],
            "total": round(sum(s), 4),
        }
    return out


def accumulator_counters(spark: SparkSession):
    """Spark accumulators for per-partition lineage counters — usable from
    mapInPandas operators where DataFrame aggregation isn't available."""
    sc = spark.sparkContext
    return {
        "rows_seen": sc.accumulator(0),
        "frames_seen": sc.accumulator(0),
    }
