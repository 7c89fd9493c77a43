"""Structured Streaming variant of the pipeline (SURVEY.md §1.3, S1).

The reference is a push pipeline (OTLP receiver -> processors -> exporter);
the streaming analog is:

- ``run_streaming``: file-source ``readStream`` over the transcript
  directory -> ``foreachBatch`` running the SAME batch pipeline per
  micro-batch -> routed fan-out append.  foreachBatch is the idiomatic way
  to reuse multi-join/regroup batch logic (broadcast enrichment joins are
  not restricted inside it).  foreachBatch delivery is at-least-once; the
  batch write is keyed on batch_id (``batch=<id>`` subdirectory,
  overwrite), so a micro-batch replayed after a failure between the write
  and the checkpoint commit overwrites itself - effectively exactly-once.
- ``streaming_sink_metrics``: a NATIVE streaming aggregation — per-minute
  per-route counters with an event-time watermark for late data — the
  streaming form of the reference's internal telemetry (SURVEY.md §2.6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from symspark.config import DEFAULT_CONFIG, PipelineConfig
from symspark.operators import route as route_op
from symspark.pipeline import Lookups, run_pipeline
from symspark.schemas import TRANSCRIPTS_SCHEMA


def run_streaming(
    spark: SparkSession,
    input_dir: str,
    lookups: Lookups,
    out_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream transcript parquet files through the full pipeline."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        enriched = run_pipeline(batch_df, lookups, cfg)
        # idempotent per-batch write: replay of a batch_id overwrites its
        # own subdirectory instead of blind-appending duplicates
        (
            enriched.write.mode("overwrite")
            .partitionBy("route", "outcome")
            .parquet(os.path.join(out_dir, "sinks", f"batch={batch_id}"))
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sink_metrics(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Native streaming aggregation: per-window per-route record counts with
    an event-time watermark (late rows beyond the watermark are dropped)."""
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    routed = route_op.gate_and_route(stream, cfg)
    return (
        routed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col(cfg.route_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(cfg.route_col),
            F.col("n"),
        )
    )
