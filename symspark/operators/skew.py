"""Skew-aware conversation-level aggregation (SURVEY.md §4 item 1).

The transcript table has hot conversations (~1% of conv_ids carry 100x
turns — FIXTURES.md §1).  The core pipeline shuffles on (conv_id,
turn_idx), which is naturally balanced, but conv-LEVEL aggregations
(per-conversation rollups) hash on conv_id alone and a hot key lands on
one task.  ``salted_agg`` is the classic two-phase fix: partial-aggregate
on (key, salt) — spreading a hot key over S tasks — then merge on key.
AQE skew handling (enabled in session.py) remains the runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_buckets: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> groupBy(key).

    ``partial_aggs``: alias -> aggregate over the raw rows.
    ``merge_aggs``: alias -> aggregate over the partial columns.
    ``salt_from``: a column whose hash provides the salt (defaults to a
    deterministic spread via monotonically_increasing_id-free hash of all
    partial keys — pass e.g. "turn_idx" for reproducible tests).
    """
    salt_src = F.col(salt_from) if salt_from else F.spark_partition_id()
    salt = F.pmod(F.xxhash64(salt_src), F.lit(salt_buckets)).alias("_salt")
    partial = df.groupBy(F.col(key), salt).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(key).agg(*[c.alias(a) for a, c in merge_aggs.items()])


def conversation_rollup(enriched: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Per-conversation rollup of the enriched pipeline output (turn counts,
    failure counts, frame counters) with salt-based skew mitigation."""
    return salted_agg(
        enriched,
        "conv_id",
        partial_aggs={
            "n_turns": F.count(F.lit(1)),
            "n_failed": F.sum(
                F.when(F.col("exception_symbolicator_failed"), 1).otherwise(0)
            ),
            "frames_processed": F.sum(F.coalesce(F.col("frames_processed"), F.lit(0))),
            "frames_failed": F.sum(F.coalesce(F.col("frames_failed"), F.lit(0))),
        },
        merge_aggs={
            "n_turns": F.sum("n_turns"),
            "n_failed": F.sum("n_failed"),
            "frames_processed": F.sum("frames_processed"),
            "frames_failed": F.sum("frames_failed"),
        },
        salt_buckets=salt_buckets,
        salt_from="turn_idx",
    )
