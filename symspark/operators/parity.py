"""A/B parity harness (SURVEY.md §2.5 M13).

The reference's parity-checking mode runs a stack trace through BOTH the
structured route (client-side TraceKit arrays) and the collector-side
parser and emits per-frame comparison attributes
(sourcemapprocessor/parity.go:41-127): ``tracekit.*`` and
``processorParser.*`` frame arrays, per-frame ``consistent``/``different``
verdicts, a status enum, and a mismatch count.

Here the comparison is pure column algebra over the already-parsed frame
IR: zip the structured arrays with the UDF-parsed frames and fold the
verdicts with higher-order functions — no extra Python pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from symspark.config import DEFAULT_CONFIG, PipelineConfig
from symspark.functions.parse_arrow import parse_stack_arrow_udf as parse_stack_udf

# status enum (parity.go:14-37)
STATUS_BOTH_MATCH = "match"
STATUS_MISMATCH = "mismatch"
STATUS_PARSER_FAILED = "parser_failed"
STATUS_NOT_APPLICABLE = "not_applicable"


def add_parity_columns(df: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """For rows that carry BOTH the structured JS arrays and a raw stack
    text, parse the raw text and compare frame-by-frame."""
    has_both = (
        F.col(cfg.js_columns_col).isNotNull()
        & F.col(cfg.js_functions_col).isNotNull()
        & F.col(cfg.js_lines_col).isNotNull()
        & F.col(cfg.js_urls_col).isNotNull()
        & F.col("text").isNotNull()
    )
    parsed = parse_stack_udf(
        F.when(has_both, F.col("text")),
        F.when(has_both, F.lit("js")),
        F.col(cfg.exception_type_col),
        F.col(cfg.exception_message_col),
    )
    df = df.withColumn("_p", parsed)
    p = F.col("_p")

    parser_frames = p["frames"]
    n_struct = F.size(cfg.js_urls_col)
    n_parsed = F.size(parser_frames)

    # per-frame verdict: url, func, line, col all equal (nulls on the parsed
    # side are -1-coded, matching processor.go:288-297)
    zipped = F.zip_with(
        F.arrays_zip(
            F.col(cfg.js_urls_col).alias("u"),
            F.col(cfg.js_functions_col).alias("f"),
            F.col(cfg.js_lines_col).alias("l"),
            F.col(cfg.js_columns_col).alias("c"),
        ),
        parser_frames,
        lambda s, q: (
            (s["u"].eqNullSafe(q["url"]))
            & (s["f"].eqNullSafe(q["func"]))
            & (s["l"].eqNullSafe(q["line"]))
            & (s["c"].eqNullSafe(q["col"]))
        ),
    )
    verdicts = F.transform(zipped, lambda ok: F.when(ok, "consistent").otherwise("different"))
    mismatches = F.size(F.filter(zipped, lambda ok: ~ok))

    status = (
        F.when(~has_both, F.lit(STATUS_NOT_APPLICABLE))
        .when(p["error"].isNotNull(), F.lit(STATUS_PARSER_FAILED))
        .when((n_struct == n_parsed) & (mismatches == 0), F.lit(STATUS_BOTH_MATCH))
        .otherwise(F.lit(STATUS_MISMATCH))
    )
    return (
        df.withColumn("parity_status", status)
        .withColumn("parity_mismatch_count", F.when(has_both & p["error"].isNull(), mismatches))
        .withColumn("parity_frame_verdicts", F.when(has_both & p["error"].isNull(), verdicts))
        .withColumn(
            "parity_parser_urls",
            F.when(has_both, F.transform(parser_frames, lambda q: q["url"])),
        )
        .drop("_p")
    )


def parity_report(df: DataFrame) -> DataFrame:
    """Aggregate parity outcomes (the reference reports these as span
    attributes; here they roll up per status)."""
    return (
        df.groupBy("parity_status")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.coalesce(F.col("parity_mismatch_count"), F.lit(0))).alias("total_mismatches"),
        )
        .orderBy("parity_status")
    )
