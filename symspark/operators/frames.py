"""Parse stage wiring: attach the parsed struct and explode the unified
frame IR.

Raw-text routes go through the vectorized pandas UDF
(functions/parse.py); structured-array routes are pure JVM expressions:
``arrays_zip`` + ``transform`` build the frames, and the mismatched-length
check reproduces sourcemapprocessor/processor.go:260-267 /
proguardprocessor/log_processor.go:197-204 (including the reference's
quirk that the output arrays are emptied *before* the check, so a
mismatch leaves empty arrays behind).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from symspark.config import PipelineConfig
from symspark.functions.parse_arrow import parse_stack_arrow_udf as parse_stack_udf
from symspark.schemas import FRAME_SCHEMA

_UDF_ROUTES = ("js", "jvm", "apple", "mk")

# (field, sql type) in FRAME_SCHEMA order
_FRAME_FIELDS = [(f.name, f.dataType.simpleString()) for f in FRAME_SCHEMA.fields]


def frame_struct(**given: Column) -> Column:
    """Build a full frame struct, nulling unspecified fields."""
    cols = []
    for name, typ in _FRAME_FIELDS:
        c = given.get(name, F.lit(None))
        cols.append(c.cast(typ).alias(name))
    return F.struct(*cols)


def _structured_parsed(cfg: PipelineConfig, kind: str) -> Column:
    """Parsed struct for a structured-array route (JVM-only expressions)."""
    if kind == "js":
        ref_keys = [  # names used in the mismatch error (factory.go:29-33)
            "exception.structured_stacktrace.columns",
            "exception.structured_stacktrace.functions",
            "exception.structured_stacktrace.lines",
            "exception.structured_stacktrace.urls",
        ]
        cols = [cfg.js_columns_col, cfg.js_functions_col, cfg.js_lines_col, cfg.js_urls_col]
        zipped = F.arrays_zip(
            F.col(cfg.js_columns_col).alias("c"),
            F.col(cfg.js_functions_col).alias("f"),
            F.col(cfg.js_lines_col).alias("l"),
            F.col(cfg.js_urls_col).alias("u"),
        )
        frames = F.transform(
            zipped,
            lambda x, i: frame_struct(
                pos=i, kind=F.lit("js"), url=x["u"], func=x["f"], line=x["l"], col=x["c"]
            ),
        )
        # iteration count = columns length (processor.go:253)
        sizes_equal = (
            (F.size(cols[0]) == F.size(cols[1]))
            & (F.size(cols[0]) == F.size(cols[2]))
            & (F.size(cols[0]) == F.size(cols[3]))
        )
    else:
        ref_keys = [  # proguardprocessor/factory.go:31-34
            "exception.structured_stacktrace.classes",
            "exception.structured_stacktrace.methods",
            "exception.structured_stacktrace.lines",
            "exception.structured_stacktrace.source_files",
        ]
        cols = [cfg.jvm_classes_col, cfg.jvm_methods_col, cfg.jvm_lines_col, cfg.jvm_source_files_col]
        zipped = F.arrays_zip(
            F.col(cfg.jvm_classes_col).alias("c"),
            F.col(cfg.jvm_methods_col).alias("m"),
            F.col(cfg.jvm_lines_col).alias("l"),
            F.col(cfg.jvm_source_files_col).alias("s"),
        )
        frames = F.transform(
            zipped,
            lambda x, i: frame_struct(
                pos=i, kind=F.lit("jvm"), cls=x["c"], method=x["m"], line=x["l"], src=x["s"]
            ),
        )
        sizes_equal = (
            (F.size(cols[0]) == F.size(cols[1]))
            & (F.size(cols[0]) == F.size(cols[2]))
            & (F.size(cols[0]) == F.size(cols[3]))
        )

    mismatch_err = F.format_string(
        "mismatched stacktrace attribute lengths: (%s %d) (%s %d) (%s %d) (%s %d)",
        F.lit(ref_keys[0]), F.size(cols[0]),
        F.lit(ref_keys[1]), F.size(cols[1]),
        F.lit(ref_keys[2]), F.size(cols[2]),
        F.lit(ref_keys[3]), F.size(cols[3]),
    )
    empty_frames = F.array().cast(f"array<{FRAME_SCHEMA.simpleString()}>")
    return F.struct(
        F.col(cfg.exception_type_col).alias("name"),
        F.col(cfg.exception_message_col).alias("message"),
        F.lit(None).cast("string").alias("mode"),
        F.when(~sizes_equal, mismatch_err).alias("error"),
        F.when(sizes_equal, frames).otherwise(empty_frames).alias("frames"),
    )


def attach_parsed(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add the ``parsed`` column.

    Default engine ("sql"): js / jvm / apple rows are parsed by JVM
    regexp expressions (functions/parse_sql.py) — only MetricKit rows and
    js rows carrying an Opera marker ship text to the Python UDF, so
    Python-worker CPU stays out of the hot path.  ``cfg.parse_engine ==
    "udf"`` routes every parsed row through the Arrow UDF instead (the
    semantics oracle; tests pin sql == udf on the corpus)."""
    from symspark.functions import parse_sql

    route = F.col(cfg.route_col)
    in_udf = route.isin(*_UDF_ROUTES)
    if cfg.parse_engine == "sql":
        text = F.col("text")
        message = F.col(cfg.exception_message_col)
        opera = F.coalesce(text, F.lit("")).rlike(parse_sql.RE_OPERA_MARKER) | F.coalesce(
            message, F.lit("")
        ).rlike(parse_sql.RE_OPERA_MARKER)
        in_udf = (route == "mk") | ((route == "js") & opera)
    # the MetricKit path reads the MetricKit attribute when present
    # (logs_processor.go:344 — even in the eventName-routed case); the
    # flattened transcript model falls back to text when the attribute is
    # absent (SURVEY.md §1.3)
    mk_src = (
        F.coalesce(F.col(cfg.metrickit_stack_trace_col), F.col("text"))
        if cfg.metrickit_stack_trace_col in df.columns
        else F.col("text")
    )
    udf_parsed = parse_stack_udf(
        F.when(in_udf & (route == "mk"), mk_src).when(in_udf, F.col("text")),
        F.when(in_udf, route),
        F.col(cfg.exception_type_col),
        F.col(cfg.exception_message_col),
    )
    if cfg.udf_parse_strategy == "join":
        # Compute the UDF rows on a side branch and shuffle-hash-join them
        # back: EvalPython nodes report UnknownPartitioning, so an inline
        # UDF column destroys a bucketed input's partitioning and forces
        # the regroup to re-shuffle the FULL table.  With the join, the hot
        # path is JVM-only end-to-end — a conv_id-bucketed input carries
        # its partitioning straight through explode + broadcast joins to
        # the regroup (zero full-table exchanges); only the ~2% UDF branch
        # shuffles.  The side is pre-aggregated to one turn_idx->parsed map
        # per conversation and joined on conv_id ALONE: a co-partitioned
        # join requires all its keys in the child partitioning
        # (requireAllClusterKeysForCoPartition), so a (conv_id, turn_idx)
        # join would have re-shuffled the bucketed big side anyway.
        # shuffle_hash (not SMJ) keeps the streamed side sort-free.
        # Requires unique (conv_id, turn_idx).
        side = (
            df.where(in_udf)
            .groupBy("conv_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("turn_idx"), udf_parsed))
                ).alias("_parsed_udf_map")
            )
        )
        df = df.join(side.hint("shuffle_hash"), ["conv_id"], "left")
        udf_parsed = F.element_at(F.col("_parsed_udf_map"), F.col("turn_idx"))
    parsed = (
        F.when(in_udf, udf_parsed)
        .when(route == "js_structured", _structured_parsed(cfg, "js"))
        .when(route == "jvm_structured", _structured_parsed(cfg, "jvm"))
    )
    if cfg.parse_engine == "sql":
        # stage A: expensive per-line arrays, materialized ONCE as a
        # multi-referenced non-cheap alias (survives CollapseProject)
        df = df.withColumn(
            "_pp", parse_sql.pre_parsed_expr(F.col("text"), route, ~in_udf)
        )
        parsed = parsed.when(
            route.isin("js", "jvm", "apple"),
            parse_sql.parsed_expr(
                F.col("_pp"), route,
                F.col(cfg.exception_type_col), F.col(cfg.exception_message_col),
            ),
        )
        return df.withColumn("parsed", parsed).drop("_pp", "_parsed_udf_map")
    return df.withColumn("parsed", parsed).drop("_parsed_udf_map")


# record-level columns the frame enrichment joins need on every frame row
FRAME_FLAT_COLS = [
    "conv_id",
    "turn_idx",
    "route",
    "source_map_uuid",
    "build_uuid",
    "app_executable",
    "proguard_uuid",
]


def explode_frames(parsed_df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """OUTER-explode the unified frames array (linear plan: one scan, one
    parse, one downstream shuffle — the regroup).  Rows without frames
    (skip / parse-error / empty) survive as a single null-frame row, so no
    second branch re-reads the input.

    Only the join-key columns ride flat on every frame row; the rest of the
    record payload is packed into one ``rec`` struct attached to the FIRST
    frame only, so the regroup shuffle moves each record's payload once
    instead of once per frame."""
    parsed = F.col("parsed")
    # parsed["mode"] (the TraceKit parse mode) is deliberately NOT carried:
    # record assembly never reads it, and every column here rides the rec
    # payload across the regroup exchange — shuffle bytes are the scaling
    # bottleneck, so the payload carries exactly what assembly consumes.
    df = parsed_df.withColumns(
        {
            "p_name": parsed["name"],
            "p_message": parsed["message"],
            "p_error": parsed["error"],
        }
    )
    payload_cols = [c for c in df.columns if c != "parsed" and c not in FRAME_FLAT_COLS]
    exploded = df.select(
        *FRAME_FLAT_COLS,
        F.struct(*payload_cols).alias("_rec_full"),
        F.explode_outer("parsed.frames").alias("fr"),
    )
    rec = F.when(F.col("fr").isNull() | (F.col("fr.pos") == 0), F.col("_rec_full"))
    from symspark.operators.common import init_outcome_cols

    return init_outcome_cols(
        exploded.select(*FRAME_FLAT_COLS, rec.alias("rec"), "fr.*")
    )
