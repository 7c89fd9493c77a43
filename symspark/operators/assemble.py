"""Regroup + record assembly (SURVEY.md §2.5 M3-M12, §2.6).

Frame outcomes regroup per (conv_id, turn_idx) into a pos-sorted struct
array (record payload rides along via ``first``); ALL record-level
semantics — the dSYM negative-cache quirks, headers, text reassembly,
failure flags, counter totals, preserve-originals, stamps — are JVM
expressions over that array.  The whole pipeline therefore has exactly one
exchange (the regroup) and stays inside whole-stage codegen.

Reference quirks mirrored as array transforms (tests pin them):
- apple: a missing dSYM passes through the FIRST frame per (record, uuid)
  without failure, but every LATER frame of that uuid gets the cached
  FetchError and marks the record failed
  (dsymprocessor/logs_processor.go:240-243 vs :256-258).
- MetricKit: the cached FetchError (or a symbol-lookup failure) ABORTS the
  record at that frame: output is never written and later frames are not
  counted (logs_processor.go:362-393,435-447).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from symspark.config import PipelineConfig

ERR_PARTIAL = "symbolication failed for some stack frames"  # errPartialSymbolication

# frame fields produced by the parse/explode stage (schemas.FRAME_SCHEMA)
_FRAME_FIELDS = [
    "pos", "stack_idx", "kind", "url", "func", "line", "col", "cls", "method",
    "src", "raw", "prefix", "lib", "tok", "addr", "bin", "buuid",
]

_EF_FIELDS = [
    "pos", "stack_idx", "kind", "chunk", "f_failed", "f_err", "miss_uuid",
    "miss_err", "proc_inc", "fail_inc", "fetch_key",
    "m_col", "m_func", "m_line", "m_url", "m_jvm",
]


def regroup(frames: DataFrame) -> DataFrame:
    """Collect enriched frames back into per-record pos-sorted arrays; the
    packed record payload (``rec``, present on the first frame only) and the
    flat join-key columns ride along via ``first``.  Null-frame rows
    (skip / no frames) collect to an empty array.

    The outcome fields arrive as flat ``o_*`` columns (operators/common.py)
    and are packed into the per-frame struct only here — the one place a
    struct is genuinely needed (collect_list element)."""
    ef_cols = [F.col("pos").alias("pos"), F.col("stack_idx").alias("stack_idx"),
               F.col("kind").alias("kind")]
    ef_cols += [F.col(f"o_{f}").alias(f) for f in _EF_FIELDS if f not in ("pos", "stack_idx", "kind")]
    ef = F.when(F.col("pos").isNotNull(), F.struct(*ef_cols))

    flat_cols = [
        c for c in frames.columns
        if c not in _FRAME_FIELDS and c not in ("rec", "conv_id", "turn_idx")
        and not c.startswith("o_")
    ]
    aggs = [F.first(c).alias(c) for c in flat_cols]
    aggs.append(F.first("rec", ignorenulls=True).alias("rec"))
    aggs.append(F.sort_array(F.collect_list(ef)).alias("efs"))
    grouped = frames.groupBy("conv_id", "turn_idx").agg(*aggs)
    # unpack the payload struct back to top-level columns for assembly
    return grouped.select("conv_id", "turn_idx", *flat_cols, "efs", "rec.*")


def _patched_frames(efs: Column) -> Column:
    """Apply the dSYM negative-cache quirks as pure array transforms."""

    def rebuild(x: Column, **patch: Column) -> Column:
        return F.struct(
            *[(patch[f] if f in patch else x[f]).alias(f) for f in _EF_FIELDS]
        )

    # pass 1: later frames of an already-missed uuid hit the cached FetchError
    def later_miss_patch(x: Column, i: Column) -> Column:
        seen_before = F.exists(
            F.slice(efs, F.lit(1), i),
            lambda y: y["miss_uuid"].isNotNull() & (y["miss_uuid"] == x["miss_uuid"]),
        )
        hit = x["miss_uuid"].isNotNull() & seen_before
        apple = rebuild(
            x, f_failed=F.lit(True), proc_inc=F.lit(0), fail_inc=F.lit(0),
            fetch_key=F.lit(None).cast("string"),
        )
        mk = rebuild(
            x, f_err=x["miss_err"], chunk=F.lit(None).cast("string"),
            f_failed=F.lit(True), proc_inc=F.lit(0), fail_inc=F.lit(0),
            fetch_key=F.lit(None).cast("string"),
        )
        return (
            F.when(hit & (x["kind"] == "apple"), apple)
            .when(hit & (x["kind"] == "mk"), mk)
            .otherwise(x)
        )

    efs1 = F.transform(efs, later_miss_patch)

    # pass 2: MetricKit aborts at the first erroring frame — later frames are
    # never reached (no counters, no fetches, no error text)
    abort = F.try_element_at(F.filter(efs1, lambda x: x["f_err"].isNotNull()), F.lit(1))

    def post_abort_patch(x: Column) -> Column:
        past = abort.isNotNull() & (x["pos"] > abort["pos"]) & x["kind"].startswith("mk")
        return F.when(
            past,
            rebuild(
                x, proc_inc=F.lit(0), fail_inc=F.lit(0),
                fetch_key=F.lit(None).cast("string"), f_err=F.lit(None).cast("string"),
            ),
        ).otherwise(x)

    return F.transform(efs1, post_abort_patch)


def _mk_text(efs: Column) -> Column:
    """Two-level MetricKit join: frames within a stack joined with
    "\\n    ", stacks joined with "\\n\\n\\n" (logs_processor.go:395-398)."""
    acc0 = F.struct(F.lit("").alias("t"), F.lit(-1).alias("si"))
    return F.aggregate(
        efs,
        acc0,
        lambda acc, x: F.struct(
            F.concat(
                acc["t"],
                F.when(acc["si"] == -1, F.lit(""))
                .when(x["stack_idx"] != acc["si"], F.lit("\n\n\n"))
                .otherwise(F.lit("\n    ")),
                F.coalesce(x["chunk"], F.lit("")),
            ).alias("t"),
            x["stack_idx"].alias("si"),
        ),
        lambda acc: acc["t"],
    )


def _isum(efs: Column, field: str) -> Column:
    return F.aggregate(
        efs, F.lit(0), lambda acc, x: acc + F.coalesce(x[field], F.lit(0))
    ).cast("long")


def assemble_records(grouped: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Build the final record columns from the regrouped frame arrays."""
    df = grouped.withColumn("efs", _patched_frames(F.col("efs")))

    route = F.col(cfg.route_col)
    is_js = route.isin("js", "js_structured")
    is_jvm = route.isin("jvm", "jvm_structured")
    parsed_route = route.isin("js", "jvm")
    structured_route = route.isin("js_structured", "jvm_structured")
    processed = route != "skip"
    text = F.col("text")
    efs = F.col("efs")

    # --- record-level pre-frame errors ---
    missing = "missing attribute: %s"
    pre_err = (
        F.when(is_jvm & F.col(cfg.proguard_uuid_col).isNull(),
               F.lit(missing % "app.debug.proguard_uuid"))  # log_processor.go:117-124
        .when(is_jvm | is_js, F.col("p_error"))  # parse error / mismatched lengths
        .when((route == "apple") & F.col(cfg.build_uuid_col).isNull(),
              F.lit(missing % "app.debug.build_uuid"))  # logs_processor.go:169-171
        .when((route == "apple") & F.col(cfg.app_executable_col).isNull(),
              F.lit(missing % "app.bundle.executable"))  # logs_processor.go:174-176
        .when(route == "mk", F.col("p_error"))  # invalid MetricKit JSON
    )

    any_failed = F.exists(efs, lambda x: F.coalesce(x["f_failed"], F.lit(False)))
    first_err = F.try_element_at(
        F.filter(efs, lambda x: x["f_err"].isNotNull()), F.lit(1)
    )["f_err"]
    mk_abort = (route == "mk") & first_err.isNotNull()
    failed_out = F.when(processed, pre_err.isNotNull() | any_failed | mk_abort)
    error_out = F.when(
        processed,
        F.coalesce(pre_err, F.when(mk_abort, first_err),
                   F.when(any_failed, F.lit(ERR_PARTIAL))),
    )

    # --- text reassembly ---
    body = F.array_join(F.transform(efs, lambda x: x["chunk"]), "\n")
    header = F.when(
        parsed_route, F.format_string("%s: %s", F.col("p_name"), F.col("p_message"))  # M3
    ).when(
        structured_route
        & F.col(cfg.exception_type_col).isNotNull()
        & F.col(cfg.exception_message_col).isNotNull(),
        F.format_string("%s: %s", F.col(cfg.exception_type_col), F.col(cfg.exception_message_col)),
    )
    body_empty = body.isNull() | (body == "")
    js_jvm_text = (
        F.when(header.isNotNull() & body_empty, header)
        .when(header.isNotNull(), F.concat(header, F.lit("\n"), body))
        .otherwise(F.coalesce(body, F.lit("")))
    )
    text_out = (
        F.when(~processed | pre_err.isNotNull() | mk_abort, text)
        .when(is_js | is_jvm, js_jvm_text)
        .when(route == "apple", body)
        .when(route == "mk", F.coalesce(_mk_text(efs), F.lit("")))
    )

    # --- preserve originals (M9) ---
    preserve = F.lit(cfg.preserve_stack_trace)
    orig_ok = processed & pre_err.isNull() & (route != "mk") & preserve
    orig_text = F.when(orig_ok, text)
    mk_success = (route == "mk") & pre_err.isNull() & ~mk_abort
    # MetricKit input attribute: on success the reference removes it unless
    # PreserveStackTrace (dsymprocessor/logs_processor.go:398-400); on
    # failure it is left untouched.  When absent on input (flattened
    # eventName case) the parsed JSON (= text) is preserved on success.
    mk_attr_in = (
        F.col(cfg.metrickit_stack_trace_col)
        if cfg.metrickit_stack_trace_col in grouped.columns
        else F.lit(None).cast("string")
    )
    mk_json_out = F.when(mk_success & ~preserve, F.lit(None).cast("string")).otherwise(
        F.coalesce(mk_attr_in, F.when(mk_success & preserve, text))
    )

    # --- structured-array outputs ---
    def arr(field: str, typ: str) -> Column:
        return F.transform(efs, lambda x: x[field]).cast(typ)

    empty_l, empty_s = F.array().cast("array<bigint>"), F.array().cast("array<string>")
    js_ok = (route == "js_structured") & pre_err.isNull()
    js_mismatch = (route == "js_structured") & F.col("p_error").isNotNull()
    jvm_ok = (route == "jvm_structured") & pre_err.isNull()
    # the reference empties the arrays before the mismatch check
    # (processor.go:254-267, log_processor.go:192-204); proguard checks the
    # uuid first, so a missing uuid leaves the arrays untouched
    jvm_mismatch = (
        (route == "jvm_structured")
        & F.col("p_error").isNotNull()
        & F.col(cfg.proguard_uuid_col).isNotNull()
    )

    jvm_flat = F.flatten(F.filter(F.transform(efs, lambda x: x["m_jvm"]), lambda a: a.isNotNull()))

    out_cols = {
        "text": text_out,
        cfg.exception_type_col: (
            F.when(parsed_route & pre_err.isNull(), F.col("p_name"))
            .when(mk_success, F.lit("Unknown Error"))  # M12 fallback
            .otherwise(F.col(cfg.exception_type_col))
        ),
        cfg.exception_message_col: (
            F.when(parsed_route & pre_err.isNull(), F.col("p_message"))
            .when(mk_success, F.lit("Unknown Error"))
            .otherwise(F.col(cfg.exception_message_col))
        ),
        cfg.js_columns_col: F.when(js_ok, arr("m_col", "array<bigint>"))
        .when(js_mismatch, empty_l).otherwise(F.col(cfg.js_columns_col)),
        cfg.js_functions_col: F.when(js_ok, arr("m_func", "array<string>"))
        .when(js_mismatch, empty_s).otherwise(F.col(cfg.js_functions_col)),
        cfg.js_lines_col: F.when(js_ok, arr("m_line", "array<bigint>"))
        .when(js_mismatch, empty_l).otherwise(F.col(cfg.js_lines_col)),
        cfg.js_urls_col: F.when(js_ok, arr("m_url", "array<string>"))
        .when(js_mismatch, empty_s).otherwise(F.col(cfg.js_urls_col)),
        cfg.jvm_classes_col: F.when(jvm_ok, F.transform(jvm_flat, lambda m: m["class_name"]))
        .when(jvm_mismatch, empty_s).otherwise(F.col(cfg.jvm_classes_col)),
        cfg.jvm_methods_col: F.when(jvm_ok, F.transform(jvm_flat, lambda m: m["method_name"]))
        .when(jvm_mismatch, empty_s).otherwise(F.col(cfg.jvm_methods_col)),
        cfg.jvm_lines_col: F.when(jvm_ok, F.transform(jvm_flat, lambda m: m["line_number"]))
        .when(jvm_mismatch, empty_l).otherwise(F.col(cfg.jvm_lines_col)),
        # st_source_files is never rewritten (no mapped source-files slice in
        # the reference, log_processor.go:180-194)
        cfg.original_stack_trace_col: orig_text,
        "st_columns_original": F.when(js_ok & preserve, F.col(cfg.js_columns_col)),
        "st_functions_original": F.when(js_ok & preserve, F.col(cfg.js_functions_col)),
        "st_lines_original": F.when(js_ok & preserve, F.col(cfg.js_lines_col)),
        "st_urls_original": F.when(js_ok & preserve, F.col(cfg.js_urls_col)),
        "st_classes_original": F.when(jvm_ok & preserve, F.col(cfg.jvm_classes_col)),
        "st_methods_original": F.when(jvm_ok & preserve, F.col(cfg.jvm_methods_col)),
        "st_jvm_lines_original": F.when(jvm_ok & preserve, F.col(cfg.jvm_lines_col)),
        "st_source_files_original": F.when(jvm_ok & preserve, F.col(cfg.jvm_source_files_col)),
        cfg.metrickit_stack_trace_col: mk_json_out,
        cfg.parsing_method_col: (
            F.when(parsed_route & pre_err.isNull(), F.lit("processor_parsed"))
            .when(structured_route & ~(is_jvm & F.col(cfg.proguard_uuid_col).isNull()),
                  F.lit("structured_stacktrace_attributes"))
        ),
        cfg.processor_type_col: (
            F.when(is_js, F.lit(cfg.js_processor_type))
            .when(is_jvm, F.lit(cfg.jvm_processor_type))
            .when(route.isin("apple", "mk"), F.lit(cfg.apple_processor_type))
        ),
        cfg.processor_version_col: (
            F.when(is_js, F.lit(cfg.js_processor_version))
            .when(is_jvm, F.lit(cfg.jvm_processor_version))
            .when(route.isin("apple", "mk"), F.lit(cfg.apple_processor_version))
        ),
        cfg.failed_col: failed_out,
        cfg.error_col: error_out,
        "frames_processed": F.when(processed & pre_err.isNull(), _isum(efs, "proc_inc")).otherwise(
            F.when(processed, F.lit(0))
        ),
        "frames_failed": F.when(processed & pre_err.isNull(), _isum(efs, "fail_inc")).otherwise(
            F.when(processed, F.lit(0))
        ),
        "fetch_failures": F.when(
            processed & pre_err.isNull(),
            F.size(
                F.array_distinct(
                    F.filter(F.transform(efs, lambda x: x["fetch_key"]), lambda k: k.isNotNull())
                )
            ).cast("long"),
        ).otherwise(F.when(processed, F.lit(0))),
        "outcome": F.when(~processed, F.lit("skip")).otherwise(
            F.when(failed_out, F.lit("failed")).otherwise(F.lit("ok"))
        ),
        cfg.sink_col: F.when(~processed, F.lit("skip")).otherwise(
            F.concat(route, F.lit("/"), F.when(failed_out, F.lit("failed")).otherwise(F.lit("ok")))
        ),
    }
    return df.withColumns(out_cols).drop(
        "efs", "p_name", "p_message", "p_error"
    )
