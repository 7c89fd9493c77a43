"""Regroup + record assembly (SURVEY.md §2.5 M3-M12, §2.6).

Frame outcomes regroup per (conv_id, turn_idx) into a pos-sorted struct
array; all record-level semantics — headers, text reassembly, failure
flags, counter totals, preserve-originals, stamps — are JVM expressions
over that array, so nothing here leaves whole-stage codegen.

The two dSYM negative-cache quirks are window functions over the already
conv/turn-clustered frames (no extra shuffle, just an in-partition sort):
- apple: a missing dSYM passes through the FIRST frame per (record, uuid)
  without failure, but every LATER frame of that uuid gets the cached
  FetchError and marks the record failed
  (dsymprocessor/logs_processor.go:240-243 vs :256-258).
- MetricKit: the cached FetchError (or a symbol-lookup failure) ABORTS the
  record at that frame: output is never written and later frames are not
  counted (logs_processor.go:362-393,435-447).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from symspark.config import PipelineConfig

ERR_PARTIAL = "symbolication failed for some stack frames"  # errPartialSymbolication

_OUT = "out"  # coalesced outcome struct column


def coalesce_outcomes(frames: DataFrame) -> DataFrame:
    """Merge per-operator outcome structs into one and apply the
    negative-cache quirk windows."""
    df = frames.withColumn(
        _OUT, F.coalesce(F.col("js_out"), F.col("jvm_out"), F.col("apple_out"), F.col("mk_out"))
    ).drop("js_out", "jvm_out", "apple_out", "mk_out")

    o = F.col(_OUT)
    # rank of store-miss frames within (record, uuid), in frame order
    w_uuid = W.partitionBy("conv_id", "turn_idx", F.coalesce(o["miss_uuid"], F.lit(""))).orderBy("pos")
    rn = F.row_number().over(w_uuid)
    later_miss = o["miss_uuid"].isNotNull() & (rn > 1)

    is_apple = F.col("kind") == "apple"
    is_mk = F.col("kind") == "mk"

    def patch(**fields: Column) -> Column:
        cols = []
        for f in ["chunk", "f_failed", "proc_inc", "fail_inc", "fetch_key", "f_err",
                  "miss_uuid", "miss_err", "m_col", "m_func", "m_line", "m_url", "m_jvm"]:
            cols.append((fields[f] if f in fields else o[f]).alias(f))
        return F.struct(*cols)

    df = df.withColumn(
        _OUT,
        F.when(
            later_miss & is_apple,  # cached FetchError -> line kept, record failed
            patch(f_failed=F.lit(True), proc_inc=F.lit(0), fail_inc=F.lit(0), fetch_key=F.lit(None).cast("string")),
        )
        .when(
            later_miss & is_mk,  # cached FetchError -> record abort at this frame
            patch(
                f_err=o["miss_err"], chunk=F.lit(None).cast("string"),
                f_failed=F.lit(True), proc_inc=F.lit(0), fail_inc=F.lit(0),
                fetch_key=F.lit(None).cast("string"),
            ),
        )
        .otherwise(o),
    )

    # MetricKit abort position: first erroring frame in the record
    o = F.col(_OUT)
    w_rec = W.partitionBy("conv_id", "turn_idx")
    abort_pos = F.min(F.when(is_mk & o["f_err"].isNotNull(), F.col("pos"))).over(w_rec)
    past_abort = is_mk & abort_pos.isNotNull() & (F.col("pos") > abort_pos)
    df = df.withColumn(
        _OUT,
        F.when(
            past_abort,  # loop never reached these frames
            patch(
                proc_inc=F.lit(0), fail_inc=F.lit(0),
                fetch_key=F.lit(None).cast("string"), f_err=F.lit(None).cast("string"),
            ),
        ).otherwise(o),
    )
    return df


def regroup(frames: DataFrame) -> DataFrame:
    """Collect enriched frames back into per-record sorted arrays plus
    counter totals (A1-A3, SURVEY.md §2.6)."""
    o = F.col(_OUT)
    ef = F.struct(
        F.col("pos").alias("pos"),
        F.col("stack_idx").alias("stack_idx"),
        F.col("kind").alias("kind"),
        o["chunk"].alias("chunk"),
        o["f_failed"].alias("f_failed"),
        o["f_err"].alias("f_err"),
        o["m_col"].alias("m_col"),
        o["m_func"].alias("m_func"),
        o["m_line"].alias("m_line"),
        o["m_url"].alias("m_url"),
        o["m_jvm"].alias("m_jvm"),
    )
    return frames.groupBy("conv_id", "turn_idx").agg(
        F.sort_array(F.collect_list(ef)).alias("efs"),
        F.sum(o["proc_inc"]).alias("agg_processed"),
        F.sum(o["fail_inc"]).alias("agg_failed"),
        F.count_distinct(o["fetch_key"]).alias("agg_fetch_failures"),
        F.max(F.coalesce(o["f_failed"], F.lit(False))).alias("agg_any_failed"),
        F.first(o["f_err"], ignorenulls=True).alias("agg_first_err"),
    )


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
                x["chunk"],
            ).alias("t"),
            x["stack_idx"].alias("si"),
        ),
        lambda acc: acc["t"],
    )


def assemble_records(parsed_df: DataFrame, grouped: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Join frame aggregates back and build the final record columns."""
    df = parsed_df.join(grouped, ["conv_id", "turn_idx"], "left")

    route = F.col(cfg.route_col)
    is_js = route.isin("js", "js_structured")
    is_jvm = route.isin("jvm", "jvm_structured")
    parsed_route = route.isin("js", "jvm")
    structured_route = route.isin("js_structured", "jvm_structured")
    processed = route != "skip"
    text = F.col("text")
    efs = F.col("efs")
    p = F.col("parsed")

    # --- record-level pre-frame errors ---
    missing = "missing attribute: %s"
    pre_err = (
        F.when(is_jvm & F.col(cfg.proguard_uuid_col).isNull(),
               F.lit(missing % "app.debug.proguard_uuid"))  # log_processor.go:117-124
        .when(is_jvm | is_js, p["error"])  # parse error / mismatched lengths
        .when((route == "apple") & F.col(cfg.build_uuid_col).isNull(),
              F.lit(missing % "app.debug.build_uuid"))  # logs_processor.go:169-171
        .when((route == "apple") & F.col(cfg.app_executable_col).isNull(),
              F.lit(missing % "app.bundle.executable"))  # logs_processor.go:174-176
        .when(route == "mk", p["error"])  # invalid MetricKit JSON
    )

    any_failed = F.coalesce(F.col("agg_any_failed"), F.lit(False))
    mk_abort = (route == "mk") & F.col("agg_first_err").isNotNull()
    failed_out = F.when(processed, pre_err.isNotNull() | any_failed | mk_abort)
    error_out = F.when(
        processed,
        F.coalesce(pre_err, F.when(mk_abort, F.col("agg_first_err")),
                   F.when(any_failed, F.lit(ERR_PARTIAL))),
    )

    # --- text reassembly ---
    body = F.array_join(F.transform(efs, lambda x: x["chunk"]), "\n")
    header = F.when(
        parsed_route, F.format_string("%s: %s", p["name"], p["message"])  # M3, processor.go:234-236
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
        .when(route == "mk", _mk_text(efs))
    )

    # --- preserve originals (M9) ---
    preserve = F.lit(cfg.preserve_stack_trace)
    orig_ok = processed & pre_err.isNull() & (route != "mk") & preserve
    orig_text = F.when(orig_ok, text)
    mk_success = (route == "mk") & pre_err.isNull() & ~mk_abort
    mk_json_out = F.when(mk_success & preserve, text)

    # --- structured-array outputs ---
    def arr(field: str, typ: str) -> Column:
        return F.transform(efs, lambda x: x[field]).cast(typ)

    empty_l, empty_s = F.array().cast("array<bigint>"), F.array().cast("array<string>")
    js_ok = (route == "js_structured") & pre_err.isNull()
    js_mismatch = (route == "js_structured") & p["error"].isNotNull()
    jvm_ok = (route == "jvm_structured") & pre_err.isNull()
    # the reference empties the arrays before the mismatch check
    # (processor.go:254-267, log_processor.go:192-204)
    jvm_mismatch = (route == "jvm_structured") & p["error"].isNotNull() & F.col(cfg.proguard_uuid_col).isNotNull()

    jvm_flat = F.flatten(F.filter(F.transform(efs, lambda x: x["m_jvm"]), lambda a: a.isNotNull()))

    out_cols = {
        "text": text_out,
        cfg.exception_type_col: (
            F.when(parsed_route & pre_err.isNull(), p["name"])
            .when(mk_success, F.lit("Unknown Error"))  # M12 fallback
            .otherwise(F.col(cfg.exception_type_col))
        ),
        cfg.exception_message_col: (
            F.when(parsed_route & pre_err.isNull(), p["message"])
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
        "frames_processed": F.when(processed & pre_err.isNull(), F.coalesce(F.col("agg_processed"), F.lit(0))).otherwise(
            F.when(processed, F.lit(0))
        ),
        "frames_failed": F.when(processed & pre_err.isNull(), F.coalesce(F.col("agg_failed"), F.lit(0))).otherwise(
            F.when(processed, F.lit(0))
        ),
        "fetch_failures": F.when(processed & pre_err.isNull(), F.coalesce(F.col("agg_fetch_failures"), F.lit(0))).otherwise(
            F.when(processed, F.lit(0))
        ),
        cfg.sink_col: F.when(~processed, F.lit("skip")).otherwise(
            F.concat(route, F.lit("/"), F.when(failed_out, F.lit("failed")).otherwise(F.lit("ok")))
        ),
    }
    return df.withColumns(out_cols).drop(
        "parsed", "efs", "agg_processed", "agg_failed", "agg_fetch_failures",
        "agg_any_failed", "agg_first_err",
    )
