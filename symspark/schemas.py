"""Spark schemas for the transcript table, the parsed-stack IR, and the
symbol lookup tables.

Data-model mapping (SURVEY.md §1.3): one OTel LogRecord/Span == one row;
known attributes are typed top-level columns.  The parsed stack-trace IR
(sourcemapprocessor/stack_trace_parser.go:66-79,
proguardprocessor/stack_trace_parser.go:17-36,
dsymprocessor/logs_processor.go:210,292-316) becomes a single nested
StructType with a *unified frame struct* so one explode feeds every
enrichment join.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input: multi-turn transcript table (BASELINE.json input_hint) plus the
# companion attribute columns from FIXTURES.md §1.
# ---------------------------------------------------------------------------

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        # record-level attributes
        T.StructField("language", T.StringType(), True),
        T.StructField("event_name", T.StringType(), True),
        # legacy MetricKit attribute: JSON report in its own attribute with no
        # stack-trace attribute present (dsymprocessor/logs_processor.go:113-117)
        T.StructField("metrickit_stacktrace_json", T.StringType(), True),
        T.StructField("exception_type", T.StringType(), True),
        T.StructField("exception_message", T.StringType(), True),
        # structured stack-trace arrays, JS (README.md:36-52)
        T.StructField("st_columns", T.ArrayType(T.LongType()), True),
        T.StructField("st_functions", T.ArrayType(T.StringType()), True),
        T.StructField("st_lines", T.ArrayType(T.LongType()), True),
        T.StructField("st_urls", T.ArrayType(T.StringType()), True),
        # structured stack-trace arrays, Java (README.md:299-317)
        T.StructField("st_classes", T.ArrayType(T.StringType()), True),
        T.StructField("st_methods", T.ArrayType(T.StringType()), True),
        T.StructField("st_jvm_lines", T.ArrayType(T.LongType()), True),
        T.StructField("st_source_files", T.ArrayType(T.StringType()), True),
        # resource-level attributes (constant per conv_id)
        T.StructField("source_map_uuid", T.StringType(), True),
        T.StructField("build_uuid", T.StringType(), True),
        T.StructField("app_executable", T.StringType(), True),
        T.StructField("proguard_uuid", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Unified frame IR.  kind values:
#   js        — JS frame (url/func/line/col; line/col = -1 when absent, matching
#               sourcemapprocessor/processor.go:288-297)
#   jvm       — parsed/structured Java frame (cls/method/line/src)
#   jvm_raw   — unparsed Java stack line preserved verbatim
#               (proguardprocessor/stack_trace_parser.go:111)
#   apple     — matching Apple crash line (dsymprocessor/logs_processor.go:210)
#   apple_raw — non-matching Apple line, passes through (logs_processor.go:214-217)
#   mk        — MetricKit frame (dsymprocessor/logs_processor.go:306-316)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("stack_idx", T.IntegerType(), True),  # MetricKit callStack index
        T.StructField("kind", T.StringType(), False),
        # js
        T.StructField("url", T.StringType(), True),
        T.StructField("func", T.StringType(), True),
        T.StructField("line", T.LongType(), True),
        T.StructField("col", T.LongType(), True),
        # jvm
        T.StructField("cls", T.StringType(), True),
        T.StructField("method", T.StringType(), True),
        T.StructField("src", T.StringType(), True),
        # raw passthrough line (jvm_raw / apple / apple_raw keep the original line)
        T.StructField("raw", T.StringType(), True),
        # apple
        T.StructField("prefix", T.StringType(), True),  # line[:end of group 3]
        T.StructField("lib", T.StringType(), True),
        T.StructField("tok", T.StringType(), True),  # group 4: uuid-or-binary
        T.StructField("addr", T.LongType(), True),  # offset (group 5)
        # metrickit
        T.StructField("bin", T.StringType(), True),
        T.StructField("buuid", T.StringType(), True),
    ]
)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),  # exception type
        T.StructField("message", T.StringType(), True),  # exception message
        T.StructField("mode", T.StringType(), True),  # js: stack|stacktrace|multiline
        T.StructField("error", T.StringType(), True),  # parse error, null if ok
        T.StructField("frames", T.ArrayType(FRAME_SCHEMA), True),
    ]
)

# ---------------------------------------------------------------------------
# Symbol lookup tables (FIXTURES.md §2-4).  Raw (token-level) layouts; the
# operators pre-aggregate them into sorted-array dimension tables so the
# as-of / range lookup is a 1:1 broadcast equi-join plus a higher-order
# filter (no row explosion on the dim side).
# ---------------------------------------------------------------------------

SOURCEMAP_TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("url_base", T.StringType(), False),
        T.StructField("build_uuid", T.StringType(), False),  # "" when unscoped
        T.StructField("min_line", T.LongType(), False),
        T.StructField("min_col", T.LongType(), False),
        T.StructField("src_file", T.StringType(), True),
        T.StructField("src_line", T.LongType(), True),
        T.StructField("src_col", T.LongType(), True),
        T.StructField("func_name", T.StringType(), True),
    ]
)

# store-level presence/error table: a (url_base, build_uuid) key missing from
# this table is a fetch miss (FetchError, sourcemapprocessor/symbolicator.go:26-37);
# present with error != null models no-map-location / no-map failures
# (store.go:58-76).
SOURCEMAP_STORE_SCHEMA = T.StructType(
    [
        T.StructField("url_base", T.StringType(), False),
        T.StructField("build_uuid", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

PROGUARD_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("proguard_uuid", T.StringType(), False),
        T.StructField("obf_class", T.StringType(), False),
        T.StructField("obf_method", T.StringType(), False),
        T.StructField("line_start", T.LongType(), False),
        T.StructField("line_end", T.LongType(), False),
        T.StructField(
            "mapped",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("class_name", T.StringType(), False),
                        T.StructField("method_name", T.StringType(), False),
                        T.StructField("source_file", T.StringType(), False),
                        T.StructField("line_number", T.LongType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# distinct uuids present in the proguard store; a uuid absent here is a
# FetchError for every frame of the record (proguardprocessor/symbolicator.go:110-116)
PROGUARD_STORE_SCHEMA = T.StructType(
    [T.StructField("proguard_uuid", T.StringType(), False)]
)

DSYM_SYMBOLS_SCHEMA = T.StructType(
    [
        T.StructField("build_uuid", T.StringType(), False),  # stored lowercase
        T.StructField("binary_name", T.StringType(), False),
        T.StructField("sym_start_addr", T.LongType(), False),
        T.StructField("sym_end_addr", T.LongType(), False),
        # inline chain: one address range can resolve to multiple locations
        # (dsymprocessor/symbolicator.go:109-129)
        T.StructField(
            "locs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("symbol", T.StringType(), False),
                        T.StructField("path", T.StringType(), False),
                        T.StructField("line", T.LongType(), False),
                        T.StructField("sym_addr", T.LongType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

DSYM_STORE_SCHEMA = T.StructType(
    [
        T.StructField("build_uuid", T.StringType(), False),  # lowercase
        T.StructField("binary_name", T.StringType(), False),
    ]
)
