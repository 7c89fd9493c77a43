"""The JVM-expression parse engine (functions/parse_sql.py) must produce
byte-identical parsed structs to the Arrow UDF engine (itself pinned to the
scalar TraceKit/Java/Apple oracles) on every input."""

import os

import pytest
from pyspark.sql import functions as F

from symspark.config import PipelineConfig
from symspark.operators import frames as frames_op, route as route_op

APP = "https://cdn.example.com/assets/app.js"

JS_CASES = [
    "",
    None,
    "\n\n\n",
    "completely unparseable garbage",
    f"TypeError: boom\n    at foo ({APP}:1:2)\n    at http://x/b.js:3:4",
    "  at fn (webpack:///src/index.ts:78:20)\n junk line\n  at page (webpack:///p.ts:8:1)",
    "trace@http://x/a.js:10:5\n@http://x/b.js:2:1",
    "    at Object.<anonymous> (native)",
    "    at eval (eval at foo (http://x/a.js:1:2), <anonymous>:3:4)",
    "x@http://y/f.js line 2 > eval:1:1",  # gecko eval marker -> slow path both engines
    "    at fnname (ms-appx://pkg/js/app.js:10:5)",
    "    at [object Object].method (file:///C:/app/x.js:5)",
    "  at whatever (address at index.android.bundle:1:2)",
    "obj.method@resource://gre/modules/X.jsm:92",
    "    at  (http://x/a.js:1:2)",  # empty func -> ?
    "    at f (http://x/a.js)",  # no line/col -> -1
    "Error thrown at line 42, column 3 in fn(a) in http://opera.example/x.js:\n"
    "    called from line 1, column 0 in <anonymous function: outer>(b) in http://opera.example/y.js:",
    "  Line 12 of inline#2 script in http://o.example/i.html: in function foo\n    x();",
    # adversarial: over-LINE_CAP lines and _SEP sentinel control chars must
    # be treated as non-matching by BOTH engines (parse_sql.py LINE_CAP note)
    "x" * 9000 + "@http://x/a.js:1:2",
    "    at f" + "o" * 9000 + " (http://x/a.js:1:2)\n    at ok (http://x/b.js:3:4)",
    "    at fo\x01o (http://x/a.js:1:2)\n    at ok (http://x/b.js:3:4)",
    "f\x02n@http://x/a.js:10:5",
]

JVM_CASES = [
    "",
    None,
    "no-colon-header line\n\tat a.b.c(F.java:1)",
    "java.lang.E: msg only, no frames",
    "java.lang.E: x\n\n   \n",  # blank tail -> no frames error
    "java.lang.E: x\n\tat a.a.a(SourceFile:42)\n\tat a.b.b(SourceFile:150)",
    "java.lang.E: x\n\tat b.c.a(Native Method)\n\tat zz.yy.xx(F.java:77)",
    "java.lang.E: x\n\tat a.a.a(F.java)\nrandom raw line\n\tat a.b(G.java:-1)",
    "java.lang.E:\n\tat a.a.a(SourceFile:42)",  # empty message
    "java.lang.E: x\nCaused by: inner\n\tat b.c.a(SourceFile:9)",
    "java.lang.E: x\n\tat a.a.a(File.java:5000000000)",
    # adversarial over-cap / sentinel frame lines -> raw-preserved by both
    "java.lang.E: x\n\tat a." + "b" * 9000 + ".c(F.java:1)\n\tat a.a.a(F.java:2)",
    "java.lang.E: x\n\tat a.b\x01.c(F.java:1)\n\tat q\x02.w.e(G.java:2)",
]

APPLE_CASES = [
    "",
    None,
    "0   MyApp   0x0000000000001000 4c4c4408-aaaa-3333-bbbb-111122223333 + 55",
    "0   MyApp   0x0000000000001000 MyApp + 55\nnot a crash line\n"
    "1   libfoo.dylib   0x0000000000002040 libfoo.dylib + 64",
    "Thread 0 Crashed:\n0   CoreFoundation   0x00000001 CF + 1",
    # adversarial over-cap / sentinel crash lines -> raw-preserved by both
    "0   MyApp   0x0000000000001000 MyApp + 55 " + "z" * 9000,
    "0   My\x01App   0x0000000000001000 MyApp + 55\n"
    "1   My\x02App   0x0000000000001040 MyApp + 119",
]

MK_CASES = [
    '{"callStacks": [}',
    '{"callStacks":[{"callStackFrames":[{"binaryName":"MyApp",'
    '"binaryUUID":"4c4c4408-aaaa-3333-bbbb-111122223333","offsetAddress":1500}]}]}',
]


def _rows():
    out = []
    for i, t in enumerate(JS_CASES):
        out.append((f"js{i}", t, "js", "SomeError", f"msg {i}"))
        out.append((f"jsn{i}", t, "js", None, None))
    for i, t in enumerate(JVM_CASES):
        out.append((f"jvm{i}", t, "jvm", None, None))
    for i, t in enumerate(APPLE_CASES):
        out.append((f"ap{i}", t, "apple", None, None))
    for i, t in enumerate(MK_CASES):
        out.append((f"mk{i}", t, "mk", None, None))
    return out


def _parse_with(spark, df, engine):
    cfg = PipelineConfig(parse_engine=engine)
    out = frames_op.attach_parsed(df, cfg)
    return {
        r["id"]: r["parsed"].asDict(recursive=True) if r["parsed"] is not None else None
        for r in out.select("id", "parsed").collect()
    }


def test_sql_engine_matches_udf_on_corpus(spark):
    df = spark.createDataFrame(
        _rows(), "id string, text string, route string, "
        "exception_type string, exception_message string"
    )
    # attach_parsed's structured branches reference the st_* array columns
    for c, t in (
        ("st_columns", "array<bigint>"), ("st_functions", "array<string>"),
        ("st_lines", "array<bigint>"), ("st_urls", "array<string>"),
        ("st_classes", "array<string>"), ("st_methods", "array<string>"),
        ("st_jvm_lines", "array<bigint>"), ("st_source_files", "array<string>"),
    ):
        df = df.withColumn(c, F.lit(None).cast(t))
    sql = _parse_with(spark, df, "sql")
    udf = _parse_with(spark, df, "udf")
    assert set(sql) == set(udf)
    for k in sorted(sql):
        assert sql[k] == udf[k], f"{k}: sql={sql[k]}\nudf={udf[k]}"


def test_sql_engine_matches_udf_on_fixtures(spark, fixture_dir):
    """Full datagen corpus (every route, structured, malformed, legacy-mk
    rows) — the two engines must agree on every record."""
    t = spark.read.parquet(os.path.join(fixture_dir, "transcripts.parquet"))
    routed = route_op.gate_and_route(t, PipelineConfig())

    def run(engine):
        out = frames_op.attach_parsed(routed, PipelineConfig(parse_engine=engine))
        return {
            (r["conv_id"], r["turn_idx"]): (
                r["parsed"].asDict(recursive=True) if r["parsed"] is not None else None
            )
            for r in out.select("conv_id", "turn_idx", "parsed").collect()
        }

    sql, udf = run("sql"), run("udf")
    assert set(sql) == set(udf)
    mismatches = [k for k in sql if sql[k] != udf[k]]
    assert not mismatches, (
        f"{len(mismatches)} mismatching records; first: {mismatches[0]}: "
        f"sql={sql[mismatches[0]]}\nudf={udf[mismatches[0]]}"
    )
