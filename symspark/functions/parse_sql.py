"""JVM-side parse fast path (no Python workers for the dominant formats).

Same semantics as the Arrow parse UDF (:mod:`symspark.functions.parse_arrow`,
itself pinned byte-exact to the scalar TraceKit/Java/Apple oracles), but
expressed entirely as Spark SQL expressions: ``split`` + ``transform`` +
``regexp_extract`` cascades that run inside the JVM executor threads.

Why this exists: an Arrow UDF still runs a Python worker per task.  At
local[32] that is 32 JVM task threads + 32 Python workers sharing 32
hardware threads — the oversubscription behind the round-2 scaling-
efficiency gap (SCALING.json 0.549 vs the >=0.8 target).  With the js /
jvm / apple routes parsed JVM-side, Python only sees MetricKit JSON and
Opera-marker rows (~2% of parsed rows), so task threads scale with cores.

Route coverage (mirrors the Arrow UDF's fast/slow split):
- js:    RN / Chrome+eval+native / WinJS / Gecko cascade
         (sourcemapprocessor/stack_trace_parser.go:20-46 regex family);
         rows carrying an Opera ``line N`` marker still go to Python
         (the scalar TraceKit cascade is the oracle for those)
- jvm:   header + frame/raw preserve with the -2/-1 Android sentinels
         (proguardprocessor/stack_trace_parser.go:100-152)
- apple: per-line crash regex, non-matching lines preserved
         (dsymprocessor/logs_processor.go:210-217)
- mk:    always Python (recursive JSON flatten)

Expression-duplication discipline: the per-line cascades are interpreted
(HOFs are CodegenFallback), so every python-side re-reference would
re-scan the line array.  All expensive arrays are therefore built exactly
once inside a single ``_pp`` struct column (a multi-referenced non-cheap
alias survives CollapseProject), and the PARSED_SCHEMA struct is assembled
from cheap attribute lookups in a second projection.

The regexes are the RE2 patterns of parse_arrow.py transliterated to
java.util.regex (named groups dropped for positional indices; semantics
are identical for these patterns — both engines are leftmost-first here,
and tests/test_parse_sql.py pins SQL==UDF on the full corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from symspark.functions.js_parser import UNKNOWN_FUNCTION
from symspark.functions.parse import PARSE_WRAP
from symspark.schemas import FRAME_SCHEMA

# --- regexes (java.util.regex; group numbering noted inline) ---------------

RE_OPERA_MARKER = r"(?im)(?:^|\s)line\s+\d"
# 1 func, 2 url, 3 line, 4 col
RE_RN = r"(?i)^\s*at (.*?) ?\(address at (.+?)(?::(\d+))?(?::(\d+))?\)\s*$"
RE_CHROME = (
    r"(?i)^\s*at (.*?) ?\(((?:file|https?|blob|chrome-extension"
    r"|native|eval|webpack|<anonymous>|/).*?)(?::(\d+))?(?::(\d+))?\)?\s*$"
)
# 1 url, 2 line, 3 col (no (?i), mirrors parse_arrow._RE_CHROME_EVAL)
RE_CHROME_EVAL = r"\((\S*)(?::(\d+))(?::(\d+))\)"
# 1 func, 2 url, 3 line, 4 col
RE_WINJS = (
    r"(?i)^\s*at (?:((?:\[object object\])?.+) )?\(?"
    r"((?:file|ms-appx|https?|webpack|blob):.*?):(\d+)(?::(\d+))?\)?\s*$"
)
# 1 func, 2 args, 3 url, 4 line, 5 col
RE_GECKO = (
    r"(?i)^\s*(.*?)(?:\((.*?)\))?(?:^|@)"
    r"((?:file|https?|blob|chrome|webpack|resource|\[native).*?|[^@]*bundle)"
    r"(?::(\d+))?(?::(\d+))?\s*$"
)
# 1 prefix, 2 idx, 3 lib, 4 hex, 5 tok, 6 off
RE_APPLE = (
    r"^(([0-9]+)\s+([\w _\-\.]+[\w_\-\.])\s+(0x[\da-f]+))"
    r"\s+([\w _\-\.]*) \+ ([0-9]+)"
)
RE_JAVA_HEADER = r"^([^\s:]+)\s*:\s*(.*)$"
RE_JAVA_FRAME = r"^\s*at\s+([^\s(]+)\.([^\s.(]+)\(([^:)]+)(?::(-?\d+))?\)\s*$"

# Backtracking-engine guard: java.util.regex backtracks, and the stacked
# lazy/optional groups in RE_GECKO / RE_CHROME can go superlinear on long
# adversarial non-matching lines (an executor CPU hazard RE2 — the Arrow
# engine and the Go reference — cannot hit).  No legitimate stack-frame
# line approaches this length, so lines longer than LINE_CAP chars are
# treated as non-matching (js: skipped; jvm/apple: raw-preserved) in BOTH
# engines, keeping sql==udf parity on any input (tests/test_parse_sql.py).
# The same gate rejects lines containing the _SEP sentinel control chars:
# a captured group carrying them would mis-split the single-execution group
# extraction, so "control chars never appear in stack-trace lines" is
# ENFORCED rather than assumed — again identically in both engines.
LINE_CAP = 8192


def _line_ok(l: Column) -> Column:
    return (F.length(l) <= LINE_CAP) & ~l.contains("\x01") & ~l.contains("\x02")

ERR_PARSE = PARSE_WRAP + "failed to parse stack trace"
ERR_EMPTY = PARSE_WRAP + "stack trace is empty"
ERR_INVALID = PARSE_WRAP + "invalid stack trace format"
ERR_NO_FRAMES = PARSE_WRAP + "no valid stack frames found in stack trace"

_FRAME_FIELDS = [(f.name, f.dataType.simpleString()) for f in FRAME_SCHEMA.fields]
_FRAMES_T = f"array<{FRAME_SCHEMA.simpleString()}>"


def _frame(**given: Column) -> Column:
    """Full FRAME_SCHEMA struct with unspecified fields null."""
    return F.struct(
        *[given.get(n, F.lit(None)).cast(t).alias(n) for n, t in _FRAME_FIELDS]
    )


def _nz(c: Column) -> Column:
    """'' -> null (regexp_extract returns '' for absent optional groups)."""
    return F.nullif(c, F.lit(""))


def _int_or(c: Column, default: int) -> Column:
    return F.coalesce(_nz(c).try_cast("long"), F.lit(default))


def _trim_ws(c: Column) -> Column:
    # full whitespace trim (F.trim strips spaces only)
    return F.regexp_replace(c, r"^\s+|\s+$", "")


# Group-separator for single-execution extraction: one regexp_replace of an
# anchored, pre-rlike-gated pattern rewrites the line to its capture groups
# joined by this sentinel; splitting yields every group with ONE regex run
# (each regexp_extract call would re-run the matcher per group).  Control
# chars never appear in stack-trace lines.
_SEP = "\x01\x02"


def _groups(l: Column, pattern: str, n: int) -> Column:
    """All n capture groups of an ANCHORED pattern in one regex execution.
    The pattern must consume the whole line (``^…$``) so the replacement
    output is exactly the joined groups — callers gate on ``rlike`` first.
    For non-anchored patterns use :func:`_groups_find` instead."""
    repl = _SEP.join(f"${i}" for i in range(1, n + 1))
    return F.split(F.regexp_replace(l, pattern, repl), _SEP)


def _groups_find(l: Column, pattern: str, n: int) -> Column:
    """find-first semantics for a non-anchored pattern: a lazy ``^.*?``
    prefix and greedy ``.*$`` suffix consume the unmatched stretches, so
    the replacement output is the first match's groups alone."""
    repl = _SEP.join(f"${i}" for i in range(1, n + 1))
    return F.split(
        F.regexp_replace(l, r"^(?s:.*?)" + pattern + r"(?s:.*)$", repl), _SEP
    )


# --- js ---------------------------------------------------------------------

def _js_line_candidate(l: Column) -> Column:
    """Per-line strategy cascade RN > Chrome > WinJS > Gecko; null if the
    line matches none (the line is skipped, exactly the UDF behavior).
    Returns struct(s: strategy ordinal, g: capture groups) — exactly one
    regexp_replace group extraction per matched line; field selection by
    strategy happens on the MATERIALIZED struct in the second transform."""

    def tag(strategy: int, groups: Column) -> Column:
        return F.struct(F.lit(strategy).alias("s"), groups.alias("g"))

    cascade = (
        F.when(
            l.contains("address at") & l.rlike(RE_RN),
            tag(0, _groups(l, RE_RN, 4)),
        )
        .when(l.rlike(RE_CHROME), tag(1, _groups(l, RE_CHROME, 4)))
        .when(l.rlike(RE_WINJS), tag(2, _groups(l, RE_WINJS, 4)))
        .when(l.rlike(RE_GECKO), tag(3, _groups(l, RE_GECKO, 5)))
    )
    # over-cap / sentinel-carrying lines never reach the backtracking
    # regexes nor the _SEP group extraction (LINE_CAP note)
    return F.when(_line_ok(l), cascade)


def _js_frames(text: Column) -> Column:
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    cands = F.filter(
        F.transform(lines, _js_line_candidate), lambda x: x.isNotNull()
    )

    def build(x: Column, i: Column) -> Column:
        s, g = x["s"], x["g"]
        gecko = s == F.lit(3)
        # gecko groups: (func, args, url, line, col) -> skip args
        func = g[0]
        url0 = F.when(gecko, g[2]).otherwise(g[1])
        line0 = F.when(gecko, g[3]).otherwise(g[2])
        col0 = F.when(gecko, F.element_at(x["g"], 5)).otherwise(g[3])
        # Chrome eval / native rewrites (rare: extra regex only on eval rows)
        is_ch = s == F.lit(1)
        ev = is_ch & url0.startswith("eval") & url0.rlike(RE_CHROME_EVAL)
        evg = _groups_find(url0, RE_CHROME_EVAL, 3)
        url = (
            F.when(ev, evg[0])
            .when(is_ch & url0.startswith("native"), F.lit("(native)"))
            .otherwise(url0)
        )
        line = F.when(ev, evg[1]).otherwise(line0)
        col = F.when(ev, evg[2]).otherwise(col0)
        return _frame(
            pos=i,
            kind=F.lit("js"),
            url=url,
            func=F.coalesce(_nz(func), F.lit(UNKNOWN_FUNCTION)),
            line=_int_or(line, -1),
            col=_int_or(col, -1),
        )

    return F.transform(cands, build)


# --- jvm --------------------------------------------------------------------

def _jvm_frames(lines: Column) -> Column:
    kept = F.filter(
        F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))),
        lambda l: _trim_ws(l) != "",
    )
    # step 1: one regex run per line (match flag + all groups), materialized
    parsed = F.transform(
        kept,
        lambda l: F.struct(
            l.alias("raw"),
            (_line_ok(l) & l.rlike(RE_JAVA_FRAME)).alias("m"),
            F.when(_line_ok(l) & l.rlike(RE_JAVA_FRAME),
                   _groups(l, RE_JAVA_FRAME, 4)).alias("g"),
        ),
    )

    def build(x: Column, i: Column) -> Column:
        g = x["g"]
        line = F.when(g[2] == "Native Method", F.lit(-2)).otherwise(_int_or(g[3], -1))
        return F.when(
            x["m"],
            _frame(
                pos=i, kind=F.lit("jvm"),
                cls=g[0], method=g[1], src=g[2], line=line,
            ),
        ).otherwise(_frame(pos=i, kind=F.lit("jvm_raw"), raw=x["raw"]))

    return F.transform(parsed, build)


# --- apple ------------------------------------------------------------------

def _apple_frames(text: Column) -> Column:
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    parsed = F.transform(
        lines,
        lambda l: F.struct(
            l.alias("raw"),
            (_line_ok(l) & l.rlike(RE_APPLE)).alias("m"),
            F.when(_line_ok(l) & l.rlike(RE_APPLE),
                   _groups_find(l, RE_APPLE, 6)).alias("g"),
        ),
    )

    def build(x: Column, i: Column) -> Column:
        g = x["g"]
        return F.when(
            x["m"],
            _frame(
                pos=i, kind=F.lit("apple"), raw=x["raw"],
                prefix=g[0], lib=g[2], tok=g[4],
                addr=_nz(g[5]).try_cast("long"),
            ),
        ).otherwise(_frame(pos=i, kind=F.lit("apple_raw"), raw=x["raw"]))

    return F.transform(parsed, build)


# --- the two-stage assembly -------------------------------------------------

def pre_parsed_expr(text: Column, route: Column, sql_eligible: Column) -> Column:
    """Stage A: the expensive per-line arrays (plus the jvm header fields),
    computed exactly once per row inside one struct.  ``sql_eligible``
    excludes rows the Python UDF must handle (mk, Opera-marker js)."""
    jvm_txt = F.coalesce(text, F.lit(""))
    jvm_lines = F.split(jvm_txt, "\n")
    first_trim = _trim_ws(F.get(jvm_lines, 0))
    pack = F.struct(
        F.when(route == "js", _js_frames(text))
        .when(route == "jvm", _jvm_frames(jvm_lines))
        .when(route == "apple", _apple_frames(text))
        .alias("frames"),
        F.when(route == "jvm", jvm_txt == "").alias("is_empty"),
        F.when(route == "jvm", first_trim.rlike(RE_JAVA_HEADER)).alias("hdr_ok"),
        F.when(route == "jvm", F.regexp_extract(first_trim, RE_JAVA_HEADER, 1)).alias("hdr_typ"),
        F.when(route == "jvm", F.regexp_extract(first_trim, RE_JAVA_HEADER, 2)).alias("hdr_msg"),
    )
    return F.when(sql_eligible & route.isin("js", "jvm", "apple"), pack)


def parsed_expr(pp: Column, route: Column, name: Column, message: Column) -> Column:
    """Stage B: PARSED_SCHEMA struct from cheap attribute reads of the
    stage-A ``pp`` struct column."""
    frames = pp["frames"]
    n = F.size(frames)

    js_ok = n > 0
    jvm_empty = pp["is_empty"]
    jvm_no_hdr = ~jvm_empty & ~pp["hdr_ok"]
    jvm_no_frames = ~jvm_empty & ~jvm_no_hdr & (n == 0)
    jvm_ok = ~(jvm_empty | jvm_no_hdr | jvm_no_frames)

    out_name = (
        F.when(route == "js", F.when(js_ok, F.coalesce(name, F.lit(""))))
        .when(route == "jvm", F.when(jvm_ok, pp["hdr_typ"]))
    )
    out_message = (
        F.when(route == "js", F.when(js_ok, F.coalesce(message, F.lit(""))))
        .when(route == "jvm", F.when(jvm_ok, pp["hdr_msg"]))
    )
    out_mode = F.when((route == "js") & js_ok, F.lit("stack"))
    out_error = (
        F.when(route == "js", F.when(~js_ok, F.lit(ERR_PARSE)))
        .when(
            route == "jvm",
            F.when(jvm_empty, F.lit(ERR_EMPTY))
            .when(jvm_no_hdr, F.lit(ERR_INVALID))
            .when(jvm_no_frames, F.lit(ERR_NO_FRAMES)),
        )
    )
    out_frames = (
        F.when(route == "js", F.when(js_ok, frames))
        .when(route == "jvm", F.when(jvm_ok, frames))
        .when(route == "apple", frames)
    ).cast(_FRAMES_T)
    return F.struct(
        out_name.cast("string").alias("name"),
        out_message.cast("string").alias("message"),
        out_mode.cast("string").alias("mode"),
        out_error.cast("string").alias("error"),
        out_frames.alias("frames"),
    )
