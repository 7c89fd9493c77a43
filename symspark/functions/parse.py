"""The unified vectorized parse stage.

One Arrow-batched pandas UDF runs the route-appropriate parser per row and
emits the unified frame IR (schemas.PARSED_SCHEMA), so the pipeline scans
the input once and explodes frames once.  Mirrors the reference's parse
dispatch: sourcemapprocessor/processor.go:183-206 (JS),
proguardprocessor/log_processor.go:139-161 (Java),
dsymprocessor/logs_processor.go:179-195 (Apple lines),
dsymprocessor/logs_processor.go:350-393 (MetricKit JSON).

Structured-array routes (``js_structured`` / ``jvm_structured``) never hit
Python: their frames are built with JVM expressions in
operators/frames.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from symspark.functions.apple_parser import parse_apple_line
from symspark.functions.java_parser import parse_java_stack_trace
from symspark.functions.js_parser import compute_stack_trace
from symspark.functions.metrickit import flatten_metrickit
from symspark.schemas import PARSED_SCHEMA

# The stacktrace attribute key named in parse-error messages
# (sourcemapprocessor/processor.go:186-196).
STACK_TRACE_ATTR = "exception.stacktrace"
PARSE_WRAP = f"failed to parse raw stack trace from {STACK_TRACE_ATTR}: "


def _parse_js(text: str, name: str, message: str) -> dict:
    res, err = compute_stack_trace(name or "", message or "", text or "")
    if err:
        return {"error": PARSE_WRAP + err}
    frames = [
        {
            "pos": i,
            "kind": "js",
            "url": f["url"],
            "func": f["func"],
            "line": f["line"] if f["line"] is not None else -1,
            "col": f["col"] if f["col"] is not None else -1,
        }
        for i, f in enumerate(res["frames"])
    ]
    return {
        "name": res["name"],
        "message": res["message"],
        "mode": res["mode"],
        "frames": frames,
    }


def _parse_jvm(text: str) -> dict:
    res, err = parse_java_stack_trace(text or "")
    if err:
        return {"error": PARSE_WRAP + err}
    frames = []
    for i, el in enumerate(res["elements"]):
        if "frame" in el:
            f = el["frame"]
            frames.append(
                {
                    "pos": i,
                    "kind": "jvm",
                    "cls": f["cls"],
                    "method": f["method"],
                    "line": f["line"],
                    "src": f["src"],
                }
            )
        else:
            frames.append({"pos": i, "kind": "jvm_raw", "raw": el["raw"]})
    return {
        "name": res["exception_type"],
        "message": res["exception_message"],
        "frames": frames,
    }


def _parse_apple(text: str) -> dict:
    frames = []
    for i, line in enumerate((text or "").split("\n")):
        f = parse_apple_line(line)
        if f is None:
            frames.append({"pos": i, "kind": "apple_raw", "raw": line})
        else:
            frames.append(
                {
                    "pos": i,
                    "kind": "apple",
                    "raw": line,
                    "prefix": f["prefix"],
                    "lib": f["lib"],
                    "tok": f["tok"],
                    "addr": f["addr"],
                }
            )
    return {"frames": frames}


def _parse_mk(text: str) -> dict:
    stacks, err = flatten_metrickit(text or "")
    if err:
        return {"error": err}
    out = []
    for si, stack in enumerate(stacks):
        if not stack:
            # an empty callStack still contributes an empty entry to the
            # "\n\n\n" join (logs_processor.go:357-398)
            out.append({"pos": len(out), "kind": "mk_empty", "stack_idx": si})
            continue
        for f in stack:
            out.append(
                {
                    "pos": len(out),
                    "kind": "mk",
                    "stack_idx": f["stack_idx"],
                    "bin": f["bin"],
                    "buuid": f["buuid"],
                    "addr": f["offset"],
                }
            )
    return {"frames": out}


_DISPATCH = {"js": lambda t, n, m: _parse_js(t, n, m),
             "jvm": lambda t, n, m: _parse_jvm(t),
             "apple": lambda t, n, m: _parse_apple(t),
             "mk": lambda t, n, m: _parse_mk(t)}

_EMPTY = {"name": None, "message": None, "mode": None, "error": None, "frames": None}


@F.pandas_udf(PARSED_SCHEMA)
def parse_stack_udf(
    text: pd.Series, route: pd.Series, name: pd.Series, message: pd.Series
) -> pd.DataFrame:
    out = []
    for t, r, n, m in zip(text, route, name, message):
        fn = _DISPATCH.get(r)
        out.append({**_EMPTY, **fn(t, n, m)} if fn else dict(_EMPTY))
    return pd.DataFrame(out, columns=list(_EMPTY))
