"""The vectorized batch parser must be byte-identical to the scalar
TraceKit cascade on every input (the scalar path is the semantics oracle,
itself pinned to the reference corpus in test_js_parser.py)."""

import re

import pandas as pd
import pytest

from symspark.functions.js_parser import compute_stack_trace, compute_stack_trace_batch

# every stack/message literal used by the scalar corpus tests, plus
# adversarial extras for the fast/slow routing
_CASES = []


def _collect_corpus():
    import tests.test_js_parser as corpus

    src = open(corpus.__file__).read()
    # re-run the corpus module's literals through both parsers: grab every
    # triple passed to compute_stack_trace via its helper
    return src


def _add(name, msg, stack):
    _CASES.append((name, msg, stack))


_add("Error", "Error message", "")
_add("TypeError", "boom", "TypeError: boom\n    at foo (http://x/a.js:1:2)\n    at http://x/b.js:3:4")
_add("e", "m", "  at fn (webpack:///src/index.ts:78:20)\n junk line\n  at page (webpack:///p.ts:8:1)")
_add("e", "m", "trace@http://x/a.js:10:5\n@http://x/b.js:2:1")
_add("e", "m", "    at Object.<anonymous> (native)")
_add("e", "m", "    at eval (eval at foo (http://x/a.js:1:2), <anonymous>:3:4)")
_add("e", "m", "x@http://y/f.js line 2 > eval:1:1")  # gecko eval -> marker -> slow path
_add(
    "e",
    "m",
    "Error thrown at line 42, column 3 in fn(a) in http://opera.example/x.js:\n    called from line 1, column 0 in <anonymous function: outer>(b) in http://opera.example/y.js:",
)
_add(
    "e",
    "Statement on line 44: whatever\nBacktrace:\n  Line 44 of linked script http://o.example/t.js\n    fn();\n  Line 31 of linked script http://o.example/u.js\n    g();",
    "",
)
_add("e", "m", "  Line 12 of inline#2 script in http://o.example/i.html: in function foo\n    x();\n  Line 5 of function script\n    y();")
_add("e", "m", "    at fnname (ms-appx://pkg/js/app.js:10:5)")
_add("e", "m", "    at [object Object].method (file:///C:/app/x.js:5)")
_add("e", "m", "  at whatever (address at index.android.bundle:1:2)")
_add("e", "m", "obj.method@resource://gre/modules/X.jsm:92")
_add("e", "m", "\n\n\n")
_add("e", "m", "completely unparseable garbage")
_add(None, None, None)


def test_batch_matches_scalar_on_corpus():
    names = pd.Series([c[0] for c in _CASES])
    msgs = pd.Series([c[1] for c in _CASES])
    stacks = pd.Series([c[2] for c in _CASES])
    batch = compute_stack_trace_batch(names, msgs, stacks)
    for i, (n, m, s) in enumerate(_CASES):
        want = compute_stack_trace(n or "", m or "", s or "")
        got = batch.iloc[i]
        got = (got[0], got[1])
        assert _norm(got) == _norm(want), f"case {i}: {s!r}\n got {got}\nwant {want}"


def _norm(res):
    r, err = res
    if r is None:
        return (None, err)
    frames = [
        (f["url"], f["func"], None if f["line"] is None else int(f["line"]),
         None if f["col"] is None else int(f["col"]))
        for f in r["frames"]
    ]
    return ((r["name"], r["message"], r["mode"], tuple(frames)), err)


def test_batch_matches_scalar_on_fixture_transcripts():
    import pyarrow.parquet as pq

    from symspark.plans.queries import transcripts_dir

    d = transcripts_dir("/root/testdata/sf0.001")
    t = pq.read_table(d + "/transcripts.parquet", columns=["text"]).to_pandas()
    js = t[t.text.str.contains(r"\n    at ", regex=True, na=False)].head(2000)
    names = pd.Series(["E"] * len(js), index=js.index)
    msgs = pd.Series(["m"] * len(js), index=js.index)
    batch = compute_stack_trace_batch(names, msgs, js.text)
    for i in js.index:
        want = compute_stack_trace("E", "m", js.text.at[i])
        assert _norm(batch.at[i]) == _norm(want)


def test_arrow_parser_matches_scalar_on_corpus():
    """The Arrow-native UDF internals must match the scalar parsers on the
    corpus cases (including Opera fallback routing and parse errors)."""
    import pyarrow as pa

    import symspark.functions.parse as P
    import symspark.functions.parse_arrow as PA

    names = pa.array([c[0] for c in _CASES], type=pa.string())
    msgs = pa.array([c[1] for c in _CASES], type=pa.string())
    stacks = pa.array([c[2] for c in _CASES], type=pa.string())
    out = PA._parse_js_arrow(stacks, names, msgs).to_pylist()
    for i, (n, m, s) in enumerate(_CASES):
        exp = {**P._EMPTY, **P._parse_js(s, n or "", m or "")}
        fr = exp["frames"]
        exp = dict(
            exp,
            frames=None
            if fr is None
            else [{**{k: None for k in PA._FRAME_NAMES}, **f} for f in fr],
        )
        assert out[i] == exp, f"case {i}: {s!r}"


def test_arrow_parser_matches_scalar_on_fixture():
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import symspark.functions.parse as P
    import symspark.functions.parse_arrow as PA

    from symspark.plans.queries import transcripts_dir

    d = transcripts_dir("/root/testdata/sf0.001")
    txt = pq.read_table(d + "/transcripts.parquet", columns=["text"])["text"].combine_chunks()
    for marker, arrow_fn, scalar_fn in [
        ("\n    at ", None, None),  # js handled below
        ("Crashed:", PA._parse_apple_arrow, P._parse_apple),
        ("\n\tat ", PA._parse_jvm_arrow, P._parse_jvm),
    ]:
        sub = pc.fill_null(txt, "").filter(pc.match_substring(pc.fill_null(txt, ""), marker))
        sub = sub.combine_chunks() if isinstance(sub, pa.ChunkedArray) else sub
        sub = sub.slice(0, 500)
        if arrow_fn is None:
            n = len(sub)
            got = PA._parse_js_arrow(sub, pa.array(["E"] * n), pa.array(["m"] * n)).to_pylist()
            want = [P._parse_js(x, "E", "m") for x in sub.to_pylist()]
        else:
            got = arrow_fn(sub).to_pylist()
            want = [scalar_fn(x) for x in sub.to_pylist()]
        for g, w in zip(got, want):
            exp = {**P._EMPTY, **w}
            fr = exp["frames"]
            exp = dict(
                exp,
                frames=None
                if fr is None
                else [{**{k: None for k in PA._FRAME_NAMES}, **f} for f in fr],
            )
            assert g == exp
