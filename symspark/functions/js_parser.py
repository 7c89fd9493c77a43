"""JavaScript stack-trace parsing (TraceKit strategy cascade).

A from-scratch Python implementation of the multi-browser stack-trace
parsing algorithm originally published by the MIT-licensed TraceKit project
(github.com/csnover/TraceKit), matching the behavior of the reference's Go
adaptation (sourcemapprocessor/stack_trace_parser.go:399-430): try the
Opera 11+ stacktrace format, then the standard ``stack`` property
(React-Native -> Chrome/V8 -> WinJS -> Gecko per line), then Opera 10,
then the Opera 9 message format.

Pure-Python core so it can be unit-tested against the reference's parser
corpus and driven from a vectorized pandas UDF (Arrow-batched; the per-line
regex cascade itself is inherently scalar).

Returned frames are dicts ``{url, func, line, col}`` with ``line``/``col``
``None`` when absent (nullable ints, stack_trace_parser.go:69-70).
"""

from __future__ import annotations

import re

UNKNOWN_FUNCTION = "?"

# Strategy regexes (stack_trace_parser.go:20-46).  Go RE2 and Python `re`
# agree on leftmost-first capture semantics for these patterns; `(?i)` ports
# directly, and no backreferences are used.
_RE_REACT_NATIVE = re.compile(
    r"^\s*at (.*?) ?\(address at (.+?)(?::(\d+))?(?::(\d+))?\)\s*$", re.I
)
_RE_CHROME = re.compile(
    r"^\s*at (.*?) ?\(((?:file|https?|blob|chrome-extension|native|eval|webpack|<anonymous>|\/).*?)(?::(\d+))?(?::(\d+))?\)?\s*$",
    re.I,
)
_RE_GECKO = re.compile(
    r"^\s*(.*?)(?:\((.*?)\))?(?:^|@)((?:file|https?|blob|chrome|webpack|resource|\[native).*?|[^@]*bundle)(?::(\d+))?(?::(\d+))?\s*$",
    re.I,
)
_RE_WINJS = re.compile(
    r"^\s*at (?:((?:\[object object\])?.+) )?\(?((?:file|ms-appx|https?|webpack|blob):.*?):(\d+)(?::(\d+))?\)?\s*$",
    re.I,
)
_RE_GECKO_EVAL = re.compile(r"(\S+) line (\d+)(?: > eval line \d+)* > eval", re.I)
_RE_CHROME_EVAL = re.compile(r"\((\S*)(?::(\d+))(?::(\d+))\)")  # intentionally no /i
_RE_OPERA11 = re.compile(r" line (\d+).*script (?:in )?(\S+)(?:: in function (\S+))?$", re.I)
_RE_OPERA11_COL = re.compile(
    r" line (\d+), column (\d+)\s*(?:in (?:<anonymous function: ([^>]+)>|([^\)]+))\((.*)\))? in (.*):\s*$",
    re.I,
)
_RE_OPERA9_LINKED = re.compile(
    r"^\s*Line (\d+) of linked script ((?:file|https?|blob)\S+)(?:: in function (\S+))?\s*$",
    re.I,
)
_RE_OPERA9_INLINE = re.compile(
    r"^\s*Line (\d+) of inline#(\d+) script in ((?:file|https?|blob)\S+)(?:: in function (\S+))?\s*$",
    re.I,
)
_RE_OPERA9_FUNC = re.compile(r"^\s*Line (\d+) of function script\s*$", re.I)


def _to_int(s: str | None) -> int | None:
    """strconv.Atoi semantics: None on empty/invalid."""
    if s is None or s == "":
        return None
    try:
        return int(s)
    except ValueError:
        return None


def _frame(url: str, func: str, line: int | None, col: int | None) -> dict:
    return {
        "url": url,
        "func": func if func else UNKNOWN_FUNCTION,
        "line": line,
        "col": col,
    }


def _from_stack_prop(stack: str) -> list[dict] | None:
    """Standard stack property: RN -> Chrome -> WinJS -> Gecko per line
    (stack_trace_parser.go:82-207)."""
    if not stack:
        return None
    frames: list[dict] = []
    for line in stack.split("\n"):
        m = _RE_REACT_NATIVE.search(line)
        if m:
            frames.append(_frame(m.group(2), m.group(1), _to_int(m.group(3)), _to_int(m.group(4))))
            continue
        m = _RE_CHROME.search(line)
        if m:
            url, line_no, col_no = m.group(2), m.group(3), m.group(4)
            if url.startswith("eval"):
                em = _RE_CHROME_EVAL.search(url)
                if em:
                    url, line_no, col_no = em.group(1), em.group(2), em.group(3)
            if m.group(2).startswith("native"):
                url = "(native)"
            frames.append(_frame(url, m.group(1), _to_int(line_no), _to_int(col_no)))
            continue
        m = _RE_WINJS.search(line)
        if m:
            frames.append(_frame(m.group(2), m.group(1) or "", _to_int(m.group(3)), _to_int(m.group(4))))
            continue
        m = _RE_GECKO.search(line)
        if m:
            url, line_no, col_no = m.group(3), m.group(4), m.group(5)
            if " > eval" in url:
                em = _RE_GECKO_EVAL.search(url)
                if em:
                    url, line_no, col_no = em.group(1), em.group(2), None
            frames.append(_frame(url, m.group(1), _to_int(line_no), _to_int(col_no)))
            continue
    return frames or None


def _from_opera11(stacktrace: str) -> list[dict] | None:
    """Opera 11+ stacktrace property, frames on every 2nd line
    (stack_trace_parser.go:210-270)."""
    if not stacktrace:
        return None
    lines = stacktrace.split("\n")
    frames: list[dict] = []
    for i in range(0, len(lines), 2):
        m = _RE_OPERA11.search(lines[i])
        if m:
            frames.append(_frame(m.group(2), m.group(3) or "", _to_int(m.group(1)), None))
            continue
        m = _RE_OPERA11_COL.search(lines[i])
        if m:
            func = m.group(3) or m.group(4) or ""
            frames.append(_frame(m.group(6), func, _to_int(m.group(1)), _to_int(m.group(2))))
    return frames or None


def _opera9_line(line: str) -> dict | None:
    m = _RE_OPERA9_LINKED.search(line)
    if m:
        return _frame(m.group(2), m.group(3) or "", _to_int(m.group(1)), None)
    m = _RE_OPERA9_INLINE.search(line)
    if m:
        return _frame(m.group(3), m.group(4) or "", _to_int(m.group(1)), None)
    m = _RE_OPERA9_FUNC.search(line)
    if m:
        return _frame("", "", None, None)
    return None


def _from_opera10(stacktrace: str) -> list[dict] | None:
    """Opera 10 stacktrace property (Opera 9 line formats, stride 2 from 0,
    stack_trace_parser.go:335-394)."""
    lines = stacktrace.split("\n")
    if len(lines) < 2:
        return None
    frames = [f for i in range(0, len(lines), 2) if (f := _opera9_line(lines[i]))]
    return frames or None


def _from_opera9_message(message: str) -> list[dict] | None:
    """Opera 9 message property: frames from line 2, stride 2
    (stack_trace_parser.go:273-332)."""
    lines = message.split("\n")
    if len(lines) < 4:
        return None
    frames = [f for i in range(2, len(lines), 2) if (f := _opera9_line(lines[i]))]
    return frames or None


def compute_stack_trace(name: str, message: str, stack: str) -> tuple[dict | None, str | None]:
    """Full strategy cascade (stack_trace_parser.go:399-430).

    Returns ``(result, error)`` where result is
    ``{name, message, mode, frames}`` and error is the parse-failure string.
    """
    if stack:
        frames = _from_opera11(stack)
        if frames:
            return {"name": name, "message": message, "mode": "stacktrace", "frames": frames}, None
        frames = _from_stack_prop(stack)
        if frames:
            return {"name": name, "message": message, "mode": "stack", "frames": frames}, None
        frames = _from_opera10(stack)
        if frames:
            return {"name": name, "message": message, "mode": "stacktrace", "frames": frames}, None
    frames = _from_opera9_message(message)
    if frames:
        # Opera 9 overwrites the message with the first message line
        # (stack_trace_parser.go:326-331)
        return {
            "name": name,
            "message": message.split("\n")[0],
            "mode": "multiline",
            "frames": frames,
        }, None
    return None, "failed to parse stack trace"


# ---------------------------------------------------------------------------
# Vectorized batch front-end (Arrow/pandas hot path)
# ---------------------------------------------------------------------------
#
# The overwhelming majority of real stacks are the standard ``stack``
# property (React-Native / Chrome / WinJS / Gecko) - those parse fully
# vectorized with pandas ``str.extract`` (regexes run in C over the whole
# batch).  Every Opera strategy (11+/10/9) requires a literal
# ``line <digits>`` token (``" line 5"`` / ``"Line 5 of ..."``), so rows
# whose stack AND message lack that marker can never take an Opera branch;
# only marker rows (rare) fall back to the scalar cascade.

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

_OPERA_MARKER = re.compile(r"(?im)(?:^|\s)line\s+\d")


def _extract_stack_prop_frames(lines: pd.Series) -> pd.DataFrame:
    """Vectorized RN -> Chrome -> WinJS -> Gecko cascade over a Series of
    single lines (index = originating record id, duplicated per line).
    Returns a DataFrame (rid, url, func, line, col) of matched lines only,
    in original order."""
    rn = lines.str.extract(_RE_REACT_NATIVE)
    ch = lines.str.extract(_RE_CHROME)
    wj = lines.str.extract(_RE_WINJS)
    gk = lines.str.extract(_RE_GECKO)

    # str.extract columns are 0-based: regex group k -> column k-1
    m_rn = rn[1].notna()
    m_ch = ~m_rn & ch[1].notna()
    m_wj = ~m_rn & ~m_ch & wj[1].notna()
    m_gk = ~m_rn & ~m_ch & ~m_wj & gk[2].notna()

    # Chrome eval rewrite: url/line/col from the inner (url:line:col) when
    # the matched url starts with "eval"; the "(native)" check reads the
    # ORIGINAL group 2 (stack_trace_parser.go:120-139 order)
    ch_url, ch_line, ch_col = ch[1].copy(), ch[2].copy(), ch[3].copy()
    ev = m_ch & ch[1].str.startswith("eval").fillna(False)
    if ev.any():
        em = ch.loc[ev, 1].str.extract(_RE_CHROME_EVAL)
        hit = em[0].notna()
        hit_idx = em.index[hit.to_numpy()]
        ch_url.loc[hit_idx] = em.loc[hit_idx, 0]
        ch_line.loc[hit_idx] = em.loc[hit_idx, 1]
        ch_col.loc[hit_idx] = em.loc[hit_idx, 2]
    native = m_ch & ch[1].str.startswith("native").fillna(False)
    ch_url = ch_url.mask(native, "(native)")

    # Gecko eval rewrite: col dropped (stack_trace_parser.go:166-177)
    gk_url, gk_line, gk_col = gk[2].copy(), gk[3].copy(), gk[4].copy()
    gev = m_gk & gk[2].str.contains(" > eval", regex=False).fillna(False)
    if gev.any():
        em = gk.loc[gev, 2].str.extract(_RE_GECKO_EVAL)
        hit = em[0].notna()
        hit_idx = em.index[hit.to_numpy()]
        gk_url.loc[hit_idx] = em.loc[hit_idx, 0]
        gk_line.loc[hit_idx] = em.loc[hit_idx, 1]
        gk_col.loc[hit_idx] = None

    conds = [m_rn.to_numpy(), m_ch.to_numpy(), m_wj.to_numpy(), m_gk.to_numpy()]
    url = np.select(conds, [rn[1], ch_url, wj[1], gk_url], default=None)
    func = np.select(conds, [rn[0], ch[0], wj[0], gk[0]], default=None)
    line = np.select(conds, [rn[2], ch_line, wj[2], gk_line], default=None)
    col = np.select(conds, [rn[3], ch_col, wj[3], gk_col], default=None)

    matched = m_rn | m_ch | m_wj | m_gk
    out = pd.DataFrame(
        {
            "rid": lines.index.to_numpy(),
            "url": url,
            "func": func,
            "line": pd.to_numeric(pd.Series(line), errors="coerce").astype("Int64").to_numpy(object),
            "col": pd.to_numeric(pd.Series(col), errors="coerce").astype("Int64").to_numpy(object),
        }
    )
    return out[matched.to_numpy()]


def compute_stack_trace_batch(
    name: pd.Series, message: pd.Series, stack: pd.Series
) -> "pd.Series":
    """Batch equivalent of :func:`compute_stack_trace`: returns an
    object Series of ``(result, error)`` tuples aligned to the input."""
    name = name.fillna("")
    message = message.fillna("")
    stack = stack.fillna("")
    out = pd.Series([None] * len(stack), index=stack.index, dtype=object)

    marker = stack.str.contains(_OPERA_MARKER) | message.str.contains(_OPERA_MARKER)
    for i in stack.index[marker]:
        out.at[i] = compute_stack_trace(name.at[i], message.at[i], stack.at[i])

    fast = stack.index[~marker]
    if len(fast):
        lines = stack.loc[fast].str.split("\n").explode()
        fr = _extract_stack_prop_frames(lines)
        by_rid: dict = {}
        for rid, url, func, line, col in fr.itertuples(index=False, name=None):
            by_rid.setdefault(rid, []).append(
                _frame(
                    url,
                    func if (func is not None and func == func) else "",
                    None if line is pd.NA else line,
                    None if col is pd.NA else col,
                )
            )
        for i in fast:
            frames = by_rid.get(i)
            if frames:
                out.at[i] = (
                    {
                        "name": name.at[i],
                        "message": message.at[i],
                        "mode": "stack",
                        "frames": frames,
                    },
                    None,
                )
            else:
                out.at[i] = (None, "failed to parse stack trace")
    return out
