"""Arrow-native vectorized parse stage (the hot path).

Same semantics as :mod:`symspark.functions.parse` (the pandas/scalar
implementation, which remains the oracle in tests), but executed entirely
with pyarrow compute kernels: RE2 ``extract_regex`` over every line of the
batch, C++ list/struct assembly (``ListArray.from_arrays``), and numpy
index arithmetic.  No per-row Python runs for the js / jvm / apple routes;
only MetricKit (a recursive JSON flatten, ~2% of rows) and js rows carrying
an Opera ``line N`` marker (rare) drop to the scalar parsers.

RE2 is also the regex engine of the Go reference
(sourcemapprocessor/stack_trace_parser.go:20-46), so kernel-level match
semantics are literally the reference's own.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F
from pyspark.sql.pandas.types import to_arrow_type

from symspark.functions.js_parser import UNKNOWN_FUNCTION, compute_stack_trace
from symspark.functions.parse import PARSE_WRAP, _js_result_to_row, _parse_mk
from symspark.schemas import PARSED_SCHEMA

# Shared with the JVM-expression engine: lines longer than LINE_CAP are
# treated as non-matching in BOTH engines (parse_sql.py gates its
# backtracking java.util.regex cascade on it; RE2 here is linear-time and
# does not need the guard, but sql==udf byte-parity must hold on any input).
from symspark.functions.parse_sql import LINE_CAP

def _as_array(a) -> "pa.Array":
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


PARSED_PA = to_arrow_type(PARSED_SCHEMA)
FRAME_PA = PARSED_PA.field("frames").type.value_type
FRAMES_LIST_PA = PARSED_PA.field("frames").type
_FRAME_NAMES = [FRAME_PA.field(i).name for i in range(FRAME_PA.num_fields)]

# --- regexes, RE2 syntax with named groups -------------------------------
# (ported 1:1 from js_parser/java_parser/apple_parser; see those modules for
# the reference file:line provenance)
_RE_OPERA_MARKER = r"(?im)(?:^|\s)line\s+\d"
_RE_RN = (
    r"(?i)^\s*at (?P<func>.*?) ?\(address at "
    r"(?P<url>.+?)(?::(?P<line>\d+))?(?::(?P<col>\d+))?\)\s*$"
)
_RE_CHROME = (
    r"(?i)^\s*at (?P<func>.*?) ?\((?P<url>(?:file|https?|blob|chrome-extension"
    r"|native|eval|webpack|<anonymous>|\/).*?)(?::(?P<line>\d+))?(?::(?P<col>\d+))?\)?\s*$"
)
_RE_CHROME_EVAL = r"\((?P<url>\S*)(?::(?P<line>\d+))(?::(?P<col>\d+))\)"  # no (?i)
_RE_WINJS = (
    r"(?i)^\s*at (?:(?P<func>(?:\[object object\])?.+) )?\(?"
    r"(?P<url>(?:file|ms-appx|https?|webpack|blob):.*?):(?P<line>\d+)(?::(?P<col>\d+))?\)?\s*$"
)
_RE_GECKO = (
    r"(?i)^\s*(?P<func>.*?)(?:\((?P<args>.*?)\))?(?:^|@)"
    r"(?P<url>(?:file|https?|blob|chrome|webpack|resource|\[native).*?|[^@]*bundle)"
    r"(?::(?P<line>\d+))?(?::(?P<col>\d+))?\s*$"
)
_RE_APPLE = (
    r"^(?P<prefix>(?P<idx>[0-9]+)\s+(?P<lib>[\w _\-\.]+[\w_\-\.])\s+(?P<hex>0x[\da-f]+))"
    r"\s+(?P<tok>[\w _\-\.]*) \+ (?P<off>\d+)"
)
_RE_JAVA_HEADER = r"^(?P<typ>[^\s:]+)\s*:\s*(?P<msg>.*)$"
_RE_JAVA_FRAME = (
    r"^\s*at\s+(?P<cls>[^\s(]+)\.(?P<method>[^\s.(]+)"
    r"\((?P<src>[^:)]+)(?::(?P<line>-?\d+))?\)\s*$"
)

_ERR_PARSE = PARSE_WRAP + "failed to parse stack trace"
_ERR_EMPTY = PARSE_WRAP + "stack trace is empty"
_ERR_INVALID = PARSE_WRAP + "invalid stack trace format"
_ERR_NO_FRAMES = PARSE_WRAP + "no valid stack frames found in stack trace"


# --- small builders --------------------------------------------------------

def _frames_struct(n: int, **cols) -> pa.StructArray:
    """Frame struct array with the given children; absent fields null."""
    arrays = []
    for i in range(FRAME_PA.num_fields):
        f = FRAME_PA.field(i)
        a = cols.get(f.name)
        if a is None:
            a = pa.nulls(n, f.type)
        else:
            if not isinstance(a, (pa.Array, pa.ChunkedArray)):
                a = pa.array(a, type=f.type)
            if isinstance(a, pa.ChunkedArray):
                a = a.combine_chunks()
            if a.type != f.type:
                a = a.cast(f.type)
        arrays.append(a)
    return pa.StructArray.from_arrays(arrays, fields=list(FRAME_PA))


def _parsed_struct(
    n: int, name=None, message=None, mode=None, error=None, frames=None
) -> pa.StructArray:
    def _s(v):
        if v is None:
            return pa.nulls(n, pa.string())
        if isinstance(v, str):
            return pa.array([v] * n, type=pa.string())
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return v.cast(pa.string()) if v.type != pa.string() else v

    if frames is None:
        frames = pa.nulls(n, FRAMES_LIST_PA)
    return pa.StructArray.from_arrays(
        [_s(name), _s(message), _s(mode), _s(error), frames], fields=list(PARSED_PA)
    )


def _list_from_parents(
    n_rows: int, parents: np.ndarray, values: pa.StructArray, null_empty: bool = False
) -> pa.ListArray:
    """List column from sorted parent indices.  ``null_empty`` marks rows
    with zero values as null lists (vs empty lists)."""
    counts = np.bincount(parents, minlength=n_rows) if len(parents) else np.zeros(n_rows, np.int64)
    ends = np.cumsum(counts)
    offsets = np.empty(n_rows + 1, dtype=np.int64)
    offsets[0] = 0
    offsets[1:] = ends
    if null_empty and (counts == 0).any():
        off_obj = offsets.tolist()
        for i in np.nonzero(counts == 0)[0]:
            off_obj[int(i)] = None
        off_arr = pa.array(off_obj, type=pa.int32())
    else:
        off_arr = pa.array(offsets, type=pa.int32())
    lst = pa.ListArray.from_arrays(off_arr, values)
    return lst.cast(FRAMES_LIST_PA)


def _combine(n: int, parts: list[tuple[np.ndarray, pa.Array]]) -> pa.Array:
    """Scatter per-subset results back to full batch order via one take."""
    sel = np.empty(n, dtype=np.int64)
    offset = 0
    chunks = []
    for mask, arr in parts:
        k = int(mask.sum())
        if k:
            sel[mask] = offset + np.arange(k)
            offset += k
            chunks.append(arr)
    combined = chunks[0] if len(chunks) == 1 else pa.concat_arrays(chunks)
    return combined.take(pa.array(sel))


def _np_bool(arr) -> np.ndarray:
    return pc.fill_null(arr, False).to_numpy(zero_copy_only=False)


def _line_ok_np(flat: pa.Array) -> np.ndarray:
    """Mirror of parse_sql._line_ok: over-cap or sentinel-carrying lines
    are non-matching in both engines (see the LINE_CAP note there)."""
    return (
        (pc.utf8_length(flat).to_numpy(zero_copy_only=False) <= LINE_CAP)
        & ~_np_bool(pc.match_substring(flat, "\x01"))
        & ~_np_bool(pc.match_substring(flat, "\x02"))
    )


def _extract(lines: pa.Array, pattern: str) -> pa.StructArray:
    out = pc.extract_regex(lines, pattern)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _extract_sub(lines: pa.Array, mask: np.ndarray, pattern: str) -> pa.StructArray:
    """extract_regex evaluated only on the masked subset (the candidate
    lines), scattered back to full length with nulls elsewhere - keeps the
    per-pattern cost proportional to its candidate set, not the corpus."""
    idx = np.nonzero(mask)[0]
    ex_sub = _extract(lines.take(pa.array(idx)), pattern)
    sel = np.zeros(len(lines), dtype=np.int64)  # 0 -> null sentinel row
    sel[idx] = 1 + np.arange(len(idx))
    return _as_array(pa.concat_arrays(
        [pa.nulls(1, ex_sub.type), ex_sub]
    ).take(pa.array(sel)))


def _grp(ex: pa.StructArray, name: str) -> pa.Array:
    return pc.struct_field(ex, name)


def _int_or_null(strs: pa.Array, typ=pa.int64()) -> pa.Array:
    """'' / null -> null, else cast (matches _to_int on \\d+ groups)."""
    cleaned = pc.if_else(pc.equal(pc.fill_null(strs, ""), ""), pa.scalar(None, pa.string()), strs)
    return pc.cast(cleaned, typ)


# --- js -------------------------------------------------------------------

def _parse_js_arrow(stack: pa.Array, name: pa.Array, message: pa.Array) -> pa.StructArray:
    n = len(stack)
    if n == 0:
        return _parsed_struct(0)
    stack = pc.fill_null(stack, "")
    name = pc.fill_null(name, "")
    message = pc.fill_null(message, "")

    slow = _np_bool(pc.match_substring_regex(stack, _RE_OPERA_MARKER)) | _np_bool(
        pc.match_substring_regex(message, _RE_OPERA_MARKER)
    )
    parts: list[tuple[np.ndarray, pa.Array]] = []
    if slow.any():
        rows = []
        for t, nm, ms in zip(
            stack.take(pa.array(np.nonzero(slow)[0])).to_pylist(),
            name.take(pa.array(np.nonzero(slow)[0])).to_pylist(),
            message.take(pa.array(np.nonzero(slow)[0])).to_pylist(),
        ):
            rows.append(_js_result_to_row(*compute_stack_trace(nm, ms, t)))
        parts.append((slow, pa.array(rows, type=PARSED_PA)))

    fast = ~slow
    if fast.any():
        fidx = np.nonzero(fast)[0]
        fstack = stack.take(pa.array(fidx))
        lists = pc.split_pattern(fstack, "\n")
        flat = _as_array(pc.list_flatten(lists))
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        nl = len(flat)

        # cascade priority RN > Chrome > WinJS > Gecko, evaluated cheapest-
        # first: RN needs the literal "address at" (substring prefilter);
        # Chrome is the dominant format (full-corpus extract); WinJS/Gecko
        # only see lines the earlier strategies rejected
        ok_len = _line_ok_np(flat)
        rn_cand = ok_len & _np_bool(pc.match_substring(flat, "address at"))
        rn = _extract_sub(flat, rn_cand, _RE_RN)
        m_rn = _np_bool(pc.is_valid(rn))
        ch = _extract(flat, _RE_CHROME)
        m_ch = ok_len & ~m_rn & _np_bool(pc.is_valid(ch))
        wj = _extract_sub(flat, ok_len & ~m_rn & ~m_ch, _RE_WINJS)
        m_wj = ok_len & ~m_rn & ~m_ch & _np_bool(pc.is_valid(wj))
        gk = _extract_sub(flat, ok_len & ~m_rn & ~m_ch & ~m_wj, _RE_GECKO)
        m_gk = ok_len & ~m_rn & ~m_ch & ~m_wj & _np_bool(pc.is_valid(gk))

        ch_url = _grp(ch, "url")
        ch_line, ch_col = _grp(ch, "line"), _grp(ch, "col")
        ev = m_ch & _np_bool(pc.starts_with(ch_url, "eval"))
        if ev.any():
            em = _extract(pc.fill_null(ch_url, ""), _RE_CHROME_EVAL)
            hit = ev & _np_bool(pc.is_valid(em))
            hit_pa = pa.array(hit)
            ch_url = pc.if_else(hit_pa, _grp(em, "url"), ch_url)
            ch_line = pc.if_else(hit_pa, _grp(em, "line"), ch_line)
            ch_col = pc.if_else(hit_pa, _grp(em, "col"), ch_col)
        native = m_ch & _np_bool(pc.starts_with(_grp(ch, "url"), "native"))
        if native.any():
            ch_url = pc.if_else(pa.array(native), pa.scalar("(native)"), ch_url)
        # gecko " > eval" rewrite needs a " line N" token in the url, which
        # routes the whole record to the slow path - nothing to do here

        def _sel(field, ch_override=None):
            c = ch_override if ch_override is not None else _grp(ch, field)
            return pc.if_else(
                pa.array(m_rn),
                _grp(rn, field),
                pc.if_else(
                    pa.array(m_ch),
                    c,
                    pc.if_else(pa.array(m_wj), _grp(wj, field), _grp(gk, field)),
                ),
            )

        url = _sel("url", None if not (ev.any() or native.any()) else ch_url)
        func = _sel("func")
        line = _int_or_null(_sel("line", ch_line))
        col = _int_or_null(_sel("col", ch_col))
        func = pc.if_else(
            pc.equal(pc.fill_null(func, ""), ""), pa.scalar(UNKNOWN_FUNCTION), func
        )

        matched = m_rn | m_ch | m_wj | m_gk
        midx = np.nonzero(matched)[0]
        take = pa.array(midx)
        mparents = parents[matched]
        counts = np.bincount(mparents, minlength=len(fidx))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(len(midx)) - starts[mparents] if len(midx) else np.array([], np.int64)

        frames = _frames_struct(
            len(midx),
            pos=pa.array(pos, type=pa.int32()),
            kind=pa.array(["js"] * len(midx), type=pa.string()),
            url=url.take(take),
            func=func.take(take),
            line=pc.fill_null(line.take(take), -1),
            col=pc.fill_null(col.take(take), -1),
        )
        frames_list = _list_from_parents(len(fidx), mparents, frames, null_empty=True)
        ok = counts > 0
        fname = pa.array(np.where(ok, name.take(pa.array(fidx)).to_numpy(zero_copy_only=False), None))
        fmsg = pa.array(np.where(ok, message.take(pa.array(fidx)).to_numpy(zero_copy_only=False), None))
        mode = pa.array(np.where(ok, "stack", None))
        error = pa.array(np.where(ok, None, _ERR_PARSE))
        parts.append((fast, _parsed_struct(len(fidx), fname, fmsg, mode, error, frames_list)))

    return _combine(n, parts)


# --- apple ------------------------------------------------------------------

def _parse_apple_arrow(text: pa.Array) -> pa.StructArray:
    n = len(text)
    lists = pc.split_pattern(pc.fill_null(text, ""), "\n")
    flat = _as_array(pc.list_flatten(lists))
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    ok_len = _line_ok_np(flat)
    ex = _extract_sub(flat, ok_len, _RE_APPLE)
    ok = pa.array(_np_bool(pc.is_valid(ex)))
    counts = np.bincount(parents, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(flat)) - starts[parents]
    frames = _frames_struct(
        len(flat),
        pos=pa.array(pos, type=pa.int32()),
        kind=pc.if_else(ok, pa.scalar("apple"), pa.scalar("apple_raw")),
        raw=flat,
        prefix=_grp(ex, "prefix"),
        lib=_grp(ex, "lib"),
        tok=_grp(ex, "tok"),
        addr=_int_or_null(_grp(ex, "off")),
    )
    return _parsed_struct(n, frames=_list_from_parents(n, parents, frames))


# --- jvm --------------------------------------------------------------------

def _parse_jvm_arrow(text: pa.Array) -> pa.StructArray:
    n = len(text)
    txt = pc.fill_null(text, "")
    lists = pc.split_pattern(txt, "\n")
    hdr = _extract(pc.utf8_trim_whitespace(pc.list_element(lists, 0)), _RE_JAVA_HEADER)
    empty = _np_bool(pc.equal(txt, ""))
    no_hdr = ~empty & ~_np_bool(pc.is_valid(hdr))

    flat = _as_array(pc.list_flatten(lists))
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    counts_all = np.bincount(parents, minlength=n)
    starts_all = np.concatenate([[0], np.cumsum(counts_all)[:-1]])
    local = np.arange(len(flat)) - starts_all[parents]
    blank = _np_bool(pc.equal(pc.utf8_trim_whitespace(flat), ""))
    keep = (local > 0) & ~blank & ~(empty | no_hdr)[parents]

    ok_len = _line_ok_np(flat)
    fr = _extract_sub(flat, ok_len, _RE_JAVA_FRAME)
    kidx = np.nonzero(keep)[0]
    take = pa.array(kidx)
    kparents = parents[keep]
    counts = np.bincount(kparents, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(kidx)) - starts[kparents] if len(kidx) else np.array([], np.int64)

    frk = fr.take(take)
    is_frame = pa.array(_np_bool(pc.is_valid(frk)))
    src = _grp(frk, "src")
    line_raw = _int_or_null(_grp(frk, "line"))
    # Native Method -> -2, missing -> -1 (java_parser.java_line_number)
    line = pc.if_else(
        pc.equal(pc.fill_null(src, ""), "Native Method"),
        pa.scalar(-2, pa.int64()),
        pc.fill_null(line_raw, -1),
    )
    frames = _frames_struct(
        len(kidx),
        pos=pa.array(pos, type=pa.int32()),
        kind=pc.if_else(is_frame, pa.scalar("jvm"), pa.scalar("jvm_raw")),
        cls=_grp(frk, "cls"),
        method=_grp(frk, "method"),
        src=src,
        line=pc.if_else(is_frame, line, pa.scalar(None, pa.int64())),
        raw=pc.if_else(is_frame, pa.scalar(None, pa.string()), flat.take(take)),
    )
    no_frames = ~empty & ~no_hdr & (counts == 0)
    err = np.full(n, None, dtype=object)
    err[empty] = _ERR_EMPTY
    err[no_hdr] = _ERR_INVALID
    err[no_frames] = _ERR_NO_FRAMES
    ok = ~(empty | no_hdr | no_frames)
    hname = _grp(hdr, "typ").to_numpy(zero_copy_only=False)
    hmsg = _grp(hdr, "msg").to_numpy(zero_copy_only=False)
    frames_list = _list_from_parents(n, kparents, frames, null_empty=True)
    # rows that errored keep frames null (null_empty handles counts==0)
    return _parsed_struct(
        n,
        pa.array(np.where(ok, hname, None)),
        pa.array(np.where(ok, hmsg, None)),
        None,
        pa.array(err, type=pa.string()),
        frames_list,
    )


# --- mk (per-row JSON flatten, ~2% of rows) ---------------------------------

def _parse_mk_arrow(text: pa.Array) -> pa.StructArray:
    rows = [_parse_mk(t or "") for t in text.to_pylist()]
    arr = pa.array(rows, type=PARSED_PA)
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


# --- the UDF ----------------------------------------------------------------

@F.arrow_udf(PARSED_SCHEMA)
def parse_stack_arrow_udf(
    text: pa.Array, route: pa.Array, name: pa.Array, message: pa.Array
) -> pa.Array:
    text, route, name, message = map(_as_array, (text, route, name, message))
    n = len(text)
    if n == 0:
        return _parsed_struct(0)
    r = pc.fill_null(route, "")
    parts: list[tuple[np.ndarray, pa.Array]] = []
    covered = np.zeros(n, dtype=bool)

    def sub(mask: np.ndarray, arr: pa.Array):
        parts.append((mask, arr))

    for key in ("js", "jvm", "apple", "mk"):
        mask = _np_bool(pc.equal(r, key))
        if not mask.any():
            continue
        covered |= mask
        take = pa.array(np.nonzero(mask)[0])
        if key == "js":
            sub(mask, _parse_js_arrow(text.take(take), name.take(take), message.take(take)))
        elif key == "jvm":
            sub(mask, _parse_jvm_arrow(text.take(take)))
        elif key == "apple":
            sub(mask, _parse_apple_arrow(text.take(take)))
        else:
            sub(mask, _parse_mk_arrow(text.take(take)))
    rest = ~covered
    if rest.any():
        sub(rest, _parsed_struct(int(rest.sum())))
    return _combine(n, parts)
