"""Offline ProGuard/R8 mapping.txt builder (SURVEY.md §2.1 S9).

The reference feeds raw ``mapping.txt`` bytes to symbolic's
``NewProguardMapper`` and calls ``RemapFrame(class, method, line)``
(proguardprocessor/symbolicator.go:117-142).  Our Spark-first equivalent
parses the public R8/ProGuard mapping format ONCE, offline, into the
``proguard_mapping`` dimension table rows the pipeline broadcast-joins
(schemas.PROGUARD_MAPPING_SCHEMA): one row per
(obf_class, obf_method, line range) carrying the 0..N original frames that
``RemapFrame`` would return for any obfuscated line in the range.

Format reference (public R8/ProGuard docs):

    original.Class -> obf.Name:
    # {"id":"sourceFile","fileName":"Class.kt"}
        int field -> a
        1:3:void com.example.Inlined.helper(int):10:12 -> m
        1:3:void caller():25 -> m
        void plainMethod() -> n

Method lines: ``[start:end:]retType name(args)[:origStart[:origEnd]] -> obf``.
Consecutive lines sharing the same (start:end, obf) form an inline chain:
remapping one obfuscated line yields the whole chain, file order = output
order (innermost callee first, caller last - retrace convention).

Line-number semantics per obfuscated line L in [start, end]:
- origStart..origEnd parallel range (end-start == origEnd-origStart):
  original = origStart + (L - start)   -> emitted as per-line rows
- origStart only (or degenerate origEnd): original = origStart (constant)
- no orig info: original = L (identity) -> per-line rows
Parallel/identity ranges wider than ``MAX_EXPAND`` fall back to the
constant origStart interpretation (documented approximation; R8 emits
narrow ranges for line-mapped code).

Source files: the R8 ``sourceFile`` metadata comment when present for the
frame's class, else the class simple name + ".java".
"""

from __future__ import annotations

import os
import re

import pyarrow as pa

MAX_UINT32 = (1 << 32) - 1
MAX_EXPAND = 4096

_RE_CLASS = re.compile(r"^(\S+) -> (\S+):$")
_RE_METHOD = re.compile(
    r"^\s+(?:(\d+):(\d+):)?"  # obfuscated line range
    r"(\S+)\s+([^\s(]+)\(([^)]*)\)"  # retType name(args); name may be qualified
    r"(?::(-?\d+))?(?::(-?\d+))?"  # original line (range)
    r" -> (\S+)$"
)
_RE_SOURCEFILE = re.compile(r'\{"id":"sourceFile","fileName":"([^"]*)"\}')


def _simple_java_source(cls: str) -> str:
    simple = cls.rsplit(".", 1)[-1].split("$", 1)[0]
    return f"{simple}.java"


def parse_mapping_text(uuid: str, text: str) -> list[dict]:
    """Parse one mapping.txt into PROGUARD_MAPPING_SCHEMA row dicts."""
    source_files: dict[str, str] = {}  # original class -> fileName
    # pass 1: class renames + sourceFile comments (inlined methods may
    # reference classes declared later in the file)
    renames: dict[str, str] = {}
    cur_orig = None
    for line in text.split("\n"):
        m = _RE_CLASS.match(line)
        if m:
            cur_orig = m.group(1)
            renames[m.group(1)] = m.group(2)
            continue
        sf = _RE_SOURCEFILE.search(line)
        if sf and cur_orig is not None:
            source_files[cur_orig] = sf.group(1)

    def src_of(cls: str) -> str:
        return source_files.get(cls) or _simple_java_source(cls)

    rows: list[dict] = []
    # (obf_class, obf_method) pairs that have at least one ranged mapping:
    # line-less mappings for those keys are dropped (the ranged rows are
    # the authoritative per-line answers; see module docstring)
    ranged_keys: set[tuple[str, str]] = set()
    lineless: list[dict] = []

    cur_orig = None
    cur_obf = None
    chain_key = None  # (start, end, obf_method) of the open inline chain
    chain: list[tuple] = []  # (orig_cls, orig_method, orig_start, orig_end)

    def flush_chain():
        nonlocal chain, chain_key
        if not chain_key:
            return
        start, end, obf_method = chain_key
        width = end - start + 1
        # per-L original line for each chain member
        def orig_at(member, L):
            _cls, _method, x, y = member
            if x is None:
                return L  # identity
            if y is not None and y >= x and (y - x) == (end - start):
                return x + (L - start)
            return x  # constant
        needs_expand = width > 1 and any(
            (x is None) or (y is not None and y >= x and (y - x) == (end - start) and y != x)
            for (_c, _m, x, y) in chain
        )
        if needs_expand and width > MAX_EXPAND:
            needs_expand = False  # documented fallback: constant interpretation
        pieces = (
            [(L, L) for L in range(start, end + 1)] if needs_expand else [(start, end)]
        )
        for lo, hi in pieces:
            rows.append(
                {
                    "proguard_uuid": uuid,
                    "obf_class": cur_obf,
                    "obf_method": obf_method,
                    "line_start": lo,
                    "line_end": hi,
                    "mapped": [
                        {
                            "class_name": c,
                            "method_name": m,
                            "source_file": src_of(c),
                            "line_number": orig_at((c, m, x, y), lo),
                        }
                        for (c, m, x, y) in chain
                    ],
                }
            )
        ranged_keys.add((cur_obf, obf_method))
        chain, chain_key = [], None

    for line in text.split("\n"):
        cm = _RE_CLASS.match(line)
        if cm:
            flush_chain()
            cur_orig, cur_obf = cm.group(1), cm.group(2)
            continue
        mm = _RE_METHOD.match(line)
        if not mm or cur_obf is None:
            if not line.startswith("#"):
                flush_chain()
            continue
        start, end, _ret, name, _args, ostart, oend, obf = mm.groups()
        if "." in name:
            ocls, omethod = name.rsplit(".", 1)
        else:
            ocls, omethod = cur_orig, name
        member = (
            ocls,
            omethod,
            int(ostart) if ostart is not None else None,
            int(oend) if oend is not None else None,
        )
        if start is None:
            flush_chain()
            lineless.append(
                {
                    "proguard_uuid": uuid,
                    "obf_class": cur_obf,
                    "obf_method": obf,
                    "line_start": -2,
                    "line_end": MAX_UINT32,
                    "mapped": [
                        {
                            "class_name": ocls,
                            "method_name": omethod,
                            "source_file": src_of(ocls),
                            "line_number": member[2] if member[2] is not None else 0,
                        }
                    ],
                }
            )
            continue
        key = (int(start), int(end), obf)
        if key != chain_key:
            flush_chain()
            chain_key = key
        chain.append(member)
    flush_chain()

    rows.extend(
        r for r in lineless if (r["obf_class"], r["obf_method"]) not in ranged_keys
    )
    return rows


_MAPPED_TYPE = pa.list_(
    pa.struct(
        [
            ("class_name", pa.string()),
            ("method_name", pa.string()),
            ("source_file", pa.string()),
            ("line_number", pa.int64()),
        ]
    )
)
_SCHEMA = pa.schema(
    [
        ("proguard_uuid", pa.string()),
        ("obf_class", pa.string()),
        ("obf_method", pa.string()),
        ("line_start", pa.int64()),
        ("line_end", pa.int64()),
        ("mapped", _MAPPED_TYPE),
    ]
)


def rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {name: [r[name] for r in rows] for name in _SCHEMA.names}
    return pa.table(cols, schema=_SCHEMA)


def build_store_from_dir(directory: str) -> tuple[pa.Table, pa.Table]:
    """Parse every ``<uuid>.txt`` mapping file in ``directory`` (the
    reference's store layout, proguardprocessor/store.go:36-53) into the
    (proguard_mapping, proguard_store) dimension tables.

    ``directory`` may be a local path or an ``s3://`` / ``gs://`` /
    ``file://`` URI (the reference's three store backends,
    proguardprocessor/store.go:56-128) - resolved via store_fs/pyarrow.fs.
    """
    from pyarrow.fs import FileType

    from symspark.sources import store_fs

    filesystem, root = store_fs.resolve(directory)
    rows: list[dict] = []
    uuids: list[str] = []
    for info in store_fs.list_dir(filesystem, root):
        if info.type != FileType.File or not info.base_name.endswith(".txt"):
            continue
        uuid = info.base_name[: -len(".txt")]
        rows.extend(parse_mapping_text(uuid, store_fs.read_text(filesystem, info.path)))
        uuids.append(uuid)
    return rows_to_table(rows), pa.table({"proguard_uuid": uuids})
