"""Offline dSYM symbol-table builder (SURVEY.md §2.1 S8).

The reference loads a real dSYM/DWARF blob through symbolic's
``NewDsymSymbolicator`` and resolves addresses with inline chains
(dsymprocessor/symbolicator.go:70-129); the repo's test fixture blob is
elided upstream (.MISSING_LARGE_BLOBS), so real-DWARF parity cannot be
pinned in-tree.  This module gives users a real ingest path instead of
synthetic parquet: the PUBLIC Breakpad symbol-file format (the standard
plain-text interchange dumped from dSYMs by ``dump_syms``), parsed into
the DSYM_SYMBOLS_SCHEMA address-range dimension rows the pipeline
broadcast-joins.  ``build_store_from_dir`` additionally ingests RAW
Mach-O/ELF images and ``.dSYM`` bundle directories with no external
``dump_syms`` step, via :mod:`symspark.sources.native_debug` (stdlib
container walk + DWARF .debug_line v2-v5).

Supported records (Breakpad processor docs):

    MODULE <os> <arch> <uuid33> <binary_name>
    FILE <id> <path>
    FUNC [m] <addr> <size> <param_size> <name>
    <addr> <size> <line> <file_id>          (LINE record, inside a FUNC)
    PUBLIC [m] <addr> <param_size> <name>
    INLINE_ORIGIN <id> <name>
    INLINE <depth> <call_line> <call_file> <origin> (<addr> <size>)+

Row semantics:
- one row per LINE record: range [addr, addr+size-1], loc = (enclosing
  FUNC name, file path, line, FUNC start addr) - per-instruction line
  resolution, what ``atos`` reports
- a FUNC without LINE records emits one whole-range row with line 0
- PUBLIC symbols have no size: each covers [addr, next_symbol_addr - 1]
  (classic Breakpad behavior), the last one up to 2^63-1
- depth-0 INLINE ranges prepend the inlined origin as the INNERMOST loc
  (origin symbol at the LINE record's line) and re-attribute the caller
  loc to the call-site line - the two-deep chain shape of
  dsymprocessor/symbolicator.go:109-129.  Deeper nesting levels are
  flattened into the same chain, innermost first.

The MODULE uuid's first 32 hex digits are the build UUID (Breakpad
appends an "age" digit); stored lowercase, matching the dim convention.
"""

from __future__ import annotations

import pyarrow as pa

_I64_MAX = (1 << 63) - 1


def _uuid_from_module(tok: str) -> str:
    h = tok.lower()
    h = h[:32] if len(h) >= 32 else h
    return "-".join([h[0:8], h[8:12], h[12:16], h[16:20], h[20:32]]) if len(h) == 32 else h


def parse_breakpad_sym(text: str) -> tuple[str, str, list[dict]]:
    """Parse one Breakpad .sym file -> (build_uuid, binary_name, rows)."""
    build_uuid, binary_name = "", ""
    files: dict[int, str] = {}
    origins: dict[int, str] = {}
    funcs: list[dict] = []  # {addr, size, name, lines: [(addr, size, line, file_id)]}
    publics: list[tuple[int, str]] = []
    inlines: list[dict] = []  # {depth, call_line, call_file, origin, ranges}
    cur_func: dict | None = None

    for raw in text.split("\n"):
        line = raw.rstrip()
        if not line:
            continue
        parts = line.split(" ")
        tag = parts[0]
        if tag == "MODULE" and len(parts) >= 5:
            build_uuid = _uuid_from_module(parts[3])
            binary_name = " ".join(parts[4:])
        elif tag == "FILE" and len(parts) >= 3:
            files[int(parts[1])] = " ".join(parts[2:])
        elif tag == "INLINE_ORIGIN" and len(parts) >= 3:
            origins[int(parts[1])] = " ".join(parts[2:])
        elif tag == "FUNC":
            p = parts[2:] if parts[1] == "m" else parts[1:]
            cur_func = {
                "addr": int(p[0], 16),
                "size": int(p[1], 16),
                "name": " ".join(p[3:]),
                "lines": [],
            }
            funcs.append(cur_func)
        elif tag == "PUBLIC":
            p = parts[2:] if parts[1] == "m" else parts[1:]
            publics.append((int(p[0], 16), " ".join(p[2:])))
            cur_func = None
        elif tag == "INLINE" and len(parts) >= 7:
            ranges = [
                (int(parts[i], 16), int(parts[i + 1], 16))
                for i in range(5, len(parts) - 1, 2)
            ]
            inlines.append(
                {
                    "depth": int(parts[1]),
                    "call_line": int(parts[2]),
                    "call_file": int(parts[3]),
                    "origin": int(parts[4]),
                    "ranges": ranges,
                }
            )
        elif tag in ("STACK", "INFO"):
            continue
        elif cur_func is not None and len(parts) == 4:
            # LINE record: addr size line file_id (hex hex dec dec)
            try:
                cur_func["lines"].append(
                    (int(parts[0], 16), int(parts[1], 16), int(parts[2]), int(parts[3]))
                )
            except ValueError:
                continue

    def inline_chain(addr: int) -> list[tuple[str, int, int]]:
        """(origin_name, call_line, call_file) for inline ranges covering
        addr, INNERMOST first (highest Breakpad nest depth first).  Each
        entry's call_line/call_file locate the call site inside the next
        frame out, so depth order is load-bearing for line attribution."""
        hits = []
        for inl in inlines:
            for lo, sz in inl["ranges"]:
                if lo <= addr < lo + sz:
                    hits.append(
                        (inl["depth"], origins.get(inl["origin"], "?"), inl["call_line"], inl["call_file"])
                    )
                    break
        hits.sort(key=lambda h: -h[0])
        return [(name, call_line, call_file) for _, name, call_line, call_file in hits]

    rows: list[dict] = []

    def add_row(start: int, end: int, fn: dict, line: int, file_id: int | None):
        path = files.get(file_id, "") if file_id is not None else ""
        chain = inline_chain(start)
        locs = []
        if chain:
            # innermost inlined origin gets the LINE record's position;
            # each caller gets its call-site line; the enclosing FUNC last
            inner_line, inner_path = line, path
            for name, call_line, call_file in chain:
                locs.append(
                    {"symbol": name, "path": inner_path, "line": inner_line, "sym_addr": fn["addr"]}
                )
                inner_line, inner_path = call_line, files.get(call_file, "")
            locs.append(
                {"symbol": fn["name"], "path": inner_path, "line": inner_line, "sym_addr": fn["addr"]}
            )
        else:
            locs.append({"symbol": fn["name"], "path": path, "line": line, "sym_addr": fn["addr"]})
        rows.append(
            {
                "build_uuid": build_uuid,
                "binary_name": binary_name,
                "sym_start_addr": start,
                "sym_end_addr": end,
                "locs": locs,
            }
        )

    for fn in funcs:
        if fn["lines"]:
            for addr, size, line, file_id in fn["lines"]:
                add_row(addr, addr + size - 1, fn, line, file_id)
        else:
            add_row(fn["addr"], fn["addr"] + fn["size"] - 1, fn, 0, None)

    # PUBLIC symbols: open ranges up to the next known symbol start
    starts = sorted([f["addr"] for f in funcs] + [a for a, _ in publics])
    for addr, name in publics:
        nxt = [s for s in starts if s > addr]
        end = (nxt[0] - 1) if nxt else _I64_MAX
        rows.append(
            {
                "build_uuid": build_uuid,
                "binary_name": binary_name,
                "sym_start_addr": addr,
                "sym_end_addr": end,
                "locs": [{"symbol": name, "path": "", "line": 0, "sym_addr": addr}],
            }
        )
    return build_uuid, binary_name, rows


_LOCS_TYPE = pa.list_(
    pa.struct(
        [
            ("symbol", pa.string()),
            ("path", pa.string()),
            ("line", pa.int64()),
            ("sym_addr", pa.int64()),
        ]
    )
)
_SCHEMA = pa.schema(
    [
        ("build_uuid", pa.string()),
        ("binary_name", pa.string()),
        ("sym_start_addr", pa.int64()),
        ("sym_end_addr", pa.int64()),
        ("locs", _LOCS_TYPE),
    ]
)


def build_store_from_dir(directory: str) -> tuple[pa.Table, pa.Table]:
    """Parse every symbol artifact in ``directory`` (local path or s3:// /
    gs:// / file:// URI) into the (dsym_symbols, dsym_store) dimension
    tables.  Three artifact shapes are ingested:

    - ``*.sym`` Breakpad files (full inline chains),
    - ``*.dSYM`` bundle directories — each
      ``<bundle>/Contents/Resources/DWARF/<binary>`` image is read raw,
    - bare Mach-O / ELF binaries (detected by magic), via
      :mod:`symspark.sources.native_debug` (DWARF .debug_line + symtab).
    """
    from pyarrow.fs import FileType

    from symspark.sources import native_debug, store_fs

    filesystem, root = store_fs.resolve(directory)
    all_rows: list[dict] = []
    store = {"build_uuid": [], "binary_name": []}

    def ingest(uuid: str, binary: str, rows: list[dict]) -> None:
        all_rows.extend(rows)
        store["build_uuid"].append(uuid)
        store["binary_name"].append(binary)

    for info in store_fs.list_dir(filesystem, root):
        if info.type == FileType.Directory and info.base_name.endswith(".dSYM"):
            dwarf_dir = f"{info.path}/Contents/Resources/DWARF"
            if not store_fs.exists(filesystem, dwarf_dir):
                continue
            for image in store_fs.list_dir(filesystem, dwarf_dir):
                if image.type != FileType.File:
                    continue
                data = store_fs.read_bytes(filesystem, image.path)
                if native_debug.is_native_image(data):
                    ingest(*native_debug.native_to_rows(data, image.base_name))
            continue
        if info.type != FileType.File:
            continue
        if info.base_name.endswith(".sym"):
            ingest(*parse_breakpad_sym(store_fs.read_text(filesystem, info.path)))
            continue
        data = store_fs.read_bytes(filesystem, info.path)
        if native_debug.is_native_image(data):
            ingest(*native_debug.native_to_rows(data, info.base_name))
    cols = {name: [r[name] for r in all_rows] for name in _SCHEMA.names}
    return pa.table(cols, schema=_SCHEMA), pa.table(store)
