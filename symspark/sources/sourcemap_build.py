"""Offline source-map lookup-table builder (SURVEY.md §2.1 S7).

The reference fetches minified JS, extracts the LAST ``//# sourceMappingURL``
comment, fetches the map relative to the source's directory, and hands both
to symbolic's SourceMapCache (sourcemapprocessor/store.go:21,33-78,
symbolicator.go:129-146).  Our Spark-first equivalent decodes the Source Map
Revision 3 ``mappings`` VLQ field (public spec) ONCE, offline, into the
``sourcemap_tokens`` dimension table that the pipeline broadcast-joins.

Output convention: ``min_line``/``min_col`` are the 0-based GENERATED
position of each token; ``src_line``/``src_col`` are 1-based original
positions (the reference's golden prints 1-based — symbolicator_test.go:44
expects ``bar(basic-mapping.js:8:1)``).
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa

_B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
_B64_IDX = {c: i for i, c in enumerate(_B64)}

# last //# sourceMappingURL= comment wins (store.go:21,58-66)
MAPPING_URL_RE = re.compile(r"//[#@]\s*sourceMappingURL\s*=\s*(\S+)")


def vlq_decode(segment: str) -> list[int]:
    """Decode one base64-VLQ segment into its integer fields."""
    values, shift, cur = [], 0, 0
    for ch in segment:
        digit = _B64_IDX[ch]
        cur += (digit & 0x1F) << shift
        if digit & 0x20:
            shift += 5
        else:
            values.append(-(cur >> 1) if cur & 1 else cur >> 1)
            shift, cur = 0, 0
    return values


def parse_mappings(mappings: str, sources: list[str], names: list[str]) -> list[dict]:
    """Decode the ``mappings`` field into absolute tokens."""
    tokens = []
    src = line = col = name = 0
    for gen_line, group in enumerate(mappings.split(";")):
        gen_col = 0
        if not group:
            continue
        for seg in group.split(","):
            fields = vlq_decode(seg)
            if not fields:
                continue
            gen_col += fields[0]
            tok = {"gen_line": gen_line, "gen_col": gen_col}
            if len(fields) >= 4:
                src += fields[1]
                line += fields[2]
                col += fields[3]
                tok["src_file"] = sources[src] if 0 <= src < len(sources) else ""
                tok["src_line"] = line + 1  # 1-based output
                tok["src_col"] = col + 1
            if len(fields) >= 5:
                name += fields[4]
                tok["name"] = names[name] if 0 <= name < len(names) else ""
            tokens.append(tok)
    return tokens


def extract_sourcemap_url(source_text: str) -> str | None:
    """Last sourceMappingURL comment in the minified source (store.go:58-66)."""
    matches = MAPPING_URL_RE.findall(source_text)
    return matches[-1] if matches else None


def build_tokens(map_text: str) -> list[dict]:
    m = json.loads(map_text)
    return parse_mappings(
        m.get("mappings", ""), m.get("sources", []) or [], m.get("names", []) or []
    )


def build_token_table(entries: list[tuple[str, str, str]]) -> pa.Table:
    """entries: (url_base, build_uuid, map_json_text) -> sourcemap_tokens
    table rows (schemas.SOURCEMAP_TOKENS_SCHEMA)."""
    rows = {k: [] for k in (
        "url_base", "build_uuid", "min_line", "min_col",
        "src_file", "src_line", "src_col", "func_name",
    )}
    for url_base, uuid, map_text in entries:
        for t in build_tokens(map_text):
            rows["url_base"].append(url_base)
            rows["build_uuid"].append(uuid)
            rows["min_line"].append(t["gen_line"])
            rows["min_col"].append(t["gen_col"])
            rows["src_file"].append(t.get("src_file", ""))
            rows["src_line"].append(t.get("src_line", 0))
            rows["src_col"].append(t.get("src_col", 0))
            rows["func_name"].append(t.get("name", ""))
    return pa.table(rows)


def build_store_from_dir(directory: str) -> tuple[pa.Table, pa.Table]:
    """Scan a source-map store (the reference's store layout: ``{base}`` +
    ``{base}.map`` at the root, ``{uuid}/{base}`` for scoped maps) into
    (sourcemap_tokens, sourcemap_store) tables.

    ``directory`` may be a local path or an ``s3://`` / ``gs://`` /
    ``file://`` URI (the reference's three store backends,
    sourcemapprocessor/store.go:94-166) - resolved via store_fs/pyarrow.fs.
    """
    from pyarrow.fs import FileType

    from symspark.sources import store_fs

    filesystem, root = store_fs.resolve(directory)
    tokens_entries, store_rows = [], {"url_base": [], "build_uuid": [], "error": []}

    def handle(path: str, url_base: str, uuid: str) -> None:
        source = store_fs.read_text(filesystem, path)
        map_name = extract_sourcemap_url(source)
        if not map_name:
            store_rows["url_base"].append(url_base)
            store_rows["build_uuid"].append(uuid)
            store_rows["error"].append(
                f"failed to find source map location: {path}"
            )
            return
        map_path = "/".join([path.rsplit("/", 1)[0], map_name]) if "/" in path else map_name
        if not store_fs.exists(filesystem, map_path):
            store_rows["url_base"].append(url_base)
            store_rows["build_uuid"].append(uuid)
            store_rows["error"].append(f"failed to find source map: {map_path}")
            return
        tokens_entries.append((url_base, uuid, store_fs.read_text(filesystem, map_path)))
        store_rows["url_base"].append(url_base)
        store_rows["build_uuid"].append(uuid)
        store_rows["error"].append(None)

    for info in store_fs.list_dir(filesystem, root):
        entry = info.base_name
        if info.type == FileType.File and entry.endswith(".js"):
            handle(info.path, entry, "")
        elif info.type == FileType.Directory:
            for sub in store_fs.list_dir(filesystem, info.path):
                if sub.type == FileType.File and sub.base_name.endswith(".js"):
                    handle(sub.path, sub.base_name, entry)

    store = pa.table(
        store_rows,
        schema=pa.schema(
            [("url_base", pa.string()), ("build_uuid", pa.string()), ("error", pa.string())]
        ),
    )
    return build_token_table(tokens_entries), store
