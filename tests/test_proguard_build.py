"""Offline ProGuard mapping.txt builder tests.

Covers the public R8/ProGuard format features (class renames, sourceFile
metadata comments, inline chains, parallel/constant/identity line ranges,
line-less methods) and roundtrips the datagen fixture: rendering the
synthesized mapping rows as a mapping.txt and parsing it back must
reproduce the rows the pipeline consumes.
"""

import pyarrow as pa

from symspark.sources import datagen
from symspark.sources.proguard_build import (
    MAX_UINT32,
    build_store_from_dir,
    parse_mapping_text,
    rows_to_table,
)

SAMPLE = """\
com.example.MainActivity -> a.b.c:
# {"id":"sourceFile","fileName":"MainActivity.kt"}
    int fieldOne -> a
    1:3:void com.example.Util.helper(int):10:12 -> m
    1:3:void onCreate(android.os.Bundle):25 -> m
    4:4:int compute():98:98 -> m
    void plainMethod() -> n
com.example.Util -> d:
# {"id":"sourceFile","fileName":"Util.kt"}
    7:9:void helper(int):10:12 -> h
"""


def test_inline_chain_order_and_parallel_range():
    rows = parse_mapping_text("u1", SAMPLE)
    by_key = {}
    for r in rows:
        by_key.setdefault((r["obf_class"], r["obf_method"]), []).append(r)

    # the 1:3 chain is a parallel range -> expanded per obfuscated line
    chain_rows = sorted(
        (r for r in by_key[("a.b.c", "m")] if r["line_start"] <= 3),
        key=lambda r: r["line_start"],
    )
    assert [(r["line_start"], r["line_end"]) for r in chain_rows] == [(1, 1), (2, 2), (3, 3)]
    r2 = chain_rows[1]  # obfuscated line 2
    assert r2["mapped"] == [
        # innermost inlined callee first (file order), caller last
        {
            "class_name": "com.example.Util",
            "method_name": "helper",
            "source_file": "Util.kt",  # from the Util class's sourceFile comment
            "line_number": 11,  # 10 + (2 - 1)
        },
        {
            "class_name": "com.example.MainActivity",
            "method_name": "onCreate",
            "source_file": "MainActivity.kt",
            "line_number": 25,  # constant: no origEnd
        },
    ]


def test_constant_range_stays_one_row():
    rows = parse_mapping_text("u1", SAMPLE)
    const = [r for r in rows if r["obf_class"] == "a.b.c" and r["line_start"] == 4]
    assert len(const) == 1
    assert const[0]["mapped"] == [
        {
            "class_name": "com.example.MainActivity",
            "method_name": "compute",
            "source_file": "MainActivity.kt",
            "line_number": 98,
        }
    ]


def test_lineless_method_full_range():
    rows = parse_mapping_text("u1", SAMPLE)
    nl = [r for r in rows if r["obf_method"] == "n"]
    assert len(nl) == 1
    assert (nl[0]["line_start"], nl[0]["line_end"]) == (-2, MAX_UINT32)
    assert nl[0]["mapped"][0]["method_name"] == "plainMethod"


def test_source_file_fallback_simple_name():
    text = "x.y.Thing -> z:\n    1:1:void go():5:5 -> g\n"
    rows = parse_mapping_text("u", text)
    assert rows[0]["mapped"][0]["source_file"] == "Thing.java"


def _render_mapping_txt(uuid: str) -> tuple[str, list[dict]]:
    """Render the datagen fixture rows for one uuid as a mapping.txt,
    returning (text, expected_rows).  Zero-mapped ranges are absent from a
    real mapping file by definition (no mapping == keep-original)."""
    tbl = datagen.gen_proguard_mapping().to_pylist()
    mine = [r for r in tbl if r["proguard_uuid"] == uuid]
    classes: dict[str, list[str]] = {}
    deob_classes = set()
    for r in mine:
        if not r["mapped"]:
            continue
        lines = classes.setdefault(r["obf_class"], [])
        for m in r["mapped"]:
            deob_classes.add(m["class_name"])
            lines.append(
                f"    {r['line_start']}:{r['line_end']}:void "
                f"{m['class_name']}.{m['method_name']}():{m['line_number']} "
                f"-> {r['obf_method']}"
            )
    out = []
    for cls in sorted(deob_classes):
        out.append(f"{cls} -> {cls}_obf:")
        out.append('# {"id":"sourceFile","fileName":"Source.java"}')
    for obf_cls, lines in classes.items():
        out.append(f"com.example.{obf_cls.capitalize()} -> {obf_cls}:")
        out.extend(lines)
    expected = [r for r in mine if r["mapped"]]
    return "\n".join(out) + "\n", expected


def test_datagen_roundtrip():
    uuid = list(datagen.PG_UUIDS)[0]
    text, expected = _render_mapping_txt(uuid)
    got = parse_mapping_text(uuid, text)
    key = lambda r: (r["obf_class"], r["obf_method"], r["line_start"])  # noqa: E731
    got_sorted, exp_sorted = sorted(got, key=key), sorted(expected, key=key)
    assert len(got_sorted) == len(exp_sorted)
    for g, e in zip(got_sorted, exp_sorted):
        assert g == e, f"\ngot  {g}\nwant {e}"


def test_build_store_from_dir(tmp_path):
    (tmp_path / "uuid-1.txt").write_text(SAMPLE)
    (tmp_path / "uuid-2.txt").write_text("a.B -> b:\n    1:1:void f():9:9 -> g\n")
    (tmp_path / "notes.md").write_text("ignored")
    mapping, store = build_store_from_dir(str(tmp_path))
    assert store.column("proguard_uuid").to_pylist() == ["uuid-1", "uuid-2"]
    assert set(mapping.column("proguard_uuid").to_pylist()) == {"uuid-1", "uuid-2"}
    assert mapping.schema.equals(rows_to_table(parse_mapping_text("x", SAMPLE)).schema)
