"""Breakpad .sym ingest (S8): FUNC/LINE/PUBLIC ranges, inline chains,
MODULE uuid normalization, store-dir scan."""

from symspark.sources.dsym_build import build_store_from_dir, parse_breakpad_sym

SYM = """\
MODULE mac arm64 4C4C4408AAAA3333BBBB111122223333a MyApp
FILE 0 /src/MyFile.swift
FILE 1 /src/Inline.swift
INLINE_ORIGIN 0 inlined_helper
FUNC 1000 30 0 outer_func
INLINE 0 42 0 0 1010 8
1000 10 7 0
1010 8 3 1
1018 18 9 0
FUNC 2000 10 0 bare_func
PUBLIC 3000 0 _public_tail
"""


def test_module_uuid_and_line_ranges():
    uuid, binary, rows = parse_breakpad_sym(SYM)
    assert uuid == "4c4c4408-aaaa-3333-bbbb-111122223333"
    assert binary == "MyApp"
    r = {(x["sym_start_addr"], x["sym_end_addr"]): x for x in rows}
    # per-LINE-record ranges with the enclosing FUNC's symbol
    assert r[(0x1000, 0x100F)]["locs"] == [
        {"symbol": "outer_func", "path": "/src/MyFile.swift", "line": 7, "sym_addr": 0x1000}
    ]


def test_inline_chain_innermost_first():
    _, _, rows = parse_breakpad_sym(SYM)
    r = {(x["sym_start_addr"], x["sym_end_addr"]): x for x in rows}
    locs = r[(0x1010, 0x1017)]["locs"]
    assert [loc["symbol"] for loc in locs] == ["inlined_helper", "outer_func"]
    # innermost at the LINE record position, caller at the call site
    assert locs[0]["line"] == 3 and locs[0]["path"] == "/src/Inline.swift"
    assert locs[1]["line"] == 42 and locs[1]["path"] == "/src/MyFile.swift"


NESTED_SYM = """\
MODULE mac arm64 4C4C4408AAAA3333BBBB111122223333a MyApp
FILE 0 /src/F.swift
FILE 1 /src/Outer.swift
INLINE_ORIGIN 1 outer_inline
INLINE_ORIGIN 2 inner_inline
FUNC 4000 30 0 f
INLINE 0 10 0 1 4010 10
INLINE 1 20 1 2 4010 8
4010 8 99 1
"""


def test_nested_inline_depth_order():
    """Depth-1 INLINE is INNERMOST: chain must be [inner@LINE, outer@inner's
    call site, f@outer's call site] regardless of file order of the INLINE
    records (Breakpad nest level, advisor round-2 repro)."""
    _, _, rows = parse_breakpad_sym(NESTED_SYM)
    r = {(x["sym_start_addr"], x["sym_end_addr"]): x for x in rows}
    locs = r[(0x4010, 0x4017)]["locs"]
    assert [(l["symbol"], l["line"], l["path"]) for l in locs] == [
        ("inner_inline", 99, "/src/Outer.swift"),
        ("outer_inline", 20, "/src/Outer.swift"),
        ("f", 10, "/src/F.swift"),
    ]


def test_func_without_lines_and_public_tail():
    _, _, rows = parse_breakpad_sym(SYM)
    r = {(x["sym_start_addr"], x["sym_end_addr"]): x for x in rows}
    assert r[(0x2000, 0x200F)]["locs"][0] == {
        "symbol": "bare_func", "path": "", "line": 0, "sym_addr": 0x2000
    }
    tail = [x for x in rows if x["sym_start_addr"] == 0x3000]
    assert len(tail) == 1 and tail[0]["sym_end_addr"] == (1 << 63) - 1
    assert tail[0]["locs"][0]["symbol"] == "_public_tail"


def test_build_store_from_dir(tmp_path):
    (tmp_path / "app.sym").write_text(SYM)
    (tmp_path / "ignore.txt").write_text("x")
    symbols, store = build_store_from_dir(str(tmp_path))
    assert store.to_pylist() == [
        {"build_uuid": "4c4c4408-aaaa-3333-bbbb-111122223333", "binary_name": "MyApp"}
    ]
    assert symbols.num_rows == 5
    from symspark.schemas import DSYM_SYMBOLS_SCHEMA  # schema parity with the dim

    assert [f.name for f in symbols.schema] == [f.name for f in DSYM_SYMBOLS_SCHEMA.fields]
