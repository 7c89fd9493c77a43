"""Raw native debug ingest (S8 closing leg): ELF+DWARF compiled by the
host toolchain, a hand-built Mach-O 64 with an encoded DWARF v4 line
program, and the .dSYM-bundle -> range-table -> Spark lookup chain."""

import os
import shutil
import struct
import subprocess

import pytest

from symspark.sources import native_debug as nd

# ---------------------------------------------------------------------------
# Mach-O 64 fixture with a DWARF v4 .debug_line section (pure struct)
# ---------------------------------------------------------------------------

FIX_UUID = bytes(range(16))


def _uleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def make_debug_line_v4() -> bytes:
    """Two-row line program: alpha@0x1000 line 10, beta@0x1010 line 12,
    file src/demo.swift, sequence ends at 0x1020."""
    std_lens = bytes([0, 1, 1, 1, 1, 0, 0, 0, 1, 0, 0, 1])
    dirs = b"src\x00" + b"\x00"
    files = b"demo.swift\x00" + _uleb(1) + _uleb(0) + _uleb(0) + b"\x00"
    # min_inst, max_ops, default_is_stmt, line_base, line_range, opcode_base
    post_hdr = struct.pack("<BBBbBB", 1, 1, 1, -5, 14, 13) + std_lens + dirs + files
    program = (
        b"\x00" + _uleb(9) + b"\x02" + struct.pack("<Q", 0x1000)  # set_address
        + b"\x03" + _uleb(9)      # advance_line +9 -> 10
        + b"\x01"                  # copy
        + b"\x02" + _uleb(0x10)   # advance_pc
        + b"\x03" + _uleb(2)      # advance_line -> 12
        + b"\x01"                  # copy
        + b"\x02" + _uleb(0x10)   # advance_pc
        + b"\x00" + _uleb(1) + b"\x01"  # end_sequence
    )
    body = struct.pack("<H", 4) + struct.pack("<I", len(post_hdr)) + post_hdr + program
    return struct.pack("<I", len(body)) + body


def make_macho64() -> bytes:
    debug_line = make_debug_line_v4()
    strtab = b"\x00_alpha\x00_beta\x00"
    nlists = struct.pack("<IBBHQ", 1, 0x0E, 1, 0, 0x1000) + struct.pack(
        "<IBBHQ", 8, 0x0E, 1, 0, 0x1010
    )
    symoff = 240
    stroff = symoff + len(nlists)
    dloff = stroff + len(strtab)

    lc_uuid = struct.pack("<II", 0x1B, 24) + FIX_UUID
    lc_symtab = struct.pack("<IIIIII", 0x2, 24, symoff, 2, stroff, len(strtab))
    sect = (
        b"__debug_line".ljust(16, b"\x00")
        + b"__DWARF".ljust(16, b"\x00")
        + struct.pack("<QQ", 0, len(debug_line))
        + struct.pack("<IIIIIIII", dloff, 0, 0, 0, 0, 0, 0, 0)
    )
    lc_seg = (
        struct.pack("<II", 0x19, 72 + 80)
        + b"__DWARF".ljust(16, b"\x00")
        + struct.pack("<QQQQ", 0, 0, 0, 0)
        + struct.pack("<IIII", 7, 3, 1, 0)
        + sect
    )
    cmds = lc_uuid + lc_symtab + lc_seg
    header = struct.pack("<IIIIIIII", 0xFEEDFACF, 0x0100000C, 0, 0xA, 3, len(cmds), 0, 0)
    blob = header + cmds
    assert len(blob) <= symoff
    blob = blob.ljust(symoff, b"\x00") + nlists + strtab + debug_line
    return blob


def test_macho_fixture_rows():
    uuid, binary, rows = nd.native_to_rows(make_macho64(), "App")
    assert uuid == "00010203-0405-0607-0809-0a0b0c0d0e0f"
    assert binary == "App"
    r = {(x["sym_start_addr"], x["sym_end_addr"]): x["locs"][0] for x in rows}
    assert r[(0x1000, 0x100F)] == {
        "symbol": "alpha", "path": "src/demo.swift", "line": 10, "sym_addr": 0x1000
    }
    assert r[(0x1010, 0x101F)] == {
        "symbol": "beta", "path": "src/demo.swift", "line": 12, "sym_addr": 0x1010
    }


# ---------------------------------------------------------------------------
# real ELF + DWARF from the host toolchain (both v4 and v5 headers)
# ---------------------------------------------------------------------------

C_SRC = """\
#include <stdio.h>

int add_nums(int a, int b) {
    int c = a + b;
    return c * 2;
}

int main(void) {
    printf("%d\\n", add_nums(3, 4));
    return 0;
}
"""


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C toolchain")
@pytest.mark.parametrize("gflag", ["-gdwarf-4", "-gdwarf-5"])
def test_elf_dwarf_real_binary(tmp_path, gflag):
    src = tmp_path / "demo.c"
    src.write_text(C_SRC)
    exe = tmp_path / f"demo{gflag[-1]}"
    subprocess.run(
        ["gcc", gflag, "-O0", "-Wl,--build-id", str(src), "-o", str(exe)], check=True
    )
    uuid, _, rows = nd.native_to_rows(exe.read_bytes(), exe.name)
    assert len(uuid) == 36  # from .note.gnu.build-id
    by_sym: dict[str, set[int]] = {}
    for r in rows:
        loc = r["locs"][0]
        by_sym.setdefault(loc["symbol"], set()).add(loc["line"])
        if loc["symbol"] in ("add_nums", "main") and loc["line"]:
            assert loc["path"].endswith("demo.c")
    assert by_sym["add_nums"] == {3, 4, 5, 6}
    assert by_sym["main"] == {8, 9, 10, 11}

    # cross-check one in-function address against binutils when available
    if shutil.which("addr2line"):
        probe = next(
            r for r in rows if r["locs"][0]["symbol"] == "add_nums" and r["locs"][0]["line"] == 4
        )
        out = subprocess.run(
            ["addr2line", "-e", str(exe), "-f", hex(probe["sym_start_addr"])],
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()
        assert out[0] == "add_nums" and out[1].endswith("demo.c:4")


INL_SRC = """\
#include <stdio.h>

static inline __attribute__((always_inline)) int inner(int x) {
    volatile int y = x * 3;
    return y + 1;
}

static inline __attribute__((always_inline)) int outer(int x) {
    volatile int z = inner(x) + 5;
    return z * 2;
}

int main(int argc, char **argv) {
    int r = outer(argc + 6);
    printf("%d %s\\n", r, argv[0]);
    return 0;
}
"""


@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C toolchain")
@pytest.mark.parametrize("gflag", ["-gdwarf-4", "-gdwarf-5"])
def test_inline_chains_from_debug_info(tmp_path, gflag):
    """.debug_info inlined-subroutine chains: a 3-deep always_inline nest
    must resolve innermost-first with call-site attribution, matching
    binutils addr2line -i chain-for-chain at every multi-loc address."""
    src = tmp_path / "inl.c"
    src.write_text(INL_SRC)
    exe = tmp_path / f"inl{gflag[-1]}"
    subprocess.run(
        ["gcc", gflag, "-O2", "-Wl,--build-id", str(src), "-o", str(exe)], check=True
    )
    _, _, rows = nd.native_to_rows(exe.read_bytes(), exe.name)
    deep = [r for r in rows if len(r["locs"]) >= 3]
    assert deep, "always_inline x2 must produce 3-deep chains"
    chain = [(l["symbol"], l["line"]) for l in deep[0]["locs"]]
    assert [s for s, _ in chain] == ["inner", "outer", "main"]
    # innermost at the line row's position; callers at their call sites
    assert chain[1][1] == 9 and chain[2][1] == 14

    if shutil.which("addr2line"):
        for r in [x for x in rows if len(x["locs"]) > 1][:8]:
            addr = r["sym_start_addr"]
            out = subprocess.run(
                ["addr2line", "-e", str(exe), "-i", "-f", hex(addr)],
                capture_output=True, text=True, check=True,
            ).stdout.splitlines()
            ref = [
                (out[i], out[i + 1].rsplit(":", 1)[-1].split(" ")[0])
                for i in range(0, len(out), 2)
            ]
            mine = [(l["symbol"], str(l["line"])) for l in r["locs"]]
            assert mine == ref, f"@{hex(addr)}: {mine} != {ref}"


# ---------------------------------------------------------------------------
# .dSYM bundle -> store tables -> Spark range-table lookup (end to end)
# ---------------------------------------------------------------------------

def test_dsym_bundle_to_spark_range_lookup(spark, tmp_path):
    """The verdict's S8 'done' shape: start from a .dSYM-bundle-shaped
    input (not a pre-made .sym), ingest, and resolve addresses through the
    same range-dim the pipeline broadcast-joins."""
    import pyarrow.parquet as pq

    from symspark.operators.dsym import build_dsym_dims
    from symspark.schemas import DSYM_STORE_SCHEMA, DSYM_SYMBOLS_SCHEMA
    from symspark.sources.dsym_build import build_store_from_dir

    dwarf = tmp_path / "store" / "App.dSYM" / "Contents" / "Resources" / "DWARF"
    dwarf.mkdir(parents=True)
    (dwarf / "App").write_bytes(make_macho64())
    symbols, store = build_store_from_dir(str(tmp_path / "store"))
    assert store.to_pylist() == [
        {"build_uuid": "00010203-0405-0607-0809-0a0b0c0d0e0f", "binary_name": "App"}
    ]
    pq.write_table(symbols, str(tmp_path / "dsym_symbols.parquet"))
    pq.write_table(store, str(tmp_path / "dsym_store.parquet"))

    sym_df = spark.read.schema(DSYM_SYMBOLS_SCHEMA).parquet(str(tmp_path / "dsym_symbols.parquet"))
    store_df = spark.read.schema(DSYM_STORE_SCHEMA).parquet(str(tmp_path / "dsym_store.parquet"))
    ranges, store_dim = build_dsym_dims(sym_df, store_df)

    from pyspark.sql import functions as F

    hits = (
        ranges.select("ds_uuid", "ds_bin", F.explode("ds_ranges").alias("r"))
        .where(
            (F.lit(0x1015) >= F.col("r.sym_start_addr"))
            & (F.lit(0x1015) <= F.col("r.sym_end_addr"))
        )
        .select("ds_uuid", "ds_bin", "r.locs")
        .collect()
    )
    assert len(hits) == 1
    assert hits[0]["ds_uuid"] == "00010203-0405-0607-0809-0a0b0c0d0e0f"
    loc = hits[0]["locs"][0]
    assert (loc["symbol"], loc["path"], loc["line"]) == ("beta", "src/demo.swift", 12)
    assert store_dim.collect()[0]["dss_hit"] is True
