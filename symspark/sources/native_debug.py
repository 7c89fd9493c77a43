"""Raw native debug-artifact ingestion (SURVEY.md §2.1 S8, closing leg).

The reference resolves dSYM addresses through the symbolic Rust FFI
(dsymprocessor/symbolicator.go:92-129); its real-DWARF test blob is elided
upstream.  ``dsym_build`` already ingests Breakpad ``.sym`` dumps — this
module removes the external ``dump_syms`` step for the common case: it
reads **raw Mach-O / ELF binaries** (including ``.dSYM`` bundle layouts,
``Foo.dSYM/Contents/Resources/DWARF/Foo``) with the stdlib only and emits
the SAME address-range dimension rows (DSYM_SYMBOLS_SCHEMA) the pipeline
broadcast-joins.

What is parsed, entirely from public format specs:
- **ELF64** little-endian: section headers, ``.symtab``/``.dynsym``
  function symbols, ``.note.gnu.build-id`` (first 16 bytes -> build uuid),
  ``.debug_line`` / ``.debug_str`` / ``.debug_line_str``.
- **Mach-O 64** (``0xfeedfacf``): load commands — ``LC_UUID``,
  ``LC_SYMTAB`` (nlist_64 symbols; sizes derived from the sorted
  next-symbol address, the classic nm convention), ``LC_SEGMENT_64``
  ``__DWARF``/``__TEXT`` sections (``__debug_line`` etc.).
- **DWARF line-number program, versions 2-5** (.debug_line): full state
  machine — special/standard/extended opcodes, v5 directory/file entry
  format descriptors (DW_FORM string / strp / line_strp / udata /
  data1-16), v2-4 include_directories / file_names tables.  Each emitted
  row covers [addr_i, addr_{i+1}-1] within an end_sequence-delimited
  range, exactly the per-instruction granularity ``atos`` reports.

Limits (documented, deliberate):
- inline chains need ``.debug_info`` DIE trees; raw ingest emits
  single-loc rows (the Breakpad ``.sym`` path carries full INLINE chains
  — dump_syms extracts those from .debug_info).  A line-table row's
  enclosing function comes from the symbol table.
- symbol names are kept as stored (mangled for C++); the reference's
  symbolic FFI demangles.  Demangling is orthogonal to range resolution
  and plugs in at ``_function_for``.
"""

from __future__ import annotations

import struct

_I64_MAX = (1 << 63) - 1


def _fmt_uuid(raw: bytes) -> str:
    h = raw[:16].hex()
    return "-".join([h[0:8], h[8:12], h[12:16], h[16:20], h[20:32]])


# ---------------------------------------------------------------------------
# container walks
# ---------------------------------------------------------------------------

class NativeImage:
    """Sections + function symbols + uuid of one ELF/Mach-O image."""

    def __init__(self) -> None:
        self.uuid: str = ""
        self.sections: dict[str, bytes] = {}  # canonical dwarf names
        self.symbols: list[tuple[int, int, str]] = []  # (addr, size, name)


_ELF_MAGIC = b"\x7fELF"
_MACHO64_MAGIC = 0xFEEDFACF


def is_native_image(data: bytes) -> bool:
    if data[:4] == _ELF_MAGIC:
        return True
    return len(data) >= 4 and struct.unpack("<I", data[:4])[0] == _MACHO64_MAGIC


def load_native(data: bytes) -> NativeImage:
    if data[:4] == _ELF_MAGIC:
        return _load_elf(data)
    if len(data) >= 4 and struct.unpack("<I", data[:4])[0] == _MACHO64_MAGIC:
        return _load_macho64(data)
    raise ValueError("not an ELF or 64-bit Mach-O image")


def _cstr(buf: bytes, off: int) -> str:
    end = buf.find(b"\x00", off)
    return buf[off : end if end >= 0 else len(buf)].decode("utf-8", "replace")


def _load_elf(data: bytes) -> NativeImage:
    img = NativeImage()
    if data[4] != 2 or data[5] != 1:
        raise ValueError("only 64-bit little-endian ELF is supported")
    e_shoff, = struct.unpack_from("<Q", data, 0x28)
    e_shentsize, e_shnum, e_shstrndx = struct.unpack_from("<HHH", data, 0x3A)

    shdrs = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        name, typ, flags, addr, offset, size, link, info, align, entsize = struct.unpack_from(
            "<IIQQQQIIQQ", data, off
        )
        shdrs.append((name, typ, offset, size, link, entsize))
    shstr_off, shstr_size = shdrs[e_shstrndx][2], shdrs[e_shstrndx][3]
    shstr = data[shstr_off : shstr_off + shstr_size]

    by_name = {}
    for name_off, typ, offset, size, link, entsize in shdrs:
        nm = _cstr(shstr, name_off)
        by_name[nm] = (typ, offset, size, link, entsize)
        if nm in (".debug_line", ".debug_str", ".debug_line_str"):
            img.sections[nm.lstrip(".")] = data[offset : offset + size]

    # GNU build-id note -> uuid (first 16 bytes of the digest)
    note = by_name.get(".note.gnu.build-id")
    if note:
        _, offset, size, _, _ = note
        namesz, descsz, _typ = struct.unpack_from("<III", data, offset)
        name_end = offset + 12 + ((namesz + 3) & ~3)
        img.uuid = _fmt_uuid(data[name_end : name_end + descsz])

    # function symbols from .symtab (fall back to .dynsym)
    for sect in (".symtab", ".dynsym"):
        ent = by_name.get(sect)
        if not ent:
            continue
        typ, offset, size, link, entsize = ent
        str_off, str_size = shdrs[link][2], shdrs[link][3]
        strtab = data[str_off : str_off + str_size]
        for off in range(offset, offset + size, entsize or 24):
            st_name, st_info, _other, _shndx, st_value, st_size = struct.unpack_from(
                "<IBBHQQ", data, off
            )
            if st_info & 0xF == 2 and st_value:  # STT_FUNC
                img.symbols.append((st_value, st_size, _cstr(strtab, st_name)))
        if img.symbols:
            break
    img.symbols.sort()
    return img


def _load_macho64(data: bytes) -> NativeImage:
    img = NativeImage()
    _magic, _cpu, _sub, _ftype, ncmds, _szcmds, _flags, _res = struct.unpack_from(
        "<IIIIIIII", data, 0
    )
    pos = 32
    symoff = nsyms = stroff = strsize = 0
    addrs: list[tuple[int, str]] = []
    for _ in range(ncmds):
        cmd, cmdsize = struct.unpack_from("<II", data, pos)
        if cmd == 0x1B:  # LC_UUID
            img.uuid = _fmt_uuid(data[pos + 8 : pos + 24])
        elif cmd == 0x2:  # LC_SYMTAB
            symoff, nsyms, stroff, strsize = struct.unpack_from("<IIII", data, pos + 8)
        elif cmd == 0x19:  # LC_SEGMENT_64
            nsects, = struct.unpack_from("<I", data, pos + 64)
            spos = pos + 72
            for _s in range(nsects):
                sectname = data[spos : spos + 16].rstrip(b"\x00").decode("ascii", "replace")
                s_addr, s_size = struct.unpack_from("<QQ", data, spos + 32)
                s_offset, = struct.unpack_from("<I", data, spos + 48)
                if sectname.startswith("__debug_"):
                    img.sections[sectname.lstrip("_")] = data[s_offset : s_offset + s_size]
                spos += 80
        pos += cmdsize

    if nsyms:
        strtab = data[stroff : stroff + strsize]
        for i in range(nsyms):
            n_strx, n_type, _sect, _desc, n_value = struct.unpack_from(
                "<IBBHQ", data, symoff + 16 * i
            )
            # defined non-debug section symbols only
            if n_type & 0xE0 == 0 and n_type & 0x0E == 0x0E:
                name = _cstr(strtab, n_strx)
                addrs.append((n_value, name.lstrip("_") if name.startswith("_") else name))
        addrs.sort()
        # Mach-O nlist carries no size: a symbol spans to the next one
        for i, (addr, name) in enumerate(addrs):
            end = addrs[i + 1][0] if i + 1 < len(addrs) else addr + 0x10000
            img.symbols.append((addr, end - addr, name))
    return img


# ---------------------------------------------------------------------------
# DWARF .debug_line state machine (v2-v5)
# ---------------------------------------------------------------------------

def _uleb(buf: bytes, pos: int) -> tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _sleb(buf: bytes, pos: int) -> tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            if b & 0x40:
                val -= 1 << shift
            return val, pos


# DW_FORM codes used by v5 directory/file entry descriptors
_FORM_FIXED = {0x0B: 1, 0x05: 2, 0x06: 4, 0x07: 8, 0x1E: 16}  # data1/2/4/8/16


def _read_form(buf: bytes, pos: int, form: int, offsz: int,
               debug_str: bytes, line_str: bytes):
    if form == 0x08:  # DW_FORM_string
        end = buf.find(b"\x00", pos)
        return buf[pos:end].decode("utf-8", "replace"), end + 1
    if form == 0x0E:  # DW_FORM_strp
        off = int.from_bytes(buf[pos : pos + offsz], "little")
        return _cstr(debug_str, off), pos + offsz
    if form == 0x1F:  # DW_FORM_line_strp
        off = int.from_bytes(buf[pos : pos + offsz], "little")
        return _cstr(line_str, off), pos + offsz
    if form == 0x0F:  # DW_FORM_udata
        return _uleb(buf, pos)
    if form in _FORM_FIXED:
        n = _FORM_FIXED[form]
        return int.from_bytes(buf[pos : pos + n], "little"), pos + n
    raise ValueError(f"unsupported DW_FORM 0x{form:x} in line header")


def decode_debug_line(
    debug_line: bytes, debug_str: bytes = b"", line_str: bytes = b""
) -> list[tuple[int, int, str, int]]:
    """Decode every unit of a .debug_line section.

    Returns rows (start_addr, end_addr_inclusive, file_path, line) — one
    per line-table row, ranged to the next row in its sequence.
    """
    out: list[tuple[int, int, str, int]] = []
    pos = 0
    n = len(debug_line)
    while pos + 4 <= n:
        unit_len = int.from_bytes(debug_line[pos : pos + 4], "little")
        offsz = 4
        upos = pos + 4
        if unit_len == 0xFFFFFFFF:  # 64-bit DWARF
            unit_len = int.from_bytes(debug_line[upos : upos + 8], "little")
            offsz = 8
            upos += 8
        unit_end = upos + unit_len
        version = int.from_bytes(debug_line[upos : upos + 2], "little")
        upos += 2
        if version < 2 or version > 5:
            pos = unit_end
            continue
        addr_size = 8
        if version >= 5:
            addr_size = debug_line[upos]
            upos += 2  # address_size, segment_selector_size
        header_len = int.from_bytes(debug_line[upos : upos + offsz], "little")
        upos += offsz
        program_start = upos + header_len

        min_inst = debug_line[upos]
        upos += 1
        if version >= 4:
            upos += 1  # maximum_operations_per_instruction
        default_is_stmt = debug_line[upos]
        upos += 1
        line_base = struct.unpack_from("<b", debug_line, upos)[0]
        upos += 1
        line_range = debug_line[upos]
        upos += 1
        opcode_base = debug_line[upos]
        upos += 1
        std_lens = list(debug_line[upos : upos + opcode_base - 1])
        upos += opcode_base - 1

        dirs: list[str] = []
        files: list[tuple[str, int]] = []  # (name, dir_index)
        if version >= 5:
            for target in (dirs, files):
                fmt_count = debug_line[upos]
                upos += 1
                fmts = []
                for _ in range(fmt_count):
                    ct, upos = _uleb(debug_line, upos)
                    form, upos = _uleb(debug_line, upos)
                    fmts.append((ct, form))
                count, upos = _uleb(debug_line, upos)
                for _ in range(count):
                    path, dir_idx = "", 0
                    for ct, form in fmts:
                        val, upos = _read_form(
                            debug_line, upos, form, offsz, debug_str, line_str
                        )
                        if ct == 1:  # DW_LNCT_path
                            path = val
                        elif ct == 2:  # DW_LNCT_directory_index
                            dir_idx = val
                    if target is dirs:
                        dirs.append(path)
                    else:
                        files.append((path, dir_idx))
        else:
            dirs.append("")  # dir 0 = compilation directory
            while debug_line[upos]:
                end = debug_line.find(b"\x00", upos)
                dirs.append(debug_line[upos:end].decode("utf-8", "replace"))
                upos = end + 1
            upos += 1
            files.append(("", 0))  # file numbering is 1-based pre-v5
            while debug_line[upos]:
                end = debug_line.find(b"\x00", upos)
                name = debug_line[upos:end].decode("utf-8", "replace")
                upos = end + 1
                dir_idx, upos = _uleb(debug_line, upos)
                _mtime, upos = _uleb(debug_line, upos)
                _flen, upos = _uleb(debug_line, upos)
                files.append((name, dir_idx))
            upos += 1

        def file_path(idx: int) -> str:
            if 0 <= idx < len(files):
                name, dir_idx = files[idx]
                d = dirs[dir_idx] if 0 <= dir_idx < len(dirs) else ""
                if d and not name.startswith("/"):
                    return f"{d}/{name}"
                return name
            return ""

        # run the program
        ppos = program_start
        addr, file_idx, line = 0, 1, 1
        seq: list[tuple[int, str, int]] = []

        def emit_row() -> None:
            seq.append((addr, file_path(file_idx), line))

        def flush_seq(end_addr: int) -> None:
            for i, (a, f, ln) in enumerate(seq):
                e = (seq[i + 1][0] if i + 1 < len(seq) else end_addr) - 1
                if e >= a:
                    out.append((a, e, f, ln))
            seq.clear()

        while ppos < unit_end:
            op = debug_line[ppos]
            ppos += 1
            if op >= opcode_base:  # special opcode
                adj = op - opcode_base
                addr += (adj // line_range) * min_inst
                line += line_base + (adj % line_range)
                emit_row()
            elif op == 0:  # extended
                ext_len, ppos = _uleb(debug_line, ppos)
                sub = debug_line[ppos]
                if sub == 1:  # DW_LNE_end_sequence
                    flush_seq(addr)
                    addr, file_idx, line = 0, 1, 1
                elif sub == 2:  # DW_LNE_set_address
                    addr = int.from_bytes(
                        debug_line[ppos + 1 : ppos + 1 + addr_size], "little"
                    )
                elif sub == 3 and version < 5:  # DW_LNE_define_file
                    dpos = ppos + 1
                    end = debug_line.find(b"\x00", dpos)
                    name = debug_line[dpos:end].decode("utf-8", "replace")
                    dpos = end + 1
                    dir_idx, dpos = _uleb(debug_line, dpos)
                    files.append((name, dir_idx))
                ppos += ext_len
            elif op == 1:  # DW_LNS_copy
                emit_row()
            elif op == 2:  # DW_LNS_advance_pc
                adv, ppos = _uleb(debug_line, ppos)
                addr += adv * min_inst
            elif op == 3:  # DW_LNS_advance_line
                d, ppos = _sleb(debug_line, ppos)
                line += d
            elif op == 4:  # DW_LNS_set_file
                file_idx, ppos = _uleb(debug_line, ppos)
            elif op == 5:  # DW_LNS_set_column
                _c, ppos = _uleb(debug_line, ppos)
            elif op == 8:  # DW_LNS_const_add_pc
                adj = 255 - opcode_base
                addr += (adj // line_range) * min_inst
            elif op == 9:  # DW_LNS_fixed_advance_pc
                addr += int.from_bytes(debug_line[ppos : ppos + 2], "little")
                ppos += 2
            else:  # negate_stmt / basic_block / prologue / epilogue / isa / vendor
                nargs = std_lens[op - 1] if op - 1 < len(std_lens) else 0
                for _ in range(nargs):
                    _v, ppos = _uleb(debug_line, ppos)
        pos = unit_end
    return out


# ---------------------------------------------------------------------------
# dimension-row assembly (same shape as dsym_build.parse_breakpad_sym)
# ---------------------------------------------------------------------------

def native_to_rows(data: bytes, binary_name: str) -> tuple[str, str, list[dict]]:
    """Parse one raw image -> (build_uuid, binary_name, DSYM dimension rows).

    Line-table rows carry (enclosing function symbol, file, line); address
    space not covered by the line table falls back to whole-symbol ranges
    with line 0 — together the same row shapes parse_breakpad_sym emits,
    minus inline chains (module docstring).
    """
    img = load_native(data)
    import bisect

    sym_starts = [s[0] for s in img.symbols]

    def function_for(addr: int) -> tuple[str, int] | None:
        i = bisect.bisect_right(sym_starts, addr) - 1
        if i >= 0:
            start, size, name = img.symbols[i]
            if size == 0 or addr < start + size:
                return name, start
        return None

    rows: list[dict] = []
    covered: dict[str, list[tuple[int, int]]] = {}
    line_rows = decode_debug_line(
        img.sections.get("debug_line", b""),
        img.sections.get("debug_str", b""),
        img.sections.get("debug_line_str", b""),
    )
    for start, end, path, line in line_rows:
        fn = function_for(start)
        if fn is None:
            continue
        name, sym_addr = fn
        rows.append(
            {
                "build_uuid": img.uuid,
                "binary_name": binary_name,
                "sym_start_addr": start,
                "sym_end_addr": end,
                "locs": [{"symbol": name, "path": path, "line": line, "sym_addr": sym_addr}],
            }
        )
        covered.setdefault(name, []).append((start, end))

    # symbols with no line coverage: whole-range row, line 0 (Breakpad's
    # FUNC-without-LINE shape)
    for addr, size, name in img.symbols:
        if name in covered or size == 0:
            continue
        rows.append(
            {
                "build_uuid": img.uuid,
                "binary_name": binary_name,
                "sym_start_addr": addr,
                "sym_end_addr": addr + size - 1,
                "locs": [{"symbol": name, "path": "", "line": 0, "sym_addr": addr}],
            }
        )
    return img.uuid, binary_name, rows
