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

- **DWARF .debug_info DIE walk** for INLINE CHAINS: abbreviation tables,
  the full DW_FORM set gcc/clang emit (incl. v5 strx*/addrx* indirection
  through .debug_str_offsets/.debug_addr and rnglistx), v4 .debug_ranges
  and v5 .debug_rnglists range lists, DW_TAG_inlined_subroutine nesting
  with DW_AT_call_file/call_line resolved through the CU's line-table
  file entries, names through abstract_origin/specification chains.
  Verified chain-for-chain against binutils ``addr2line -i`` on gcc
  -O2 -gdwarf-{4,5} binaries (3-deep always_inline chains).

Limits (documented, deliberate):
- symbol names are kept as stored (mangled for C++); the reference's
  symbolic FFI demangles.  Demangling is orthogonal to range resolution
  and plugs in where ``function_for`` resolves names.
- a CU whose DIEs use a form outside the implemented set degrades to
  line-table-only rows (no inline expansion) rather than failing ingest.
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
        if nm.startswith(".debug_"):
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


class _LineHeader:
    """Parsed .debug_line unit header: geometry + the file-index resolver
    (shared by the line-program executor and DW_AT_call_file lookups)."""

    __slots__ = (
        "offset", "version", "addr_size", "offsz", "program_start",
        "unit_end", "min_inst", "line_base", "line_range", "opcode_base",
        "std_lens", "dirs", "files",
    )

    def file_path(self, idx: int) -> str:
        if 0 <= idx < len(self.files):
            name, dir_idx = self.files[idx]
            d = self.dirs[dir_idx] if 0 <= dir_idx < len(self.dirs) else ""
            if d and not name.startswith("/"):
                return f"{d}/{name}"
            return name
        return ""


def _parse_line_header(
    debug_line: bytes, pos: int, debug_str: bytes, line_str: bytes
) -> _LineHeader | None:
    """Parse one unit header at ``pos``; None for unsupported versions
    (caller skips to unit_end, which is always set)."""
    h = _LineHeader()
    h.offset = pos
    unit_len = int.from_bytes(debug_line[pos : pos + 4], "little")
    offsz = 4
    upos = pos + 4
    if unit_len == 0xFFFFFFFF:  # 64-bit DWARF
        unit_len = int.from_bytes(debug_line[upos : upos + 8], "little")
        offsz = 8
        upos += 8
    h.offsz = offsz
    h.unit_end = upos + unit_len
    h.version = int.from_bytes(debug_line[upos : upos + 2], "little")
    upos += 2
    if h.version < 2 or h.version > 5:
        return None
    h.addr_size = 8
    if h.version >= 5:
        h.addr_size = debug_line[upos]
        upos += 2  # address_size, segment_selector_size
    header_len = int.from_bytes(debug_line[upos : upos + offsz], "little")
    upos += offsz
    h.program_start = upos + header_len

    h.min_inst = debug_line[upos]
    upos += 1
    if h.version >= 4:
        upos += 1  # maximum_operations_per_instruction
    upos += 1  # default_is_stmt
    h.line_base = struct.unpack_from("<b", debug_line, upos)[0]
    upos += 1
    h.line_range = debug_line[upos]
    upos += 1
    h.opcode_base = debug_line[upos]
    upos += 1
    h.std_lens = list(debug_line[upos : upos + h.opcode_base - 1])
    upos += h.opcode_base - 1

    dirs: list[str] = []
    files: list[tuple[str, int]] = []  # (name, dir_index)
    if h.version >= 5:
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
    h.dirs = dirs
    h.files = files
    return h


def line_file_tables(
    debug_line: bytes, debug_str: bytes = b"", line_str: bytes = b""
) -> dict[int, _LineHeader]:
    """Unit-offset -> parsed header, for DW_AT_call_file resolution."""
    out: dict[int, _LineHeader] = {}
    pos = 0
    while pos + 4 <= len(debug_line):
        try:
            h = _parse_line_header(debug_line, pos, debug_str, line_str)
        except (IndexError, struct.error):
            break
        if h is None:
            # unit_end is not recoverable without a header; bail out
            break
        out[pos] = h
        pos = h.unit_end
    return out


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
        h = _parse_line_header(debug_line, pos, debug_str, line_str)
        if h is None:
            # skip unsupported unit: recompute its end from the length field
            unit_len = int.from_bytes(debug_line[pos : pos + 4], "little")
            pos = pos + 4 + unit_len if unit_len != 0xFFFFFFFF else (
                pos + 12 + int.from_bytes(debug_line[pos + 4 : pos + 12], "little")
            )
            continue
        unit_end = h.unit_end
        version = h.version
        addr_size = h.addr_size
        program_start = h.program_start
        min_inst = h.min_inst
        line_base = h.line_base
        line_range = h.line_range
        opcode_base = h.opcode_base
        std_lens = h.std_lens
        files = h.files
        file_path = h.file_path

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
# DWARF .debug_info: inlined-subroutine chains (DWARF 4 & 5)
# ---------------------------------------------------------------------------

def _parse_abbrev(debug_abbrev: bytes, offset: int) -> dict:
    """One abbreviation table: code -> (tag, has_children, [(attr, form,
    implicit_const)])."""
    table: dict[int, tuple] = {}
    pos = offset
    while pos < len(debug_abbrev):
        code, pos = _uleb(debug_abbrev, pos)
        if code == 0:
            break
        tag, pos = _uleb(debug_abbrev, pos)
        has_children = debug_abbrev[pos]
        pos += 1
        attrs = []
        while True:
            attr, pos = _uleb(debug_abbrev, pos)
            form, pos = _uleb(debug_abbrev, pos)
            iconst = None
            if form == 0x21:  # DW_FORM_implicit_const
                iconst, pos = _sleb(debug_abbrev, pos)
            if attr == 0 and form == 0:
                break
            attrs.append((attr, form, iconst))
        table[code] = (tag, has_children, attrs)
    return table


class _InfoForm:
    """Reads/skips every DW_FORM a gcc/clang .debug_info can contain."""

    def __init__(self, sections: dict, addr_size: int, offsz: int):
        self.s = sections
        self.addr_size = addr_size
        self.offsz = offsz
        # per-CU bases (DW_AT_str_offsets_base / addr_base / rnglists_base)
        self.str_offsets_base = 8   # v5 default: right after the header
        self.addr_base = 8
        self.rnglists_base = 12

    def read(self, buf: bytes, pos: int, form: int, iconst):
        a, o = self.addr_size, self.offsz
        if form == 0x01:  # addr
            return int.from_bytes(buf[pos : pos + a], "little"), pos + a
        if form in (0x0B, 0x05, 0x06, 0x07):  # data1/2/4/8
            n = {0x0B: 1, 0x05: 2, 0x06: 4, 0x07: 8}[form]
            return int.from_bytes(buf[pos : pos + n], "little"), pos + n
        if form == 0x1E:  # data16
            return buf[pos : pos + 16], pos + 16
        if form == 0x0D:  # sdata
            return _sleb(buf, pos)
        if form == 0x0F:  # udata
            return _uleb(buf, pos)
        if form == 0x08:  # string
            end = buf.find(b"\x00", pos)
            return buf[pos:end].decode("utf-8", "replace"), end + 1
        if form == 0x0E:  # strp
            off = int.from_bytes(buf[pos : pos + o], "little")
            return _cstr(self.s.get("debug_str", b""), off), pos + o
        if form == 0x1F:  # line_strp
            off = int.from_bytes(buf[pos : pos + o], "little")
            return _cstr(self.s.get("debug_line_str", b""), off), pos + o
        if form in (0x1A, 0x25, 0x26, 0x27, 0x28):  # strx, strx1-4
            if form == 0x1A:
                idx, pos = _uleb(buf, pos)
            else:
                n = {0x25: 1, 0x26: 2, 0x27: 3, 0x28: 4}[form]
                idx = int.from_bytes(buf[pos : pos + n], "little")
                pos += n
            so = self.s.get("debug_str_offsets", b"")
            off = int.from_bytes(
                so[self.str_offsets_base + idx * o : self.str_offsets_base + (idx + 1) * o],
                "little",
            )
            return _cstr(self.s.get("debug_str", b""), off), pos
        if form in (0x1B, 0x29, 0x2A, 0x2B, 0x2C):  # addrx, addrx1-4
            if form == 0x1B:
                idx, pos = _uleb(buf, pos)
            else:
                n = {0x29: 1, 0x2A: 2, 0x2B: 3, 0x2C: 4}[form]
                idx = int.from_bytes(buf[pos : pos + n], "little")
                pos += n
            da = self.s.get("debug_addr", b"")
            return (
                int.from_bytes(
                    da[self.addr_base + idx * a : self.addr_base + (idx + 1) * a], "little"
                ),
                pos,
            )
        if form in (0x11, 0x12, 0x13, 0x14):  # ref1/2/4/8 (CU-relative)
            n = {0x11: 1, 0x12: 2, 0x13: 4, 0x14: 8}[form]
            return ("cu_ref", int.from_bytes(buf[pos : pos + n], "little")), pos + n
        if form == 0x15:  # ref_udata
            v, pos = _uleb(buf, pos)
            return ("cu_ref", v), pos
        if form == 0x10:  # ref_addr (section-relative)
            return (
                ("sec_ref", int.from_bytes(buf[pos : pos + o], "little")),
                pos + o,
            )
        if form == 0x20:  # ref_sig8
            return buf[pos : pos + 8], pos + 8
        if form == 0x17:  # sec_offset
            return int.from_bytes(buf[pos : pos + o], "little"), pos + o
        if form == 0x18:  # exprloc
            n, pos = _uleb(buf, pos)
            return buf[pos : pos + n], pos + n
        if form in (0x0A, 0x03, 0x04, 0x09):  # block1/2/4/block
            if form == 0x09:
                n, pos = _uleb(buf, pos)
            else:
                sz = {0x0A: 1, 0x03: 2, 0x04: 4}[form]
                n = int.from_bytes(buf[pos : pos + sz], "little")
                pos += sz
            return buf[pos : pos + n], pos + n
        if form == 0x0C:  # flag
            return buf[pos], pos + 1
        if form == 0x19:  # flag_present
            return 1, pos
        if form == 0x21:  # implicit_const
            return iconst, pos
        if form in (0x22, 0x23):  # loclistx / rnglistx
            v, pos = _uleb(buf, pos)
            return ("rnglistx", v) if form == 0x23 else v, pos
        if form == 0x16:  # indirect
            real, pos = _uleb(buf, pos)
            return self.read(buf, pos, real, None)
        if form in (0x1C, 0x24):  # ref_sup4 / ref_sup8
            n = 4 if form == 0x1C else 8
            return None, pos + n
        if form == 0x1D:  # strp_sup
            return None, pos + o
        raise ValueError(f"unsupported DW_FORM 0x{form:x}")


def _ranges_v4(debug_ranges: bytes, off: int, base: int) -> list[tuple[int, int]]:
    out = []
    pos = off
    while pos + 16 <= len(debug_ranges):
        lo, hi = struct.unpack_from("<QQ", debug_ranges, pos)
        pos += 16
        if lo == 0xFFFFFFFFFFFFFFFF:
            base = hi
            continue
        if lo == 0 and hi == 0:
            break
        if hi > lo:
            out.append((base + lo, base + hi))
    return out


def _ranges_v5(rnglists: bytes, off: int, base: int, forms: _InfoForm) -> list[tuple[int, int]]:
    out = []
    pos = off
    a = forms.addr_size
    da = forms.s.get("debug_addr", b"")

    def addrx(idx: int) -> int:
        p = forms.addr_base + idx * a
        return int.from_bytes(da[p : p + a], "little")

    while pos < len(rnglists):
        kind = rnglists[pos]
        pos += 1
        if kind == 0x00:  # end_of_list
            break
        if kind == 0x01:  # base_addressx
            idx, pos = _uleb(rnglists, pos)
            base = addrx(idx)
        elif kind == 0x02:  # startx_endx
            i1, pos = _uleb(rnglists, pos)
            i2, pos = _uleb(rnglists, pos)
            out.append((addrx(i1), addrx(i2)))
        elif kind == 0x03:  # startx_length
            i1, pos = _uleb(rnglists, pos)
            ln, pos = _uleb(rnglists, pos)
            s = addrx(i1)
            out.append((s, s + ln))
        elif kind == 0x04:  # offset_pair
            o1, pos = _uleb(rnglists, pos)
            o2, pos = _uleb(rnglists, pos)
            out.append((base + o1, base + o2))
        elif kind == 0x05:  # base_address
            base = int.from_bytes(rnglists[pos : pos + a], "little")
            pos += a
        elif kind == 0x06:  # start_end
            s = int.from_bytes(rnglists[pos : pos + a], "little")
            e = int.from_bytes(rnglists[pos + a : pos + 2 * a], "little")
            pos += 2 * a
            out.append((s, e))
        elif kind == 0x07:  # start_length
            s = int.from_bytes(rnglists[pos : pos + a], "little")
            pos += a
            ln, pos = _uleb(rnglists, pos)
            out.append((s, s + ln))
        else:
            break  # unknown encoding: stop this list
    return [(lo, hi) for lo, hi in out if hi > lo]


class InlineSite:
    __slots__ = ("ranges", "name", "call_path", "call_line", "depth")


def decode_inlines(sections: dict[str, bytes]) -> list[InlineSite]:
    """Walk every CU's DIE tree and return the inlined-subroutine sites:
    pc ranges + origin name + call site (file resolved through the CU's
    .debug_line file table) + nesting depth.  A CU with an unsupported
    form is skipped (the line-table rows still resolve, just without
    inline expansion for that CU)."""
    info = sections.get("debug_info", b"")
    abbrev = sections.get("debug_abbrev", b"")
    if not info or not abbrev:
        return []
    line_tables = line_file_tables(
        sections.get("debug_line", b""),
        sections.get("debug_str", b""),
        sections.get("debug_line_str", b""),
    )
    sites: list[InlineSite] = []
    pos = 0
    while pos + 4 <= len(info):
        try:
            sites.extend(_decode_cu(info, pos, abbrev, sections, line_tables))
        except (ValueError, IndexError, struct.error):
            pass
        unit_len = int.from_bytes(info[pos : pos + 4], "little")
        if unit_len == 0xFFFFFFFF:
            pos = pos + 12 + int.from_bytes(info[pos + 4 : pos + 12], "little")
        else:
            pos = pos + 4 + unit_len
        if unit_len == 0:
            break
    return sites


def _decode_cu(info, cu_off, abbrev, sections, line_tables) -> list[InlineSite]:
    offsz = 4
    pos = cu_off + 4
    unit_len = int.from_bytes(info[cu_off : cu_off + 4], "little")
    if unit_len == 0xFFFFFFFF:
        unit_len = int.from_bytes(info[pos : pos + 8], "little")
        offsz = 8
        pos += 8
    unit_end = pos + unit_len
    version = int.from_bytes(info[pos : pos + 2], "little")
    pos += 2
    if version < 2 or version > 5:
        return []
    if version >= 5:
        unit_type = info[pos]
        addr_size = info[pos + 1]
        abbrev_off = int.from_bytes(info[pos + 2 : pos + 2 + offsz], "little")
        pos += 2 + offsz
        if unit_type not in (0x01, 0x03):  # compile / partial unit only
            return []
    else:
        abbrev_off = int.from_bytes(info[pos : pos + offsz], "little")
        addr_size = info[pos + offsz]
        pos += offsz + 1

    table = _parse_abbrev(abbrev, abbrev_off)
    forms = _InfoForm(sections, addr_size, offsz)

    # pass 1: flat DIE scan — record per-DIE (tag, attrs-of-interest) and
    # tree depth so inline nesting and name chains resolve in pass 2
    dies: dict[int, dict] = {}
    order: list[tuple[int, int]] = []  # (offset, depth)
    depth = 0
    p = pos
    cu_low_pc = 0
    while p < unit_end and depth >= 0:
        die_off = p
        code, p = _uleb(info, p)
        if code == 0:
            depth -= 1
            continue
        if code not in table:
            raise ValueError("abbrev code out of table")
        tag, has_children, attrs = table[code]
        rec: dict = {"tag": tag}
        for attr, form, iconst in attrs:
            val, p = forms.read(info, p, form, iconst)
            if attr == 0x03:  # name
                rec["name"] = val
            elif attr == 0x6E:  # linkage_name
                rec.setdefault("name", val)
            elif attr == 0x11:  # low_pc
                rec["low_pc"] = val
            elif attr == 0x12:  # high_pc (addr or size)
                rec["high_pc"] = val
                rec["high_pc_is_addr"] = form == 0x01
            elif attr == 0x55:  # ranges
                rec["ranges"] = val
            elif attr == 0x58:
                rec["call_file"] = val
            elif attr == 0x59:
                rec["call_line"] = val
            elif attr in (0x31, 0x47):  # abstract_origin / specification
                rec["origin"] = val
            elif attr == 0x10:  # stmt_list
                rec["stmt_list"] = val
            elif attr == 0x72:
                forms.str_offsets_base = val
            elif attr == 0x73:
                forms.addr_base = val
            elif attr == 0x74:
                forms.rnglists_base = val
        if tag == 0x11:  # compile_unit
            cu_low_pc = rec.get("low_pc", 0) or 0
        dies[die_off - cu_off] = rec
        order.append((die_off - cu_off, depth))
        if has_children:
            depth += 1

    cu_rec = dies.get(order[0][0], {}) if order else {}
    lt = line_tables.get(cu_rec.get("stmt_list", -1))

    def resolve_name(rec: dict, hops: int = 0) -> str:
        if "name" in rec:
            return rec["name"]
        org = rec.get("origin")
        if org is not None and hops < 8:
            kind, off = org if isinstance(org, tuple) else ("cu_ref", org)
            tgt = dies.get(off if kind == "cu_ref" else off - cu_off)
            if tgt is not None:
                return resolve_name(tgt, hops + 1)
        return "?"

    def die_ranges(rec: dict) -> list[tuple[int, int]]:
        if "ranges" in rec:
            r = rec["ranges"]
            if isinstance(r, tuple) and r[0] == "rnglistx":
                rl = sections.get("debug_rnglists", b"")
                tbl = forms.rnglists_base
                off = tbl + int.from_bytes(
                    rl[tbl + r[1] * offsz : tbl + (r[1] + 1) * offsz], "little"
                )
                return _ranges_v5(rl, off, cu_low_pc, forms)
            if version >= 5:
                return _ranges_v5(
                    sections.get("debug_rnglists", b""), r, cu_low_pc, forms
                )
            return _ranges_v4(sections.get("debug_ranges", b""), r, cu_low_pc)
        lo = rec.get("low_pc")
        if lo is None:
            return []
        hi = rec.get("high_pc")
        if hi is None:
            return []
        if not rec.get("high_pc_is_addr", False):
            hi = lo + hi
        return [(lo, hi)] if hi > lo else []

    # pass 2: emit inline sites with nesting depth relative to the
    # innermost enclosing subprogram/inline
    out: list[InlineSite] = []
    inline_stack: list[int] = []  # depths of enclosing inlined_subroutines
    for off, d in order:
        while inline_stack and d <= inline_stack[-1]:
            inline_stack.pop()
        rec = dies[off]
        if rec["tag"] == 0x1D:  # inlined_subroutine
            site = InlineSite()
            site.ranges = die_ranges(rec)
            site.name = resolve_name(rec)
            site.call_line = rec.get("call_line", 0) or 0
            cf = rec.get("call_file")
            site.call_path = lt.file_path(cf) if (lt and cf is not None) else ""
            site.depth = len(inline_stack)
            if site.ranges:
                out.append(site)
            inline_stack.append(d)
    return out


# ---------------------------------------------------------------------------
# dimension-row assembly (same shape as dsym_build.parse_breakpad_sym)
# ---------------------------------------------------------------------------

def native_to_rows(data: bytes, binary_name: str) -> tuple[str, str, list[dict]]:
    """Parse one raw image -> (build_uuid, binary_name, DSYM dimension rows).

    Line-table rows carry (enclosing function symbol, file, line) plus the
    full INLINE CHAIN from .debug_info (innermost origin at the row's
    line/file, each caller at its call site — the same loc ordering
    parse_breakpad_sym builds from Breakpad INLINE records and the
    reference resolves via symbolic, dsymprocessor/symbolicator.go:109-129).
    Address space not covered by the line table falls back to whole-symbol
    ranges with line 0.
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

    inline_sites = decode_inlines(img.sections)

    def inline_chain(addr: int) -> list[InlineSite]:
        """Sites covering addr, INNERMOST (deepest nesting) first."""
        hits = [
            s for s in inline_sites
            if any(lo <= addr < hi for lo, hi in s.ranges)
        ]
        hits.sort(key=lambda s: -s.depth)
        return hits

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
        locs = []
        inner_line, inner_path = line, path
        for site in inline_chain(start):
            locs.append(
                {"symbol": site.name, "path": inner_path, "line": inner_line,
                 "sym_addr": sym_addr}
            )
            inner_line, inner_path = site.call_line, site.call_path
        locs.append(
            {"symbol": name, "path": inner_path, "line": inner_line, "sym_addr": sym_addr}
        )
        rows.append(
            {
                "build_uuid": img.uuid,
                "binary_name": binary_name,
                "sym_start_addr": start,
                "sym_end_addr": end,
                "locs": locs,
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
