"""Native legacy .xls (BIFF8) reader + fixture writer — stdlib only.

Reference capability: XlsGenerator / Xls flattening generators
(modules/csv — the reference shells out to Apache POI). Both layers here
are implemented from the PUBLIC Microsoft format specifications:

- **[MS-CFB]** Compound File Binary: 512-byte header with a DIFAT, FAT
  sector chains, a directory of 128-byte entries, and a mini-FAT /
  mini-stream for streams under 4096 bytes.
- **[MS-XLS]** BIFF8 record stream inside the ``Workbook`` stream:
  workbook-globals substream (BOF, BOUNDSHEET, SST with CONTINUE
  splitting) followed by one substream per sheet (NUMBER, RK, MULRK,
  LABELSST, LABEL, BOOLERR, FORMULA + STRING cached results).

``make_xls`` writes a spec-valid file (including the mini-stream path for
small files and SST CONTINUE splitting) so the reader's every branch is
round-trip tested without any binary fixtures checked in.

Spreadsheets are config-scale data — parsing is driver-side by design,
exactly like the .xlsx reader (connectors.read_xlsx_rows).
"""

from __future__ import annotations

import struct

# --- [MS-CFB] sector constants ---------------------------------------------

_CFB_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FREESECT = 0xFFFFFFFF
_FATSECT = 0xFFFFFFFD
_MINI_CUTOFF = 4096
_SECTOR = 512
_MINISECTOR = 64


def _read_chain(data: bytes, fat: list[int], start: int, size: int, sector: int, base: int) -> bytes:
    """Follow a FAT chain from ``start``, concatenating sectors, truncated
    to ``size`` bytes. ``base`` is the offset of sector 0."""
    out = bytearray()
    sec = start
    guard = 0
    while sec not in (_ENDOFCHAIN, _FREESECT) and len(out) < size:
        off = base + sec * sector
        out += data[off : off + sector]
        if sec >= len(fat):
            break
        sec = fat[sec]
        guard += 1
        if guard > len(data) // sector + 2:
            raise ValueError("CFB FAT chain cycle")
    return bytes(out[:size])


def _cfb_open(data: bytes) -> dict[str, bytes]:
    """Parse a Compound File Binary and return {stream_name: bytes} for
    every stream entry (type 2), resolving mini-stream storage."""
    if len(data) < 512 or data[:8] != _CFB_SIG:
        raise ValueError("not a CFB (OLE2) file")
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sector = 1 << sector_shift
    minisector = 1 << mini_shift
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    # DIFAT: 109 entries in the header, then chained DIFAT sectors whose
    # last u32 points to the next DIFAT sector.
    difat = list(struct.unpack_from("<109I", data, 76))
    sec = difat_start
    for _ in range(n_difat):
        off = 512 + sec * sector
        entries = struct.unpack_from(f"<{sector // 4}I", data, off)
        difat += list(entries[:-1])
        sec = entries[-1]
        if sec in (_ENDOFCHAIN, _FREESECT):
            break
    fat_sectors = [s for s in difat if s not in (_FREESECT, _ENDOFCHAIN)][:n_fat]
    fat: list[int] = []
    for s in fat_sectors:
        off = 512 + s * sector
        fat += list(struct.unpack_from(f"<{sector // 4}I", data, off))

    # directory chain
    dir_size = len(data)  # upper bound; entries self-terminate
    dirdata = _read_chain(data, fat, dir_start, dir_size, sector, 512)
    entries = []
    for i in range(0, len(dirdata) - 127, 128):
        raw = dirdata[i : i + 128]
        name_len = struct.unpack_from("<H", raw, 64)[0]
        etype = raw[66]
        if etype == 0 or name_len == 0:
            continue
        name = raw[: max(0, name_len - 2)].decode("utf-16-le", errors="replace")
        start = struct.unpack_from("<I", raw, 116)[0]
        size = struct.unpack_from("<Q", raw, 120)[0]
        entries.append({"name": name, "type": etype, "start": start, "size": size})

    root = next(e for e in entries if e["type"] == 5)
    ministream = _read_chain(data, fat, root["start"], root["size"], sector, 512)
    minifat: list[int] = []
    if n_minifat:
        mf = _read_chain(data, fat, minifat_start, n_minifat * sector, sector, 512)
        minifat = list(struct.unpack_from(f"<{len(mf) // 4}I", mf, 0))

    streams: dict[str, bytes] = {}
    for e in entries:
        if e["type"] != 2:
            continue
        if e["size"] < _MINI_CUTOFF:
            streams[e["name"]] = _read_chain(
                ministream + b"\x00" * minisector,
                minifat,
                e["start"],
                e["size"],
                minisector,
                0,
            )
        else:
            streams[e["name"]] = _read_chain(data, fat, e["start"], e["size"], sector, 512)
    return streams


# --- BIFF8 record-stream reading -------------------------------------------

_REC_BOF = 0x0809
_REC_EOF = 0x000A
_REC_BOUNDSHEET = 0x0085
_REC_SST = 0x00FC
_REC_CONTINUE = 0x003C
_REC_LABELSST = 0x00FD
_REC_NUMBER = 0x0203
_REC_RK = 0x027E
_REC_MULRK = 0x00BD
_REC_LABEL = 0x0204
_REC_BOOLERR = 0x0205
_REC_FORMULA = 0x0006
_REC_STRING = 0x0207


def _records(stream: bytes, pos: int = 0):
    """Yield (record_id, payload, offset) from a BIFF stream."""
    n = len(stream)
    while pos + 4 <= n:
        rid, length = struct.unpack_from("<HH", stream, pos)
        if rid == 0:
            break
        yield rid, stream[pos + 4 : pos + 4 + length], pos
        pos += 4 + length


class _SstCursor:
    """Byte cursor over SST + CONTINUE payloads implementing [MS-XLS]
    string splitting: character data may break at a record boundary, in
    which case the continuation begins with a fresh option-flags byte
    (the compressed/utf-16 encoding may even CHANGE mid-string)."""

    def __init__(self, payloads: list[bytes]):
        self.payloads = payloads
        self.rec = 0
        self.pos = 0

    def _ensure(self) -> bool:
        while self.rec < len(self.payloads) and self.pos >= len(self.payloads[self.rec]):
            self.rec += 1
            self.pos = 0
        return self.rec < len(self.payloads)

    def read(self, n: int) -> bytes:
        """Read raw header bytes (may span a boundary WITHOUT a flags byte —
        headers are not supposed to split, but be liberal)."""
        out = bytearray()
        while len(out) < n and self._ensure():
            chunk = self.payloads[self.rec][self.pos : self.pos + n - len(out)]
            out += chunk
            self.pos += len(chunk)
        if len(out) < n:
            raise ValueError("SST truncated")
        return bytes(out)

    def read_chars(self, n_chars: int, high: bool) -> str:
        """Read ``n_chars`` characters honoring boundary flag restarts."""
        out: list[str] = []
        remaining = n_chars
        while remaining > 0:
            if not self._ensure():
                raise ValueError("SST character data truncated")
            avail = len(self.payloads[self.rec]) - self.pos
            if avail == 0:
                continue
            if out and self.pos == 0:
                # continuation of character data: fresh grbit byte
                high = bool(self.payloads[self.rec][0] & 0x01)
                self.pos = 1
                avail -= 1
                if avail == 0:
                    continue
            width = 2 if high else 1
            take = min(remaining, avail // width)
            if take == 0:
                # a single utf-16 char split across records is illegal per
                # spec; skip to next record defensively
                self.rec += 1
                self.pos = 0
                continue
            raw = self.payloads[self.rec][self.pos : self.pos + take * width]
            self.pos += take * width
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            remaining -= take
            if out and remaining > 0 and self.pos >= len(self.payloads[self.rec]):
                # next record starts with a grbit for the continued chars
                self.rec += 1
                self.pos = 0
                if self._ensure():
                    high = bool(self.payloads[self.rec][0] & 0x01)
                    self.pos = 1
        return "".join(out)


def _parse_sst(payloads: list[bytes]) -> list[str]:
    cur = _SstCursor(payloads)
    _total, unique = struct.unpack("<II", cur.read(8))
    out: list[str] = []
    for _ in range(unique):
        n_chars = struct.unpack("<H", cur.read(2))[0]
        flags = cur.read(1)[0]
        high = bool(flags & 0x01)
        rich = struct.unpack("<H", cur.read(2))[0] if flags & 0x08 else 0
        ext = struct.unpack("<I", cur.read(4))[0] if flags & 0x04 else 0
        out.append(cur.read_chars(n_chars, high))
        if rich:
            cur.read(4 * rich)
        if ext:
            cur.read(ext)
    return out


def _short_unistr(data: bytes, pos: int) -> tuple[str, int]:
    """BIFF8 short unicode string (u8 length) at pos -> (text, next_pos)."""
    n = data[pos]
    flags = data[pos + 1]
    if flags & 0x01:
        return data[pos + 2 : pos + 2 + 2 * n].decode("utf-16-le"), pos + 2 + 2 * n
    return data[pos + 2 : pos + 2 + n].decode("latin-1"), pos + 2 + n


def _unistr16(data: bytes, pos: int) -> tuple[str, int]:
    """BIFF8 unicode string with u16 length at pos -> (text, next_pos)."""
    n = struct.unpack_from("<H", data, pos)[0]
    flags = data[pos + 2]
    if flags & 0x01:
        return data[pos + 3 : pos + 3 + 2 * n].decode("utf-16-le"), pos + 3 + 2 * n
    return data[pos + 3 : pos + 3 + n].decode("latin-1"), pos + 3 + n


def _rk_value(rk: int):
    """Decode an RK number: bit0 = /100, bit1 = int, else high-30-bit
    IEEE double."""
    div100 = rk & 0x01
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend 30-bit
            v -= 0x40000000
        val = v
    else:
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if div100:
        val = val / 100
    return val


def read_xls_rows(path_or_bytes, sheet: int = 1) -> list[list]:
    """Read one sheet of a legacy binary .xls into a list of rows (None
    for gaps) — the same contract as ``read_xlsx_rows``. ``sheet`` is
    1-based. Pure stdlib: CFB container + BIFF8 records, no xlrd/POI."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    streams = _cfb_open(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("no Workbook stream in .xls file")

    # workbook globals: SST (+ CONTINUEs) and sheet offsets
    sst: list[str] = []
    sheet_offsets: list[int] = []
    pending_sst: list[bytes] = []
    for rid, payload, _off in _records(wb):
        if rid == _REC_SST:
            pending_sst = [payload]
        elif rid == _REC_CONTINUE and pending_sst:
            pending_sst.append(payload)
        else:
            if pending_sst:
                sst = _parse_sst(pending_sst)
                pending_sst = []
            if rid == _REC_BOUNDSHEET:
                sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
            elif rid == _REC_EOF:
                break
    if pending_sst:
        sst = _parse_sst(pending_sst)
    if not 1 <= sheet <= len(sheet_offsets):
        raise ValueError(f"sheet {sheet} out of range (1..{len(sheet_offsets)})")

    cells: dict[tuple[int, int], object] = {}
    pending_formula_cell: tuple[int, int] | None = None
    for rid, payload, _off in _records(wb, sheet_offsets[sheet - 1]):
        if rid == _REC_EOF:
            break
        if rid == _REC_NUMBER:
            r, c, _xf = struct.unpack_from("<HHH", payload, 0)
            (v,) = struct.unpack_from("<d", payload, 6)
            cells[(r, c)] = int(v) if float(v).is_integer() else v
        elif rid == _REC_RK:
            r, c, _xf, rk = struct.unpack_from("<HHHI", payload, 0)
            cells[(r, c)] = _rk_value(rk)
        elif rid == _REC_MULRK:
            r, c0 = struct.unpack_from("<HH", payload, 0)
            n_rk = (len(payload) - 6) // 6
            for i in range(n_rk):
                _xf, rk = struct.unpack_from("<HI", payload, 4 + 6 * i)
                cells[(r, c0 + i)] = _rk_value(rk)
        elif rid == _REC_LABELSST:
            r, c, _xf, isst = struct.unpack_from("<HHHI", payload, 0)
            cells[(r, c)] = sst[isst]
        elif rid == _REC_LABEL:
            r, c, _xf = struct.unpack_from("<HHH", payload, 0)
            cells[(r, c)], _ = _unistr16(payload, 6)
        elif rid == _REC_BOOLERR:
            r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", payload, 0)
            cells[(r, c)] = None if is_err else bool(val)
        elif rid == _REC_FORMULA:
            r, c, _xf = struct.unpack_from("<HHH", payload, 0)
            num = payload[6:14]
            if num[6:8] == b"\xff\xff":
                kind = num[0]
                if kind == 0:  # cached string follows in a STRING record
                    pending_formula_cell = (r, c)
                elif kind == 1:
                    cells[(r, c)] = bool(num[2])
                elif kind == 3:
                    cells[(r, c)] = ""
                # kind 2 (error) -> None (skip)
            else:
                (v,) = struct.unpack("<d", num)
                cells[(r, c)] = int(v) if float(v).is_integer() else v
        elif rid == _REC_STRING and pending_formula_cell is not None:
            cells[pending_formula_cell], _ = _unistr16(payload, 0)
            pending_formula_cell = None

    if not cells:
        return []
    max_r = max(r for r, _ in cells)
    max_c = max(c for _, c in cells)
    return [
        [cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)
    ]


# --- fixture writer (round-trip tests; spec-valid CFB + BIFF8) --------------


def _unistr16_bytes(s: str) -> bytes:
    enc = s.encode("latin-1", errors="ignore")
    return struct.pack("<HB", len(s), 0) + enc


def _record(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _build_sst(strings: list[str], max_payload: int = 64) -> bytes:
    """SST record (+ CONTINUEs) with deliberate small record capacity so
    round-trip tests exercise both split modes: between strings and inside
    a string's character run (continuation grbit)."""
    recs: list[bytearray] = [bytearray(struct.pack("<II", len(strings), len(strings)))]

    def room() -> int:
        return max_payload - len(recs[-1])

    for s in strings:
        enc = s.encode("latin-1")
        if room() < 4:
            recs.append(bytearray())
        recs[-1] += struct.pack("<HB", len(s), 0)
        i = 0
        while i < len(enc):
            if room() == 0:
                recs.append(bytearray(b"\x00"))  # continuation grbit (compressed)
            take = min(len(enc) - i, room())
            recs[-1] += enc[i : i + take]
            i += take
    out = _record(_REC_SST, bytes(recs[0]))
    for cont in recs[1:]:
        out += _record(_REC_CONTINUE, bytes(cont))
    return out


def _build_workbook_stream(rows: list[list], sheet_name: str = "Sheet1") -> bytes:
    """BIFF8 Workbook stream: globals (BOF, BOUNDSHEET, SST, EOF) + one
    worksheet substream. Cell encodings chosen to exercise the reader:
    ints -> RK, int runs -> MULRK, floats -> NUMBER, strings -> LABELSST,
    bools -> BOOLERR."""
    strings: list[str] = []
    sindex: dict[str, int] = {}
    for row in rows:
        for v in row:
            if isinstance(v, str) and v not in sindex:
                sindex[v] = len(strings)
                strings.append(v)

    sheet = bytearray()
    sheet += _record(_REC_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
    for r, row in enumerate(rows):
        c = 0
        while c < len(row):
            v = row[c]
            if v is None:
                c += 1
                continue
            if isinstance(v, bool):
                sheet += _record(_REC_BOOLERR, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                c += 1
            elif isinstance(v, str):
                sheet += _record(_REC_LABELSST, struct.pack("<HHHI", r, c, 0, sindex[v]))
                c += 1
            elif isinstance(v, int) and -(2**29) <= v < 2**29:
                run = [v]
                while (
                    c + len(run) < len(row)
                    and isinstance(row[c + len(run)], int)
                    and not isinstance(row[c + len(run)], bool)
                    and -(2**29) <= row[c + len(run)] < 2**29
                ):
                    run.append(row[c + len(run)])
                if len(run) >= 2:  # MULRK
                    body = struct.pack("<HH", r, c)
                    for x in run:
                        body += struct.pack("<HI", 0, ((x & 0x3FFFFFFF) << 2) | 0x02)
                    body += struct.pack("<H", c + len(run) - 1)
                    sheet += _record(_REC_MULRK, body)
                else:
                    sheet += _record(
                        _REC_RK, struct.pack("<HHHI", r, c, 0, ((v & 0x3FFFFFFF) << 2) | 0x02)
                    )
                c += len(run)
            else:
                sheet += _record(
                    _REC_NUMBER,
                    struct.pack("<HHH", r, c, 0) + struct.pack("<d", float(v)),
                )
                c += 1
    sheet += _record(_REC_EOF, b"")

    globals_part = bytearray()
    globals_part += _record(_REC_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
    name = sheet_name.encode("latin-1")
    bsheet_payload = struct.pack("<IHB", 0, 0, len(name)) + b"\x00" + name
    globals_part += _record(_REC_BOUNDSHEET, bsheet_payload)
    globals_part += _build_sst(strings)
    globals_part += _record(_REC_EOF, b"")

    # fix up the BOUNDSHEET absolute sheet-BOF offset
    sheet_off = len(globals_part)
    out = bytearray(globals_part) + sheet
    # BOUNDSHEET payload starts right after globals BOF record (4+16) + 4
    bs_pos = 4 + 16 + 4
    struct.pack_into("<I", out, bs_pos, sheet_off)
    return bytes(out)


def _cfb_wrap(stream_name: str, stream: bytes) -> bytes:
    """Wrap one stream into a minimal valid CFB: header, 1 FAT sector,
    1 directory sector, and either mini-stream storage (stream < 4096 —
    mini-FAT + mini-stream chained in the FAT) or regular sectors."""
    use_mini = len(stream) < _MINI_CUTOFF

    def pad(b: bytes, n: int) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    fat: list[int] = []
    sectors: list[bytes] = []

    def add_sector(data: bytes, next_val: int) -> int:
        sectors.append(pad(data, _SECTOR)[:_SECTOR])
        fat.append(next_val)
        return len(sectors) - 1

    # sector 0: FAT itself; 1: directory — filled in later
    add_sector(b"", _FATSECT)
    add_sector(b"", _ENDOFCHAIN)

    minifat_first = _ENDOFCHAIN
    n_minifat = 0
    if use_mini:
        mini = pad(stream, _MINISECTOR)
        n_mini = len(mini) // _MINISECTOR
        minifat_entries = [i + 1 for i in range(n_mini - 1)] + [_ENDOFCHAIN]
        mf_raw = b"".join(struct.pack("<I", x) for x in minifat_entries)
        minifat_first = add_sector(mf_raw, _ENDOFCHAIN)
        n_minifat = 1
        # mini-stream payload in regular sectors (chained)
        chunks = [mini[i : i + _SECTOR] for i in range(0, len(mini), _SECTOR)]
        first_mini_sec = len(sectors)
        for i, ch in enumerate(chunks):
            nxt = _ENDOFCHAIN if i == len(chunks) - 1 else len(sectors) + 1
            add_sector(ch, nxt)
        root_start, root_size = first_mini_sec, len(mini)
        stream_start = 0  # mini sector 0
    else:
        chunks = [stream[i : i + _SECTOR] for i in range(0, len(stream), _SECTOR)]
        stream_start = len(sectors)
        for i, ch in enumerate(chunks):
            nxt = _ENDOFCHAIN if i == len(chunks) - 1 else len(sectors) + 1
            add_sector(ch, nxt)
        root_start, root_size = _ENDOFCHAIN, 0

    def direntry(name: str, etype: int, start: int, size: int, child: int) -> bytes:
        raw = bytearray(128)
        enc = name.encode("utf-16-le")
        raw[: len(enc)] = enc
        struct.pack_into("<H", raw, 64, len(enc) + 2)
        raw[66] = etype
        raw[67] = 1  # black
        struct.pack_into("<I", raw, 68, _FREESECT)  # left
        struct.pack_into("<I", raw, 72, _FREESECT)  # right
        struct.pack_into("<I", raw, 76, child)
        struct.pack_into("<I", raw, 116, start)
        struct.pack_into("<Q", raw, 120, size)
        return bytes(raw)

    directory = (
        direntry("Root Entry", 5, root_start, root_size, 1)
        + direntry(stream_name, 2, stream_start, len(stream), _FREESECT)
        + b"\x00" * 256
    )
    sectors[1] = pad(directory, _SECTOR)[:_SECTOR]
    fat_raw = b"".join(struct.pack("<I", x) for x in fat)
    fat_raw = pad(fat_raw, _SECTOR)
    fat_raw = fat_raw[:_SECTOR].ljust(_SECTOR, b"\xff")
    # FREESECT fill for unused FAT entries
    fat_full = bytearray(b"\xff" * _SECTOR)
    fat_full[: len(fat) * 4] = b"".join(struct.pack("<I", x) for x in fat)
    sectors[0] = bytes(fat_full)

    header = bytearray(512)
    header[:8] = _CFB_SIG
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<I", header, 44, 1)  # FAT sector count
    struct.pack_into("<I", header, 48, 1)  # directory start sector
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60, minifat_first)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)


def make_xls(rows: list[list], sheet_name: str = "Sheet1") -> bytes:
    """A real, spec-valid legacy .xls file holding ``rows`` (values:
    str/int/float/bool/None). Small workbooks land in the CFB mini-stream,
    large ones in regular sectors — both reader paths stay exercised."""
    return _cfb_wrap("Workbook", _build_workbook_stream(rows, sheet_name))


def make_xlsx(rows: list[list], sheet_name: str = "Sheet1") -> bytes:
    """A minimal spec-valid .xlsx (ECMA-376 SpreadsheetML zip) for
    round-trip tests of read_xlsx_rows: inline strings, numbers and
    booleans with A1 anchors. Mirrors make_xls so BOTH spreadsheet
    readers earn driver-level round-trip evidence."""
    import io
    import zipfile

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(ord("A") + r) + out
        return out

    body = []
    for r, row in enumerate(rows, start=1):
        cells = []
        for c, v in enumerate(row):
            if v is None:
                continue
            ref = f"{col_ref(c)}{r}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                s = (
                    str(v)
                    .replace("&", "&amp;")
                    .replace("<", "&lt;")
                    .replace(">", "&gt;")
                )
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>')
        body.append(f'<row r="{r}">' + "".join(cells) + "</row>")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>' + "".join(body) + "</sheetData></worksheet>"
    )
    rel_ns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    workbook_xml = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{rel_ns}"><sheets>'
        f'<sheet name="{sheet_name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()
