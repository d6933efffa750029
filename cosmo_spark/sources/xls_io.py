"""Minimal legacy .xls (BIFF8) codec — stdlib-only (struct over bytes).

The reference's telemetry mnemonic sheet is a legacy binary workbook
(``cosmo/telemetry_support/COSMnemonics.xls``, read via ``pd.read_excel``
at cosmo/monitors/telemetry_monitors.py:84 — which needs xlrd).  A .xls
file is an OLE2/CFB compound file (published spec: MS-CFB) whose
"Workbook" stream is a sequence of BIFF8 records (published spec: MS-XLS).
The subset a lookup sheet uses — SST shared strings (with CONTINUE
spill-over), LABELSST / LABEL text cells, NUMBER / RK / MULRK numeric
cells — parses in a couple hundred lines, so the engine ingests the
reference's actual input file rather than demanding a pre-conversion.

Same contract as the sibling ``xlsx_io``: ``read_xls`` returns dense rows
of optional strings (numbers in lexical form, integers without a trailing
``.0`` — matching the XML reader, where ``<v>3</v>`` arrives as "3");
``write_xls`` exists for test fixtures and emits the spec layout real
Excel produces (ministream + miniFAT below the 4096-byte cutoff, regular
FAT chains above), so both reader paths are exercised hermetically.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_END = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


# --------------------------------------------------------------------------- #
# CFB container                                                               #
# --------------------------------------------------------------------------- #


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _chain(fat: list[int], start: int) -> list[int]:
    out, s, seen = [], start, set()
    while s not in (_END, _FREE):
        if s in seen or s >= len(fat):
            raise ValueError("corrupt CFB: sector chain loop or overrun")
        seen.add(s)
        out.append(s)
        s = fat[s]
    return out


def read_cfb_stream(data: bytes, name: str) -> bytes:
    """Extract the named stream from a CFB compound file."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2/CFB file (bad magic)")
    sect_shift = _u16(data, 30)
    mini_shift = _u16(data, 32)
    ssz, msz = 1 << sect_shift, 1 << mini_shift
    first_dir = _u32(data, 48)
    mini_cutoff = _u32(data, 56)
    first_minifat = _u32(data, 60)
    n_difat = _u32(data, 72)
    first_difat = _u32(data, 68)

    def sector(i: int) -> bytes:
        # sector #0 begins at one full sector size into the file (the
        # 512-byte header occupies the rest of that first sector) — for
        # v3 (512 B sectors) this is byte 512, for v4 (4096 B) byte 4096
        off = (i + 1) * ssz
        return data[off:off + ssz]

    # FAT sector list: 109 header DIFAT slots, then chained DIFAT sectors
    fat_sectors = [
        _u32(data, 76 + 4 * i) for i in range(109)
        if _u32(data, 76 + 4 * i) not in (_FREE, _END)
    ]
    ds = first_difat
    for _ in range(n_difat):
        if ds in (_END, _FREE):
            break
        blk = sector(ds)
        fat_sectors += [
            _u32(blk, 4 * i) for i in range(ssz // 4 - 1)
            if _u32(blk, 4 * i) not in (_FREE, _END)
        ]
        ds = _u32(blk, ssz - 4)
    fat: list[int] = []
    for fs in fat_sectors:
        blk = sector(fs)
        fat += [_u32(blk, 4 * i) for i in range(ssz // 4)]

    # directory: 128-byte entries; name is utf-16le with byte length @64
    dir_bytes = b"".join(sector(s) for s in _chain(fat, first_dir))
    entries = []
    for off in range(0, len(dir_bytes), 128):
        e = dir_bytes[off:off + 128]
        if len(e) < 128 or e[66] == 0:  # type 0 = unused
            continue
        nlen = _u16(e, 64)
        ename = e[: max(0, nlen - 2)].decode("utf-16-le", "ignore")
        entries.append(
            (ename, e[66], _u32(e, 116), _u32(e, 120))  # name, type, start, size
        )
    root = next(e for e in entries if e[1] == 5)
    target = next((e for e in entries if e[0] == name), None)
    if target is None:
        raise ValueError(f"stream {name!r} not found in CFB directory")
    _, _, start, size = target

    if size < mini_cutoff:
        # ministream (root entry's stream) sliced by the miniFAT chain
        mini_data = b"".join(sector(s) for s in _chain(fat, root[2]))[: root[3]]
        minifat: list[int] = []
        if first_minifat not in (_END, _FREE):
            for s in _chain(fat, first_minifat):
                blk = sector(s)
                minifat += [_u32(blk, 4 * i) for i in range(ssz // 4)]
        out = b"".join(
            mini_data[s * msz:(s + 1) * msz] for s in _chain(minifat, start)
        )
    else:
        out = b"".join(sector(s) for s in _chain(fat, start))
    return out[:size]


# --------------------------------------------------------------------------- #
# BIFF8 records                                                               #
# --------------------------------------------------------------------------- #

_BOF, _EOF, _CONTINUE = 0x0809, 0x000A, 0x003C
_SST, _LABELSST, _LABEL = 0x00FC, 0x00FD, 0x0204
_NUMBER, _RK, _MULRK = 0x0203, 0x027E, 0x00BD


def _records(stream: bytes):
    off = 0
    while off + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, off)
        yield rid, stream[off + 4:off + 4 + ln]
        off += 4 + ln


class _SSTCursor:
    """Reader over the SST record's data plus its CONTINUE fragments.

    Fixed-width fields never split across fragments (spec guarantee), but
    character arrays do — and each fragment that continues a split string
    restarts with a fresh compression-flag byte, which is the one genuinely
    tricky part of BIFF8 string parsing."""

    def __init__(self, frags: list[bytes]):
        self.frags, self.fi, self.off = frags, 0, 0

    def _left(self) -> int:
        return len(self.frags[self.fi]) - self.off

    def _advance(self) -> None:
        while self.fi < len(self.frags) - 1 and self._left() == 0:
            self.fi += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            self._advance()
            take = min(n, self._left())
            if take == 0:
                raise ValueError("corrupt SST: ran off the record")
            out += self.frags[self.fi][self.off:self.off + take]
            self.off += take
            n -= take
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        c_run = struct.unpack("<H", self.read(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<i", self.read(4))[0] if flags & 0x04 else 0
        high = flags & 0x01
        chars: list[str] = []
        need = cch
        # a CONTINUE fragment that carries a split string's characters
        # restarts with a fresh flag byte — INCLUDING when the split falls
        # exactly between the header and the first character, so the
        # trigger is "we crossed into a fragment the header wasn't read
        # in", not "some chars were already consumed"
        header_fi = self.fi
        while need > 0:
            self._advance()
            if self._left() == 0:
                raise ValueError("corrupt SST: string ran off the record")
            if self.off == 0 and self.fi != header_fi:
                header_fi = self.fi  # consume ITS flag byte exactly once
                high = self.read(1)[0] & 0x01
                continue  # re-advance in case the flag ended the fragment
            width = 2 if high else 1
            take = min(need, self._left() // width)
            if take == 0:
                # an odd dangling byte cannot hold a 2-byte character and
                # per spec characters never split — corrupt, not a spin
                raise ValueError("corrupt SST: split mid-character")
            raw = self.read(take * width)
            chars.append(
                raw.decode("utf-16-le") if high else raw.decode("latin-1")
            )
            need -= take
        self.read(c_run * 4 + max(0, cb_ext))  # rich runs / ext — skipped
        return "".join(chars)


def _decode_rk(rk: int) -> float:
    cent, int_flag = rk & 1, rk & 2
    if int_flag:
        v = float(rk >> 2 if rk >> 2 < (1 << 29) else (rk >> 2) - (1 << 30))
    else:
        v = struct.unpack("<d", struct.pack("<I", 0) + struct.pack("<I", rk & ~3))[0]
    return v / 100.0 if cent else v


def _lex(x: float) -> str:
    """Lexical number form matching the xlsx reader (3 not 3.0)."""
    return str(int(x)) if x == int(x) and abs(x) < 1e15 else repr(x)


def read_xls(path: str, sheet: int = 1) -> list[list[str | None]]:
    """Parse worksheet ``sheet`` (1-based) into dense rows (None for gaps)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        stream = read_cfb_stream(data, "Workbook")
    except ValueError:
        stream = read_cfb_stream(data, "Book")  # BIFF5-era stream name

    shared: list[str] = []
    cells: dict[tuple[int, int], str | None] = {}
    substream = 0          # 1 = workbook globals, 2 = first worksheet, ...
    depth = 0              # BOF/EOF nesting; >1 = embedded object substream
    sst_frags: list[bytes] | None = None

    def _flush_sst() -> None:
        nonlocal sst_frags
        if sst_frags is None:
            return
        cur = _SSTCursor(sst_frags)
        cur.read(4)  # cstTotal
        n_unique = struct.unpack("<I", cur.read(4))[0]
        for _ in range(n_unique):
            shared.append(cur.read_string())
        sst_frags = None

    for rid, body in _records(stream):
        if rid == _SST:
            sst_frags = [body]
            continue
        if rid == _CONTINUE and sst_frags is not None:
            sst_frags.append(body)
            continue
        _flush_sst()
        if rid == _BOF:
            # an embedded chart/VBA object opens a NESTED BOF/EOF inside a
            # worksheet substream (MS-XLS 2.1.7.20) — only top-level BOFs
            # advance the sheet counter, and nested records must never be
            # parsed as sheet cells (ADVICE r5: the flat counter truncated
            # rows mid-sheet)
            depth += 1
            if depth == 1:
                substream += 1
        elif rid == _EOF:
            depth = max(0, depth - 1)
            if depth == 0 and substream > sheet:
                break
        elif depth == 1 and substream == sheet + 1:  # globals substream is #1
            if rid == _LABELSST:
                r, c, _, isst = struct.unpack_from("<HHHI", body)
                cells[(r, c)] = shared[isst] if isst < len(shared) else None
            elif rid == _NUMBER:
                r, c, _ = struct.unpack_from("<HHH", body)
                cells[(r, c)] = _lex(struct.unpack_from("<d", body, 6)[0])
            elif rid == _RK:
                r, c, _, rk = struct.unpack_from("<HHHI", body)
                cells[(r, c)] = _lex(_decode_rk(rk))
            elif rid == _MULRK:
                r, c0 = struct.unpack_from("<HH", body)
                n = (len(body) - 6) // 6
                for i in range(n):
                    rk = struct.unpack_from("<I", body, 4 + 6 * i + 2)[0]
                    cells[(r, c0 + i)] = _lex(_decode_rk(rk))
            elif rid == _LABEL:  # inline string cell (pre-SST style)
                r, c, _ = struct.unpack_from("<HHH", body)
                cur = _SSTCursor([body[6:]])
                cells[(r, c)] = cur.read_string()
    _flush_sst()

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)
    ]


# --------------------------------------------------------------------------- #
# writer (test fixtures)                                                      #
# --------------------------------------------------------------------------- #


def _rec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def _biff_str(s: str) -> bytes:
    """XLUnicodeRichExtendedString, no rich/ext runs."""
    try:
        raw, flags = s.encode("latin-1"), 0
    except UnicodeEncodeError:
        raw, flags = s.encode("utf-16-le"), 1
    return struct.pack("<HB", len(s), flags) + raw


def write_xls(path: str, rows: list[list]) -> None:
    """Write one worksheet: strings via SST/LABELSST, numbers via NUMBER."""
    strings: list[str] = []
    index: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    cell_recs = []
    n_cells = 0
    for r, row in enumerate(rows):
        for c, val in enumerate(row):
            if val is None:
                continue
            n_cells += 1
            if isinstance(val, (int, float)) and not isinstance(val, bool):
                cell_recs.append(_rec(
                    _NUMBER, struct.pack("<HHHd", r, c, 0, float(val))
                ))
            else:
                cell_recs.append(_rec(
                    _LABELSST, struct.pack("<HHHI", r, c, 0, sref(str(val)))
                ))
    sst_body = struct.pack("<II", n_cells, len(strings)) + b"".join(
        _biff_str(s) for s in strings
    )
    bof_globals = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_sheet = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    sheet_sub = bof_sheet + b"".join(cell_recs) + _rec(_EOF, b"")
    # BOUNDSHEET needs the sheet-BOF offset: globals length is fixed once
    # the boundsheet record length is known (name "Sheet1" -> 14-byte body)
    boundsheet_len = 4 + 4 + 2 + 2 + 6  # header + lbPlyPos + grbit + cch/flags + name
    globals_len = (
        len(bof_globals) + boundsheet_len + len(_rec(_SST, sst_body)) + 4
    )
    boundsheet = _rec(
        0x0085,
        struct.pack("<IH", globals_len, 0)
        + struct.pack("<BB", 6, 0) + b"Sheet1",
    )
    stream = (
        bof_globals + boundsheet + _rec(_SST, sst_body) + _rec(_EOF, b"")
        + sheet_sub
    )
    with open(path, "wb") as f:
        f.write(_build_cfb({"Workbook": stream}))


def _dir_entry(name: str, etype: int, start: int, size: int,
               child: int = _FREE) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = bytearray(128)
    e[0:len(raw)] = raw
    struct.pack_into("<H", e, 64, len(raw))
    e[66] = etype
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, _FREE, _FREE, child)  # left/right/child
    struct.pack_into("<II", e, 116, start, size)
    return bytes(e)


def _build_cfb(streams: dict[str, bytes]) -> bytes:
    """Single-stream CFB container; ministream below the 4096 cutoff."""
    (name, payload), = streams.items()
    ssz, msz = 512, 64

    def pad(b: bytes, unit: int) -> bytes:
        rem = len(b) % unit
        return b + b"\x00" * (unit - rem) if rem else b

    use_mini = len(payload) < 4096
    sectors: list[bytes] = []  # data sectors laid out after FAT+dir(+minifat)
    if use_mini:
        mini = pad(payload, msz)
        n_mini = len(mini) // msz
        minifat = [i + 1 for i in range(n_mini)]
        minifat[-1] = _END
        minifat += [_FREE] * (ssz // 4 - len(minifat))
        if len(minifat) > ssz // 4:
            raise ValueError("fixture ministream too large for one miniFAT sector")
        mini_sectors = [mini[i:i + ssz] for i in range(0, len(mini), ssz)]
        mini_sectors[-1] = pad(mini_sectors[-1], ssz)
        # layout: 0=FAT, 1=dir, 2=miniFAT, 3..=ministream
        first_minifat, n_minifat = 2, 1
        ministream_start, stream_start = 3, 0
        data_sectors = [struct.pack(f"<{ssz // 4}I", *minifat)] + mini_sectors
        root_size = len(mini)
    else:
        body = pad(payload, ssz)
        body_secs = [body[i:i + ssz] for i in range(0, len(body), ssz)]
        first_minifat, n_minifat = _END, 0
        ministream_start, root_size = _END, 0
        stream_start = 2  # 0=FAT, 1=dir, 2..=stream
        data_sectors = body_secs

    n_total = 2 + len(data_sectors)
    n_fat_sectors = (n_total * 4 + ssz - 1) // ssz
    if n_fat_sectors != 1:
        raise ValueError("fixture too large for the single-FAT-sector writer")
    fat = [_FREE] * (ssz // 4)
    fat[0] = _FATSECT
    fat[1] = _END  # directory
    first_data = 2
    if use_mini:
        fat[2] = _END  # miniFAT chain
        first_data = 3
    for i in range(len(data_sectors) - (1 if use_mini else 0)):
        s = first_data + i
        fat[s] = s + 1
    fat[first_data + len(data_sectors) - (2 if use_mini else 1)] = _END

    root = _dir_entry(
        "Root Entry", 5,
        ministream_start if use_mini else _FREE,
        root_size, child=1,
    )
    entry = _dir_entry(
        name, 2,
        0 if use_mini else stream_start,
        len(payload),
    )
    directory = pad(root + entry, ssz)

    header = bytearray(512)
    header[0:8] = _CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version (512B sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<H", header, 30, 9)        # sector shift
    struct.pack_into("<H", header, 32, 6)        # mini sector shift
    struct.pack_into("<I", header, 44, 1)        # FAT sector count
    struct.pack_into("<I", header, 48, 1)        # first directory sector
    struct.pack_into("<I", header, 56, 4096)     # mini cutoff
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, _END)     # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<I", header, 76, 0)        # DIFAT[0] -> FAT at sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, _FREE)

    return bytes(header) + struct.pack(f"<{ssz // 4}I", *fat) + directory + b"".join(data_sectors)
