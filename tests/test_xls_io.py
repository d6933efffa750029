"""Legacy .xls (CFB + BIFF8) codec: fixture roundtrips over both container
paths (ministream and regular FAT), lexical-form parity with the xlsx
codec, and an end-to-end read of the reference's REAL mnemonics workbook
(ref: cosmo/telemetry_support/COSMnemonics.xls, consumed by
telemetry_monitors.py:84/380) whose >8 KB shared-string table exercises
SST CONTINUE handling on genuine Excel output."""

from __future__ import annotations

import os

import pytest

from cosmo_spark.sources.xls_io import read_xls, write_xls

REAL_XLS = "/root/reference/cosmo/telemetry_support/COSMnemonics.xls"


def test_roundtrip_ministream(tmp_path):
    """Small fixture lands in the ministream (the layout real Excel uses
    below the 4096-byte cutoff)."""
    p = str(tmp_path / "t.xls")
    write_xls(p, [["a", "b", "c"], ["x", 1, None], [None, 2.5, "z"]])
    assert os.path.getsize(p) < 8192
    assert read_xls(p) == [
        ["a", "b", "c"], ["x", "1", None], [None, "2.5", "z"],
    ]


def test_roundtrip_regular_fat(tmp_path):
    """A workbook stream past the 4096-byte cutoff takes the regular FAT
    chain instead of the ministream."""
    p = str(tmp_path / "big.xls")
    rows = [["Mnemonic", "Description"]] + [
        [f"MN{i:04d}", float(i)] for i in range(400)
    ]
    write_xls(p, rows)
    got = read_xls(p)
    assert len(got) == 401
    assert got[0] == ["Mnemonic", "Description"]
    assert got[1] == ["MN0000", "0"] and got[400] == ["MN0399", "399"]


def test_unicode_strings(tmp_path):
    p = str(tmp_path / "u.xls")
    write_xls(p, [["Ångström", "μ-metric"], ["plain", "höhe"]])
    assert read_xls(p) == [["Ångström", "μ-metric"], ["plain", "höhe"]]


def test_lexical_parity_with_xlsx(tmp_path):
    """Same fixture through both codecs yields identical rows — callers
    (read_mnemonic_descriptions) must not care which container arrived."""
    from cosmo_spark.sources.xlsx_io import write_xlsx, read_xlsx

    rows = [["Mnemonic", "Description"], ["LMMCETMP", "MCE temperature"],
            ["N1", 3], ["N2", 2.5]]
    px, pb = str(tmp_path / "t.xlsx"), str(tmp_path / "t.xls")
    write_xlsx(px, rows)
    write_xls(pb, rows)
    assert read_xlsx(px) == read_xls(pb)


@pytest.mark.skipif(not os.path.exists(REAL_XLS), reason="reference data absent")
def test_reads_reference_cosmnemonics():
    """The actual production input parses: 267 sheet rows, header row names
    the columns the reference accesses by name, and known mnemonics carry
    their descriptions."""
    rows = read_xls(REAL_XLS)
    assert len(rows) == 267
    assert "Mnemonic" in rows[0] and "Description" in rows[0]
    mn, de = rows[0].index("Mnemonic"), rows[0].index("Description")
    lookup = {r[mn]: r[de] for r in rows[1:] if r[mn]}
    assert lookup["L15VHLD1"] == "LVPS1 +15V Hold Converter Voltage"
    assert len(lookup) > 200


@pytest.mark.skipif(not os.path.exists(REAL_XLS), reason="reference data absent")
def test_mnemonic_descriptions_real_xls_e2e(spark):
    """read_mnemonic_descriptions end-to-end on the reference's real legacy
    workbook: by-header-name column selection (Mnemonic is NOT the first
    column in the real sheet)."""
    from cosmo_spark.sources.files import read_mnemonic_descriptions

    df = read_mnemonic_descriptions(spark, REAL_XLS)
    got = {r.Mnemonic: r.Description for r in df.collect() if r.Mnemonic}
    assert got["L15VHLD1"] == "LVPS1 +15V Hold Converter Voltage"
    assert len(got) > 200


def test_mnemonic_descriptions_fixture_xls(spark, tmp_path):
    from cosmo_spark.sources.files import read_mnemonic_descriptions

    p = str(tmp_path / "mn.xls")
    write_xls(p, [
        ["Page", "Mnemonic", "Description"],   # extra leading column
        ["16", "LMMCETMP", "MCE temperature"],
        ["16", "LOSM1POS", "OSM1 position"],
    ])
    got = {r.Mnemonic: r.Description
           for r in read_mnemonic_descriptions(spark, p).collect()}
    assert got == {"LMMCETMP": "MCE temperature", "LOSM1POS": "OSM1 position"}


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "bad.xls"
    p.write_bytes(b"not a compound file at all")
    with pytest.raises(ValueError, match="magic"):
        read_xls(str(p))


def test_sst_flag_byte_at_header_char_boundary():
    """A CONTINUE split exactly between a string's header and its first
    character still carries a fresh flag byte — it must be consumed as a
    flag, not decoded as a character (round-5 review repro)."""
    import struct

    from cosmo_spark.sources.xls_io import _SSTCursor

    c = _SSTCursor([struct.pack("<HB", 2, 0), b"\x00AB"])
    assert c.read_string() == "AB"


def test_sst_mid_character_split_raises_not_hangs():
    """An odd dangling byte inside wide-character data is spec-invalid;
    the parser must raise 'corrupt SST', not spin forever."""
    import struct

    from cosmo_spark.sources.xls_io import _SSTCursor

    c = _SSTCursor([struct.pack("<HB", 3, 1) + b"A\x00B", b"\x01C\x00"])
    with pytest.raises(ValueError, match="corrupt SST"):
        c.read_string()


def test_mnemonic_single_named_header_refuses(spark, tmp_path):
    """A sheet with Mnemonic but a renamed Description column must raise,
    not silently report a positional column under the found name."""
    from cosmo_spark.sources.files import read_mnemonic_descriptions

    p = str(tmp_path / "mn.xls")
    write_xls(p, [["Page", "Mnemonic", "Descr"], ["16", "A", "b"]])
    with pytest.raises(ValueError, match="no Description"):
        read_mnemonic_descriptions(spark, p)


# --------------------------------------------------------------------------- #
# property: arbitrary tables roundtrip through the BIFF8 writer/reader        #
# --------------------------------------------------------------------------- #

from hypothesis import given, settings, strategies as st


def _lex(x):
    """Expected lexical form after roundtrip (matches xls_io._lex)."""
    if x is None:
        return None
    if isinstance(x, str):
        return x
    return str(int(x)) if x == int(x) and abs(x) < 1e15 else repr(float(x))


_cell = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                               exclude_categories=("Cs",)),
        max_size=40,
    ),
    st.integers(min_value=-10**9, max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e12, max_value=1e12),
)


@given(
    rows=st.lists(st.lists(_cell, min_size=1, max_size=6),
                  min_size=1, max_size=12),
)
@settings(max_examples=30, deadline=None)
def test_xls_roundtrip_property(tmp_path_factory, rows):
    """write_xls -> read_xls preserves every cell's lexical form, with rows
    densified to the max written width; fully-None tails may drop (no cell
    records are emitted for them — Excel's own sparse behavior)."""
    tmp = tmp_path_factory.mktemp("xlsprop")
    p = str(tmp / "t.xls")
    write_xls(p, rows)
    got = read_xls(p)
    # expected dense grid over cells that produced records
    cells = {
        (r, c): _lex(v)
        for r, row in enumerate(rows) for c, v in enumerate(row)
        if v is not None
    }
    if not cells:
        assert got == []
        return
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    want = [[cells.get((r, c)) for c in range(n_cols)] for r in range(n_rows)]
    assert got == want


def test_nested_chart_substream_does_not_truncate_sheet(tmp_path):
    """An embedded chart/VBA object opens a NESTED BOF/EOF inside the
    worksheet substream (MS-XLS 2.1.7.20).  The reader must (a) keep
    collecting sheet cells AFTER the nested EOF and (b) never parse the
    embedded object's records as sheet cells (ADVICE r5: a flat BOF
    counter truncated rows mid-sheet)."""
    import struct

    from cosmo_spark.sources.xls_io import _build_cfb, _rec

    _BOF, _EOF, _NUMBER = 0x0809, 0x000A, 0x0203

    def num(r, c, v):
        return _rec(_NUMBER, struct.pack("<HHHd", r, c, 0, float(v)))

    bof_globals = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    bof_sheet = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    bof_chart = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0020, 0, 0, 0, 0))
    # chart body carries a NUMBER record that must NOT become a sheet cell
    nested = bof_chart + num(9, 9, 999.0) + _rec(_EOF, b"")
    sheet = (
        bof_sheet
        + num(0, 0, 1.0)
        + nested            # embedded object mid-sheet
        + num(1, 0, 2.0)    # cells AFTER the nested EOF must survive
        + _rec(_EOF, b"")
    )
    stream = bof_globals + _rec(_EOF, b"") + sheet
    p = str(tmp_path / "nested.xls")
    with open(p, "wb") as f:
        f.write(_build_cfb({"Workbook": stream}))
    assert read_xls(p) == [["1"], ["2"]]
