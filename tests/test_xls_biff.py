"""Native CFB+BIFF8 .xls reader (operators/xls_biff.py): round-trips via
the spec-valid fixture writer — both CFB storage paths, SST CONTINUE
splitting, every cell record type — plus the xls_source typed-DataFrame
contract."""

from __future__ import annotations

import struct

import pytest

from tuktu_spark.operators.xls_biff import (
    _REC_BOF,
    _REC_EOF,
    _REC_FORMULA,
    _REC_STRING,
    _build_workbook_stream,
    _cfb_wrap,
    _record,
    _rk_value,
    make_xls,
    read_xls_rows,
)

ROWS = [
    ["name", "qty", "price", "ok", "note"],
    ["alpha", 3, 1.5, True, "first row"],
    ["beta", -7, 2.25, False, None],
    [None, 1000000, 0.001, True, "x" * 200],
    ["gamma", 1, 2, 3, 4],
]


def _padded(rows, width):
    return [r + [None] * (width - len(r)) for r in rows]


class TestRoundTrip:
    def test_small_file_uses_ministream_and_roundtrips(self):
        data = make_xls(ROWS)
        # stream < 4096 -> stored via mini-FAT (whole file stays small)
        assert len(data) < 4096 + 512
        got = read_xls_rows(data)
        assert got == _padded(ROWS, len(got[0]))

    def test_large_file_uses_regular_sectors(self):
        rows = [[f"s{i}", i, i / 4, i % 2 == 0] for i in range(500)]
        data = make_xls(rows)
        got = read_xls_rows(data)
        assert len(got) == 500
        assert got[123] == ["s123", 123, 123 / 4, False]

    def test_sst_continue_split_inside_string(self):
        # the fixture writer caps SST payloads at 64 bytes, so a 200-char
        # string is guaranteed to split mid-character-run (grbit restart)
        rows = [["a" * 200, "b" * 3, "c" * 150]]
        got = read_xls_rows(make_xls(rows))
        assert got == rows

    def test_negative_and_boundary_rk_ints(self):
        rows = [[-(2**29), 2**29 - 1, -1, 0]]
        got = read_xls_rows(make_xls(rows))
        assert got == rows

    def test_multirow_gaps(self):
        rows = [[None, None, 5], ["x"], [None, True]]
        got = read_xls_rows(make_xls(rows))
        assert got == _padded(rows, 3)


class TestRkDecode:
    def test_int_rk(self):
        assert _rk_value((42 << 2) | 0x02) == 42

    def test_int_div100(self):
        assert _rk_value((1234 << 2) | 0x03) == 12.34

    def test_float_rk(self):
        packed = struct.unpack("<Q", struct.pack("<d", 2.5))[0]
        rk = (packed >> 32) & 0xFFFFFFFC
        assert _rk_value(rk) == 2.5

    def test_float_rk_div100(self):
        packed = struct.unpack("<Q", struct.pack("<d", 250.0))[0]
        rk = ((packed >> 32) & 0xFFFFFFFC) | 0x01
        assert _rk_value(rk) == 2.5


class TestFormulaCachedResults:
    """Reader-side only: hand-build FORMULA records (the fixture writer
    never emits formulas) with cached number / bool / string results."""

    def _wrap_sheet(self, cell_records: bytes) -> bytes:
        sheet = (
            _record(_REC_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
            + cell_records
            + _record(_REC_EOF, b"")
        )
        globals_part = _record(
            _REC_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0)
        )
        name = b"S"
        bs = struct.pack("<IHB", 0, 0, len(name)) + b"\x00" + name
        globals_part += _record(0x0085, bs)
        globals_part += _record(_REC_EOF, b"")
        stream = bytearray(globals_part + sheet)
        struct.pack_into("<I", stream, 4 + 16 + 4, len(globals_part))
        return _cfb_wrap("Workbook", bytes(stream))

    def test_cached_number(self):
        rec = _record(
            _REC_FORMULA,
            struct.pack("<HHH", 0, 0, 0) + struct.pack("<d", 6.5) + b"\x00" * 8,
        )
        assert read_xls_rows(self._wrap_sheet(rec)) == [[6.5]]

    def test_cached_bool(self):
        num = bytes([1, 0, 1, 0, 0, 0]) + b"\xff\xff"
        rec = _record(_REC_FORMULA, struct.pack("<HHH", 0, 0, 0) + num + b"\x00" * 8)
        assert read_xls_rows(self._wrap_sheet(rec)) == [[True]]

    def test_cached_string_via_string_record(self):
        num = bytes([0, 0, 0, 0, 0, 0]) + b"\xff\xff"
        recs = _record(_REC_FORMULA, struct.pack("<HHH", 0, 0, 0) + num + b"\x00" * 8)
        recs += _record(_REC_STRING, struct.pack("<HB", 2, 0) + b"hi")
        assert read_xls_rows(self._wrap_sheet(recs)) == [["hi"]]


class TestSourceIntegration:
    def test_xls_source_typed_dataframe(self, spark, tmp_path):
        path = str(tmp_path / "fixture.xls")
        with open(path, "wb") as f:
            f.write(
                make_xls(
                    [
                        ["name", "qty", "price", "ok"],
                        ["alpha", 3, 1.5, True],
                        ["beta", 7, 2.0, False],
                    ]
                )
            )
        from tuktu_spark.operators import make_source

        df = make_source(spark, "xls", {"path": path})
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "string", "bigint", "double", "boolean",
        ]
        rows = {r["name"]: r for r in df.collect()}
        assert rows["alpha"]["qty"] == 3 and rows["beta"]["price"] == 2.0

    def test_bad_signature_raises(self):
        with pytest.raises(ValueError, match="CFB"):
            read_xls_rows(b"not an ole2 file at all" * 30)

    def test_sheet_out_of_range(self):
        with pytest.raises(ValueError, match="out of range"):
            read_xls_rows(make_xls([["a"]]), sheet=2)
