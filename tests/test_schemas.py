"""Schema-contract tests (SURVEY §1.4, U6 rename-on-collision)."""

from __future__ import annotations

from pyspark.sql.types import ArrayType, DoubleType

from cosmo_spark import schemas


def test_dark_collision_rename():
    # the reference renames the second extraction of TIME to TIME_3
    # (ref: cosmo/filesystem.py:74-82); our schema declares both explicitly
    names = [f.name for f in schemas.DARK.fields]
    assert "TIME" in names and "TIME_3" in names
    assert isinstance(schemas.DARK["TIME"].dataType, ArrayType)
    assert isinstance(schemas.DARK["TIME_3"].dataType, ArrayType)


def test_no_duplicate_columns_anywhere():
    for name in ["ACQ", "OSM", "SMS_FILE_STATS", "SMS_EXPOSURES", "DARK",
                 "JITTER", "TELEMETRY", "ANCILLARY", "LAMPTAB", "WCPTAB"]:
        st = getattr(schemas, name)
        cols = [f.name for f in st.fields]
        assert len(cols) == len(set(cols)), f"{name} has duplicate columns"


def test_merge_keys_exist_in_schemas():
    tables = {
        "acq": schemas.ACQ, "osm": schemas.OSM,
        "sms_file_stats": schemas.SMS_FILE_STATS,
        "sms_exposures": schemas.SMS_EXPOSURES,
    }
    for table, keys in schemas.MERGE_KEYS.items():
        cols = {f.name for f in tables[table].fields}
        assert set(keys) <= cols, (table, keys)


def test_osm_array_columns_typed():
    # FIXTURES.md §2: shift arrays are double[], aligned per flash
    for col in ["TIME", "SHIFT_DISP", "SHIFT_XDISP", "FP_PIXEL_SHIFT"]:
        dt = schemas.OSM[col].dataType
        assert isinstance(dt, ArrayType) and isinstance(dt.elementType, DoubleType)
