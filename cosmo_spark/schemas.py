"""Explicit StructType schemas for the cosmo data model (SURVEY.md §1.4).

The reference declares its schemas implicitly through extraction-request
dicts (ref: cosmo/monitors/data_models.py:32-58,105-118,281-287,322-327) and
peewee field declarations (ref: cosmo/sms/sms_db.py:15-41).  Here every table
gets an explicit StructType; arrays are native ArrayType (the reference
serializes arrays to strings inside SQLite — a hack Parquet removes,
ref: cosmo/monitor_helpers.py:118-135).

Primary keys are informational (enforced by MERGE logic, not the engine),
mirroring the reference's peewee primary_key declarations.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


S = StringType()
D = DoubleType()
L = LongType()
AD = ArrayType(DoubleType())
AL = ArrayType(LongType())
AS = ArrayType(StringType())

# ref: cosmo/monitors/data_models.py:25-91; docs/source/datamodels.rst:11-44
ACQ = StructType([
    _f("ROOTNAME", S, False),   # PK
    _f("FILENAME", S),
    _f("EXPTYPE", S),
    _f("ACQSLEWX", D),          # default 0.0 (data_models.py:55)
    _f("ACQSLEWY", D),
    _f("EXPSTART", D),          # MJD
    _f("PROPOSID", L),
    _f("OBSTYPE", S),
    _f("NEVENTS", D),
    _f("SHUTTER", S),
    _f("LAMPEVNT", D),
    _f("ACQSTAT", S),
    _f("EXTENDED", S),
    _f("LINENUM", S),
    _f("APERTURE", S),
    _f("OPT_ELEM", S),
    _f("LIFE_ADJ", L),
    _f("CENWAVE", L),
    _f("DETECTOR", S),
    _f("DGESTAR", S),
    _f("FGS", S),               # derived substr(DGESTAR, -2) (data_models.py:19-22)
])

# ref: cosmo/monitors/data_models.py:94-182
OSM = StructType([
    _f("ROOTNAME", S, False),   # PK
    _f("DETECTOR", S),
    _f("LIFE_ADJ", L),
    _f("OPT_ELEM", S),
    _f("CENWAVE", L),
    _f("FPPOS", L),
    _f("PROPOSID", L),
    _f("OBSET_ID", S),
    _f("EXPSTART", D),          # MJD
    _f("TIME", AD),             # one element per flash x segment
    _f("SHIFT_DISP", AD),
    _f("SHIFT_XDISP", AD),
    _f("SEGMENT", AS),
    _f("LAMPTAB_SEGMENT", AS),  # ref-file arrays (data_models.py:113-119)
    _f("FP_PIXEL_SHIFT", AD),
    _f("XC_RANGE", AD),
    _f("SEARCH_OFFSET", AD),
    _f("TSINCEOSM1", D),        # joined from sms_exposures (data_models.py:156-182)
    _f("TSINCEOSM2", D),
])

# ref: cosmo/sms/sms_db.py:15-20
SMS_FILE_STATS = StructType([
    _f("SMSID", S, False),      # PK
    _f("VERSION", S),           # lexicographic supersede order (docs/source/sms.rst:27-30)
    _f("FILEID", S),            # unique; SMSID || VERSION
    _f("FILENAME", S),
    _f("INGEST_DATE", TimestampType()),
])

# ref: cosmo/sms/sms_db.py:23-40; dtypes cosmo/sms/ingest_sms.py:40-56
SMS_EXPOSURES = StructType([
    _f("EXPOSURE", S, False),   # PK
    _f("FILEID", S),            # FK -> sms_file_stats.FILEID
    _f("ROOTNAME", S),          # 8 chars; join key is ROOTNAME || 'q'
    _f("PROPOSID", L),
    _f("DETECTOR", S),
    _f("OPMODE", S),
    _f("EXPTIME", D),
    _f("EXPSTART", S),          # 'yyyy.ddd:hh:mm:ss' (ingest_sms.py:28)
    _f("FUVHVSTATE", S),
    _f("APERTURE", S),
    _f("OSM1POS", S),
    _f("OSM2POS", S),
    _f("CENWAVE", L),
    _f("FPPOS", L),             # fpoffset + 3 (ingest_sms.py:141)
    _f("TSINCEOSM1", D),
    _f("TSINCEOSM2", D),
])

# ref: cosmo/monitors/data_models.py:272-311
DARK = StructType([
    _f("ROOTNAME", S),
    _f("SEGMENT", S),
    _f("EXPTIME", D),
    _f("EXPSTART", D),          # MJD; rows with 0 skipped (dark_monitors.py:183-184)
    _f("PHA", AL),              # per-event; FUV band 2 < PHA < 23
    _f("XCORR", AD),
    _f("YCORR", AD),
    _f("TIME", AD),             # seconds since EXPSTART, per event
    _f("TIME_3", AD),           # ext-3 collision rename (filesystem.py:74-82)
    _f("LATITUDE", AD),
    _f("LONGITUDE", AD),
])

# ref: cosmo/filesystem.py:196-278; cosmo/monitors/jitter_monitors.py:18-24
JITTER = StructType([
    _f("FILENAME", S),
    _f("PROPOSID", L),
    _f("CONFIG", S),
    _f("EXPNAME", S),
    _f("EXPSTART", D),          # from sibling raw file; default 0
    _f("EXPTYPE", S),           # default 'N/A' (filesystem.py:228-247)
    _f("Seconds", AD),
    _f("SI_V2_AVG", AD),
    _f("SI_V3_AVG", AD),
    _f("SI_V2_RMS", AD),
    _f("SI_V3_RMS", AD),
])

# ref: cosmo/monitors/telemetry_monitors.py:104-119
TELEMETRY = StructType([
    _f("mnemonic", S),
    _f("MJD", D),
    _f("Data", D),
])

# ref: cosmo/monitor_helpers.py:147-159
ANCILLARY = StructType([
    _f("ROOTNAME", S),
    _f("PROP_TYP", S),
    _f("APERXPOS", D),
    _f("APERYPOS", D),
])

# CRDS dimension tables; ref: cosmo/filesystem.py:94-154
LAMPTAB = StructType([
    _f("OPT_ELEM", S),
    _f("CENWAVE", L),
    _f("FPOFFSET", L),
    _f("SEGMENT", S),
    _f("FP_PIXEL_SHIFT", D),
])

WCPTAB = StructType([
    _f("OPT_ELEM", S),
    _f("XC_RANGE", D),
    _f("SEARCH_OFFSET", D),
])

#: Primary / merge keys per table (ref peewee primary_key declarations).
MERGE_KEYS = {
    "acq": ["ROOTNAME"],
    "osm": ["ROOTNAME"],
    "sms_file_stats": ["SMSID"],
    "sms_exposures": ["EXPOSURE"],
}
