"""Spark 4 Python DataSource for SMS schedule reports: ``format("cosmo-sms")``.

The reference has no pluggable source concept — each file type is a
hand-rolled Python loop (ref: cosmo/sms/ingest_sms.py:73-152,
cosmo/filesystem.py:355-397).  Spark 4's Python Data Source API
(pyspark.sql.datasource) lets the SMS format participate in the normal
reader machinery instead:

- batch: one input partition per report file (task parallelism = file
  parallelism, exactly the reference's dask fan-out), lazy per-partition
  parsing;
- streaming: incremental file discovery as source offsets (SURVEY ST1) —
  the reference's ingest-log diff becomes engine-checkpointed exactly-once
  delivery.

    spark.dataSource.register(build_datasource())
    df  = spark.read.format("cosmo-sms").load(dir)          # batch
    st  = spark.readStream.format("cosmo-sms").load(dir)    # stream

Serialization note: every class and helper is defined INSIDE
``build_datasource`` so cloudpickle ships them by value.  Spark runs data
sources in separate Python workers (plan worker, streaming source runner),
and the streaming runner does not inherit ``addPyFile`` includes — a
module-referenced class would need the package installed on every worker
(this is the same worker-pickling trap as mapInPandas closures; see
sources/multimodal.py).

Line grammar matches sources/sms.py (cross-verified row-for-row in tests);
for FITS the identical pattern applies with astropy inside ``read`` — kept
out of this environment because the codec is unavailable (SURVEY.md §4.1).
"""

from __future__ import annotations

_DDL = (
    "EXPOSURE STRING, ROOTNAME STRING, PROPOSID BIGINT, DETECTOR STRING, "
    "OPMODE STRING, EXPTIME DOUBLE, EXPSTART STRING, FUVHVSTATE STRING, "
    "APERTURE STRING, OSM1POS STRING, OSM2POS STRING, CENWAVE BIGINT, "
    "FPPOS BIGINT, TSINCEOSM1 DOUBLE, TSINCEOSM2 DOUBLE, FILEID STRING"
)


def build_datasource():
    """Build the (self-contained, pickle-by-value) SmsDataSource class."""
    import glob as _glob
    import os as _os
    import re as _re

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    fields = [
        ("EXPOSURE", str), ("ROOTNAME", str), ("PROPOSID", int),
        ("DETECTOR", str), ("OPMODE", str), ("EXPTIME", float),
        ("EXPSTART", str), ("FUVHVSTATE", str), ("APERTURE", str),
        ("OSM1POS", str), ("OSM2POS", str), ("CENWAVE", int),
        ("FPOFFSET", int), ("TSINCEOSM1", float), ("TSINCEOSM2", float),
    ]
    excluded = ("MEMORY", "ALIGN/OSM", "ALIGN/APER")
    name_re = _re.compile(r"([0-9]{6}[a-z0-9]{2,3})\.txt$")
    ddl = _DDL

    def parse_file(path):
        m = name_re.search(_os.path.basename(path))
        fileid = m.group(1) if m else None
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if any(x in line for x in excluded):
                    continue
                parts = line.split()
                if len(parts) != len(fields):
                    raise ValueError(f"malformed SMS line in {path!r}: {line!r}")
                rec = [cast(tok) for tok, (_, cast) in zip(parts, fields)]
                # FPPOS = fpoffset + 3 (ref: ingest_sms.py:141)
                rows.append(tuple(rec[:12] + [rec[12] + 3] + rec[13:] + [fileid]))
        return rows

    def list_files(path):
        return sorted(_glob.glob(_os.path.join(path, "*.txt")))

    class SmsFilePartition(InputPartition):
        def __init__(self, path):
            self.path = path

    class SmsReader(DataSourceReader):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("cosmo-sms requires a load(path)")

        def partitions(self):
            files = list_files(self.path)
            if not files:
                raise FileNotFoundError(f"no SMS reports under {self.path}")
            return [SmsFilePartition(p) for p in files]

        def read(self, partition):
            yield from parse_file(partition.path)

    class SmsStreamReader(SimpleDataSourceStreamReader):
        """Offset = the set of already-emitted file names (a production
        source would compact to an (mtime, name) watermark)."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("cosmo-sms streaming requires a load(path)")

        def initialOffset(self):
            return {"seen": []}

        def read(self, start):
            seen = set(start["seen"])
            new = [p for p in list_files(self.path)
                   if _os.path.basename(p) not in seen]
            rows = []
            for p in new:
                rows.extend(parse_file(p))
            end = {"seen": sorted(seen | {_os.path.basename(p) for p in new})}
            return iter(rows), end

        def readBetweenOffsets(self, start, end):
            # deterministic replay after failure: exactly the files that
            # joined the offset between the two checkpoints
            delta = set(end["seen"]) - set(start["seen"])
            rows = []
            for name in sorted(delta):
                rows.extend(parse_file(_os.path.join(self.path, name)))
            return iter(rows)

    class SmsDataSource(DataSource):
        @classmethod
        def name(cls):
            return "cosmo-sms"

        def schema(self):
            return ddl

        def reader(self, schema):
            return SmsReader(self.options)

        def simpleStreamReader(self, schema):
            return SmsStreamReader(self.options)

    return SmsDataSource


def register(spark) -> None:
    spark.dataSource.register(build_datasource())
