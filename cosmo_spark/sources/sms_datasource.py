"""Spark 4 Python DataSource for SMS schedule reports: ``format("cosmo-sms")``.

The reference has no pluggable source concept — each file type is a
hand-rolled Python loop (ref: cosmo/sms/ingest_sms.py:73-152,
cosmo/filesystem.py:355-397).  Spark 4's Python Data Source API
(pyspark.sql.datasource) lets the SMS format participate in the normal
reader machinery instead: schema declaration, one input partition per
report file (task parallelism = file parallelism, exactly the reference's
dask fan-out), and lazy per-partition parsing.

    spark.dataSource.register(SmsDataSource)
    df = spark.read.format("cosmo-sms").load("/path/to/reports")

This is the batch-source twin of sources/sms.py's regexp pipeline — same
line grammar and exclusion rules, different integration point.  (For FITS,
the identical pattern applies with astropy inside ``read`` — kept out of
this environment because the codec is unavailable; SURVEY.md §4.1.)
"""

from __future__ import annotations

import glob as _glob
import os
import re
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: field order and Python casts for a report line (FIXTURES.md §4)
_FIELDS = [
    ("EXPOSURE", str), ("ROOTNAME", str), ("PROPOSID", int), ("DETECTOR", str),
    ("OPMODE", str), ("EXPTIME", float), ("EXPSTART", str), ("FUVHVSTATE", str),
    ("APERTURE", str), ("OSM1POS", str), ("OSM2POS", str), ("CENWAVE", int),
    ("FPOFFSET", int), ("TSINCEOSM1", float), ("TSINCEOSM2", float),
]
_EXCLUDED = ("MEMORY", "ALIGN/OSM", "ALIGN/APER")
_NAME_RE = re.compile(r"([0-9]{6}[a-z0-9]{2,3})\.txt$")

_DDL = (
    "EXPOSURE STRING, ROOTNAME STRING, PROPOSID BIGINT, DETECTOR STRING, "
    "OPMODE STRING, EXPTIME DOUBLE, EXPSTART STRING, FUVHVSTATE STRING, "
    "APERTURE STRING, OSM1POS STRING, OSM2POS STRING, CENWAVE BIGINT, "
    "FPPOS BIGINT, TSINCEOSM1 DOUBLE, TSINCEOSM2 DOUBLE, FILEID STRING"
)


class SmsFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SmsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cosmo-sms requires a load(path)")

    def partitions(self):
        # one partition per report file — task parallelism mirrors the
        # reference's one-dask-task-per-file fan-out
        files = sorted(_glob.glob(os.path.join(self.path, "*.txt")))
        if not files:
            raise FileNotFoundError(f"no SMS reports under {self.path}")
        return [SmsFilePartition(p) for p in files]

    def read(self, partition: SmsFilePartition) -> Iterator[tuple]:
        m = _NAME_RE.search(os.path.basename(partition.path))
        fileid = m.group(1) if m else None
        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                if any(x in line for x in _EXCLUDED):
                    continue
                parts = line.split()
                if len(parts) != len(_FIELDS):
                    raise ValueError(
                        f"malformed SMS line in {partition.path!r}: {line!r}"
                    )
                rec = [cast(tok) for tok, (_, cast) in zip(parts, _FIELDS)]
                fpoffset = rec[12]
                row = rec[:12] + [fpoffset + 3] + rec[13:] + [fileid]
                yield tuple(row)


class SmsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cosmo-sms"

    def schema(self) -> str:
        return _DDL

    def reader(self, schema: StructType) -> SmsReader:
        return SmsReader(self.options)


def register(spark) -> None:
    """Register the source, shipping the package to Python workers.

    The DataSource class is cloudpickled by module reference, so executors
    must be able to ``import cosmo_spark``.  On a managed cluster that's a
    pip install or ``--py-files``; here ``addPyFile`` with an on-the-fly
    package zip makes registration self-sufficient from any working
    directory.
    """
    _ship_package(spark)
    spark.dataSource.register(SmsDataSource)


def _ship_package(spark) -> None:
    import tempfile
    import zipfile

    import cosmo_spark

    pkg_dir = os.path.dirname(os.path.abspath(cosmo_spark.__file__))
    zpath = os.path.join(tempfile.gettempdir(), "cosmo_spark_pkg.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            "cosmo_spark", os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
