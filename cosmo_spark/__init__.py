"""cosmo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``spacetelescope/cosmo`` (HST COS monitoring),
re-expressed Spark-first.

The reference (read-only at /root/reference) is a pandas/peewee/dask batch
pipeline; this package maps its data model and operator inventory
(see SURVEY.md) onto the Spark DataFrame/SQL engine:

- ``schemas``    — explicit StructType schemas for every reference table
                   (SURVEY.md §1.4; ref: cosmo/monitors/data_models.py).
- ``functions``  — scalar/array expression kits: MJD time kernel, rotation
                   math, validated zip-explode, text/vector kits
                   (ref: cosmo/monitor_helpers.py).
- ``operators``  — composable DataFrame transforms: describe-by, histograms,
                   rolling windows, as-of join, segment diff, outlier rules,
                   version-guarded merge, dedup/similarity for training-data
                   pipelines (ref: cosmo/monitors/*.py).
- ``sources``    — table loaders and the SMS fixed-format text report parser
                   (ref: cosmo/sms/ingest_sms.py).
- ``streaming``  — Structured Streaming formulations of the incremental
                   ingest semantics (SURVEY.md §2.9).
- ``queries``    — the named query catalog exposed through __spark_entry__.

Everything here is stock Spark SQL wherever possible: no RDDs, no
row-at-a-time Python UDFs in hot paths, shuffles only where semantics require
them, and dimension joins broadcast.
"""

from cosmo_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]

__version__ = "0.1.0"
