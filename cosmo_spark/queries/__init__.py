"""Named query catalog.

Each query is registered with a Spark callable ``(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB
runs over the same parquet tables.  Column names and rounding are kept
identical on both sides so order-insensitive value hashes match.

This is the Spark analog of the reference's monitor registry
(ref: cosmo/monitors/__init__.py:1-19, cosmo/run_monitors.py:11-34): a
catalog of named query bundles discovered by the runner.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    #: an ANSI-SQL string, or a zero-arg callable returning one.  The
    #: vector-artifact family registers CALLABLES so the oracle text is
    #: built at ACCESS time from whatever quantizer artifacts are then
    #: active (committed literals on the test corpora; trainer output when
    #: the literal modules are absent or the corpus is new) instead of
    #: freezing the literals into the string at import.
    oracle_src: str | Callable[[], str] | None = None
    doc: str = ""
    operators: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids

    @property
    def oracle(self) -> str | None:
        return self.oracle_src() if callable(self.oracle_src) else self.oracle_src


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | Callable[[], str] | None = None,
             operators: tuple[str, ...] = (), doc: str = ""):
    """Decorator adding a query to the catalog."""
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), operators)
        return fn
    return deco


def all_queries() -> dict[str, Query]:
    # import side-effect registration
    from cosmo_spark.queries import (  # noqa: F401
        misc,
        textops,
        timeseries,
        tpch,
        trainprep,
        vectorops,
    )
    return dict(sorted(REGISTRY.items()))
