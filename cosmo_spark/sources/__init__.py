"""Sources and sinks: parquet tables, custom DataSources (cosmo-sms /
cosmo-fits), ancillary file readers, layout writers, and the training-data
export surface."""

from cosmo_spark.sources.tables import load_table, load_tables, TABLES
from cosmo_spark.sources.export import (
    read_manifest,
    read_sharded_jsonl,
    with_shard,
    write_sharded_jsonl,
)
from cosmo_spark.sources.layout import (
    compact_table,
    read_bucketed,
    write_bucketed,
    write_partitioned,
    write_zordered,
    zorder_value,
)

__all__ = [
    "load_table", "load_tables", "TABLES",
    "with_shard", "write_sharded_jsonl", "read_sharded_jsonl", "read_manifest",
    "write_partitioned", "write_bucketed", "read_bucketed",
    "write_zordered", "zorder_value", "compact_table",
]
