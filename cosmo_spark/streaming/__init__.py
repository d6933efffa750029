from cosmo_spark.streaming.ingest import stream_ingest_merge
from cosmo_spark.streaming.joins import stream_lag_join
from cosmo_spark.streaming.rates import windowed_rates

__all__ = ["stream_ingest_merge", "stream_lag_join", "windowed_rates"]
