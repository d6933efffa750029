"""Composable DataFrame operators mirroring the reference's monitor
building blocks (SURVEY.md §2) plus the training-data-pipeline extensions
(dedup / similarity / text / multimodal)."""

from cosmo_spark.operators.asof import asof_join
from cosmo_spark.operators.describe import describe_by
from cosmo_spark.operators.histogram import histogram, quantile_cuts
from cosmo_spark.operators.topk import latest_per_key
from cosmo_spark.operators.segment_diff import segment_diff
from cosmo_spark.operators.outliers import sigma_outliers, flag_outliers
from cosmo_spark.operators.merge import merge_versioned
from cosmo_spark.operators.windows import rolling_time_mean, cumulative, boxcar

__all__ = [
    "asof_join", "describe_by", "histogram", "quantile_cuts", "latest_per_key",
    "segment_diff", "sigma_outliers", "flag_outliers", "merge_versioned",
    "rolling_time_mean", "cumulative", "boxcar",
]
