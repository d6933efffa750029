"""Expression kits: tiny, composable Column builders.

Everything here returns pyspark ``Column`` objects built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly.
No Python UDFs.
"""

from cosmo_spark.functions.timekit import (
    mjd_to_ts,
    ts_to_mjd,
    doy_str_to_ts,
    ts_to_doy_str,
    decimal_year,
)
from cosmo_spark.functions.mathkit import hypot_distance, rotate_45, fit_line_cols
from cosmo_spark.functions.arrays import (
    explode_zip,
    RaggedArrayError,
    assert_equal_lengths,
    array_mean,
    array_std,
    array_max,
    rel_to_first,
    element_by_match,
    clean_sentinels,
)
from cosmo_spark.functions.text import (
    tokenize,
    poly_hash,
    word_shingles,
    stopword_ratio,
)
from cosmo_spark.functions.vectors import dot, l2_norm, cosine_sim

__all__ = [
    "mjd_to_ts", "ts_to_mjd", "doy_str_to_ts", "ts_to_doy_str", "decimal_year",
    "hypot_distance", "rotate_45", "fit_line_cols",
    "explode_zip", "RaggedArrayError", "assert_equal_lengths",
    "array_mean", "array_std", "array_max", "rel_to_first",
    "element_by_match", "clean_sentinels",
    "tokenize", "poly_hash", "word_shingles", "stopword_ratio",
    "dot", "l2_norm", "cosine_sim",
]
