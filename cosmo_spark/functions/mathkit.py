"""Math expression helpers (SURVEY.md §2.8).

ref: cosmo/monitor_helpers.py:28-32 (fit_line), :92-108 (v2v3 rotation);
cosmo/monitors/acq_monitors.py:67 (slew distance).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def hypot_distance(x: Column | str, y: Column | str) -> Column:
    """sqrt(x^2 + y^2) — total slew distance (ref: cosmo/monitors/acq_monitors.py:67)."""
    x, y = _c(x), _c(y)
    return F.sqrt(x * x + y * y)


def rotate_45(x: Column | str, y: Column | str) -> tuple[Column, Column]:
    """Rotate detector (x, y) into spacecraft (V2, V3) axes: a fixed 45° rotation.

    ref: cosmo/monitor_helpers.py:92-108 (``v2v3``): V2 = x cosθ + y sinθ,
    V3 = x cosθ - y sinθ with θ = 45°.
    """
    x, y = _c(x), _c(y)
    c = F.lit(math.cos(math.radians(45.0)))
    s = F.lit(math.sin(math.radians(45.0)))
    return (x * c + y * s, x * c - y * s)


def fit_line_cols(x: Column | str, y: Column | str) -> tuple[Column, Column]:
    """Degree-1 least-squares fit as aggregate expressions.

    ref: cosmo/monitor_helpers.py:28-32 (``fit_line`` via np.polyfit(deg=1)).
    Returns (slope, intercept) aggregate Columns — use inside .agg().
    Built-in ``regr_slope``/``regr_intercept`` keep this JVM-side; no UDF.
    """
    x, y = _c(x), _c(y)
    return (F.regr_slope(y, x), F.regr_intercept(y, x))
