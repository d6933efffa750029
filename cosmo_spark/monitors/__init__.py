"""Monitor query bundles — the reference's analytics surface.

Each monitor mirrors the monitorframe contract the reference implements
(ref: docs/source/api.rst:127-357): ``get_data`` builds the input DataFrame,
``track`` computes aggregates, ``find_outliers`` flags rows.  Here each is a
pure function over cosmo-shaped DataFrames (schemas in
cosmo_spark.schemas); sinks (plots, CSV) take the returned small aggregate
frames.

Registry mirrors the reference's class-scan catalog
(ref: cosmo/run_monitors.py:11-34, cosmo/monitors/__init__.py:1-19).
"""

from cosmo_spark.monitors.acq import (
    acq_image_monitor,
    acq_peak_monitor,
    acq_image_v2v3_monitor,
)
from cosmo_spark.monitors.osm import osm_shift_monitor, osm_drift_monitor
from cosmo_spark.monitors.dark import dark_rate_monitor
from cosmo_spark.monitors.telemetry import telemetry_monitor
from cosmo_spark.monitors.aper import aperture_shift_monitor
from cosmo_spark.monitors.jitter import jitter_monitor

#: name -> (cadence, callable) — cadence mirrors the reference's pytest
#: markers (ref: cosmo/run_monitors.py:95-146, cosmo/pytest.ini:1-8)
MONITORS = {
    "acq_image": ("monthly", acq_image_monitor),
    "acq_image_v2v3": ("monthly", acq_image_v2v3_monitor),
    "acq_peakd": ("monthly", acq_peak_monitor),
    "osm_shift": ("monthly", osm_shift_monitor),
    "osm_drift": ("monthly", osm_drift_monitor),
    "dark_rate": ("daily", dark_rate_monitor),
    "telemetry": ("daily", telemetry_monitor),
    "aperture_shift": ("monthly", aperture_shift_monitor),
    "jitter": ("monthly", jitter_monitor),
}


def run_monitors(cadence: str, inputs: dict) -> dict:
    """Run every monitor registered for ``cadence`` over ``inputs``
    (table-name -> DataFrame).  Ingest-before-analyze ordering is the
    caller's job, as in the reference (ref: run_monitors.py:95-108)."""
    out = {}
    for name, (cad, fn) in MONITORS.items():
        if cad != cadence:
            continue
        required = fn.__required_inputs__
        if any(inputs.get(k) is None for k in required):
            continue  # input table not provided this run
        out[name] = fn(**{k: inputs[k] for k in required})
    return out
