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

def _variant(fn, doc, **bound):
    """Named specialization of a parameterized monitor bundle (the reference
    declares one class per variant; here variants bind parameters)."""
    def wrapper(**inputs):
        return fn(**inputs, **bound)
    wrapper.__required_inputs__ = fn.__required_inputs__
    wrapper.__optional_inputs__ = getattr(fn, "__optional_inputs__", [])
    wrapper.__doc__ = doc
    wrapper.__name__ = fn.__name__
    return wrapper


def _detector_variant(fn, detector, doc, **bound):
    """Variant that pre-filters its first input table by DETECTOR."""
    from pyspark.sql import functions as F

    required = fn.__required_inputs__

    def wrapper(**inputs):
        first = required[0]
        inputs = {**inputs, first: inputs[first].filter(F.col("DETECTOR") == detector)}
        return fn(**inputs, **bound)
    wrapper.__required_inputs__ = required
    wrapper.__optional_inputs__ = getattr(fn, "__optional_inputs__", [])
    wrapper.__doc__ = doc
    wrapper.__name__ = f"{fn.__name__}_{detector.lower()}"
    return wrapper


#: name -> (cadence, callable) — one entry per reference monitor class
#: (ref: cosmo/monitors/__init__.py:1-19; cadence markers
#: cosmo/run_monitors.py:95-146, cosmo/pytest.ini:1-8)
MONITORS = {
    "acq_image": ("monthly", acq_image_monitor),
    "acq_image_v2v3": ("monthly", acq_image_v2v3_monitor),
    "acq_peakd": ("monthly", _variant(
        acq_peak_monitor, "AcqPeakdMonitor (ref: acq_monitors.py:355-437)",
        exptype="ACQ/PEAKD")),
    "acq_peakxd": ("monthly", _variant(
        acq_peak_monitor, "AcqPeakxdMonitor (ref: acq_monitors.py:440-516)",
        exptype="ACQ/PEAKXD")),
    "fuv_osm_shift1": ("monthly", _detector_variant(
        osm_shift_monitor, "FUV",
        "FuvOsmShift1Monitor (ref: osm_shift_monitors.py:348-356; "
        "outliers |A-B| > 10 px)",
        shift_col="SHIFT_DISP", segment_pairs=[("FUVA", "FUVB")],
        outlier_rule="fixed", outlier_threshold=10.0)),
    "fuv_osm_shift2": ("monthly", _detector_variant(
        osm_shift_monitor, "FUV",
        "FuvOsmShift2Monitor (ref: osm_shift_monitors.py:359-367; "
        "outliers |A-B| > 5 px)",
        shift_col="SHIFT_XDISP", segment_pairs=[("FUVA", "FUVB")],
        outlier_rule="fixed", outlier_threshold=5.0)),
    "nuv_osm_shift1": ("monthly", _detector_variant(
        osm_shift_monitor, "NUV",
        "NuvOsmShift1Monitor (ref: osm_shift_monitors.py:601-670; "
        "FP_PIXEL_SHIFT-corrected, B-C / C-A pairs, zero-centered 2σ)",
        shift_col="SHIFT_DISP", apply_fp_shift=True,
        segment_pairs=[("NUVB", "NUVC"), ("NUVC", "NUVA")],
        outlier_rule="pair_2std")),
    "nuv_osm_shift2": ("monthly", _detector_variant(
        osm_shift_monitor, "NUV",
        "NuvOsmShift2Monitor (ref: osm_shift_monitors.py:673-694; "
        "B-C / C-A pairs, zero-centered 2σ)",
        shift_col="SHIFT_XDISP",
        segment_pairs=[("NUVB", "NUVC"), ("NUVC", "NUVA")],
        outlier_rule="pair_2std")),
    "fuv_osm_drift": ("monthly", _detector_variant(
        osm_drift_monitor, "FUV",
        "FUVOSMDriftMonitor (ref: osm_drift_monitors.py:44-135)")),
    "nuv_osm_drift": ("monthly", _detector_variant(
        osm_drift_monitor, "NUV",
        "NUVOSMDriftMonitor (ref: osm_drift_monitors.py:218-300)")),
    "dark_rate": ("daily", dark_rate_monitor),
    "telemetry": ("daily", telemetry_monitor),
    "fuv_aperture_shift": ("monthly", _detector_variant(
        aperture_shift_monitor, "FUV",
        "FuvApertureShiftMonitor (ref: aper_shift_monitors.py:329-337)")),
    "nuv_aperture_shift": ("monthly", _detector_variant(
        aperture_shift_monitor, "NUV",
        "NuvApertureShiftMonitor (ref: aper_shift_monitors.py:340-348)")),
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
        kwargs = {k: inputs[k] for k in required}
        # optional inputs (e.g. the dark monitor's solar overlay) ride along
        # when provided, and are simply omitted otherwise
        for k in getattr(fn, "__optional_inputs__", ()):
            if inputs.get(k) is not None:
                kwargs[k] = inputs[k]
        out[name] = fn(**kwargs)
    return out
