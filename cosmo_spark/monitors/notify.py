"""Notification sinks — render tiny result frames into the reference's
notification strings (ref: cosmo/monitors/acq_monitors.py:252-288
``set_notification``; monitorframe delivers such strings by email).

These are presentation-layer sinks: they collect a per-FGS (or per-group)
aggregate frame — a handful of rows by construction — and format it.  The
heavy lifting stays in the monitor's distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def v2v3_notification(trends: DataFrame, name: str = "V2V3 Offset Monitor",
                      date: str = "") -> str:
    """Format the V2V3 trend frame like the reference's example notification
    (ref :255-270): per FGS, the V2/V3 slope (arcsec/year) and the fitted
    offsets at the window's first and last data points."""
    lines = [f"{name} {date} Results".rstrip() + "\n"]
    for r in sorted(trends.collect(), key=lambda r: r.FGS):
        lines.append(f"{r.FGS} (since the most recent break point; n={r.n})")
        for axis in ("V2", "V3"):
            slope = r[f"{axis}_slope"]
            start = r[f"{axis}_fit_start"]
            end = r[f"{axis}_fit_end"]
            lines.append(
                f"{axis}:\n"
                f"\tSlope: {slope:.4f} arcseconds/year\n"
                f"\tOffset (from fit) at time of first data point: {start:.3f} arcseconds\n"
                f"\tOffset (from fit) at time of last data point: {end:.3f} arcseconds\n"
            )
    return "\n".join(lines)


def outlier_notification(outliers: DataFrame, name: str,
                         key_cols: tuple[str, ...] = ("ROOTNAME",),
                         limit: int = 50) -> str:
    """Generic outlier notification: monitor name + one line per flagged
    row (bounded), the shape the reference's simpler monitors email."""
    rows = outliers.select(*key_cols).limit(limit).collect()
    lines = [f"{name}: {len(rows)} outlier(s)"]
    lines += ["  " + ", ".join(str(r[c]) for c in key_cols) for r in rows]
    return "\n".join(lines)
