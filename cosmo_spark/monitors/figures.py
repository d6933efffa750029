"""Figure sinks — the ``write_figure`` half of the reference's presentation
layer (ref: docs/source/api.rst:326-330: "Write the output figure to an html
file using the ``output`` directory and/or name provided"; usage
cosmo/monitors/dark_monitors.py:373-384 ``fig.write_html(output)`` with the
``{filename}_hist.html`` naming convention).

Like notify.py these are presentation-layer sinks: they collect a small,
ALREADY-AGGREGATED monitor frame (bounded loudly — an unaggregated fact
table is a caller bug, not something to silently truncate) and render it
driver-side.  The distributed plan stays upstream in the monitor.

If plotly is importable the figure is rendered through it, matching the
reference byte-level behavior; the container here ships no plotly, so the
default path is a dependency-free self-contained HTML template with an
inline-SVG chart (line or bar), light/dark via CSS custom properties, a
legend for multi-series figures, per-point native tooltips, and the full
(bounded) data table for accessibility.
"""

from __future__ import annotations

import html
import os
import re
from collections.abc import Sequence
from datetime import date, datetime

from pyspark.sql import DataFrame
from pyspark.sql.types import NumericType

try:  # optional, absent in this container — template path below is the default
    import plotly.graph_objects as _go
except Exception:  # pragma: no cover
    _go = None

#: fixed-order categorical slots (light, dark) — assigned by series position,
#: never cycled; figures with >4 series must aggregate upstream
_SERIES_COLORS = [
    ("#2a78d6", "#3987e5"),  # blue
    ("#eb6834", "#d95926"),  # orange
    ("#1baf7a", "#199e70"),  # aqua
    ("#eda100", "#c98500"),  # yellow
]

_W, _H = 800, 360
_ML, _MR, _MT, _MB = 64, 16, 16, 40  # plot margins inside the SVG


def _slug(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9._-]+", "_", name).strip("_").lower() or "figure"


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime) else v.isoformat()
    return str(v)


def write_figure(
    df: DataFrame,
    name: str,
    output: str = ".",
    *,
    x: str | None = None,
    y: str | Sequence[str] | None = None,
    kind: str = "line",
    max_rows: int = 5000,
) -> str:
    """Render a monitor's aggregate frame to ``{output}/{slug(name)}.html``
    and return the path (ref: write_figure contract, api.rst:326-330).

    ``x`` defaults to the first column; ``y`` to every other numeric column
    (max 4 series — more means the frame wasn't aggregated for presentation).
    ``kind`` is ``line`` (trend monitors) or ``bar`` (histogram monitors,
    ref dark_monitors.py:339-385).  Frames larger than ``max_rows`` raise:
    this sink is for tracked aggregates, not fact tables.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_figure({name!r}): frame exceeds max_rows={max_rows}; "
            "figure sinks render aggregate monitor output — aggregate "
            "upstream or raise max_rows explicitly"
        )
    cols = df.columns
    if x is None:
        x = cols[0]
    # sort by x driver-side: aggregate frames end in shuffles, so collect
    # order is nondeterministic — unsorted rows would draw a zigzag polyline
    # and label the extent with arbitrary rows (None x sorts first)
    rows.sort(key=lambda r: (r[x] is not None, r[x]))
    numeric = {f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)}
    if y is None:
        ys = [c for c in cols if c != x and c in numeric][:4]
    else:
        ys = [y] if isinstance(y, str) else list(y)
    if len(ys) > len(_SERIES_COLORS):
        raise ValueError(
            f"write_figure({name!r}): {len(ys)} series > {len(_SERIES_COLORS)}; "
            "fold extra series upstream (small multiples / 'other')"
        )
    if kind == "bar" and len(ys) > 1:
        raise ValueError(
            f"write_figure({name!r}): bar figures render ONE series; got "
            f"{ys} — pass y explicitly or use kind='line'"
        )

    os.makedirs(output, exist_ok=True)
    path = os.path.join(output, f"{_slug(name)}.html")

    if _go is not None:  # pragma: no cover - plotly absent in this container
        fig = _go.Figure()
        xs = [r[x] for r in rows]
        trace = _go.Bar if kind == "bar" else _go.Scatter
        for i, c in enumerate(ys):
            fig.add_trace(trace(x=xs, y=[r[c] for r in rows], name=c))
        fig.update_layout(title_text=name, xaxis_title=x)
        fig.write_html(path)
        return path

    with open(path, "w", encoding="utf-8") as f:
        f.write(_render_html(name, rows, x, ys, kind))
    return path


def write_monitor_figures(results: dict, output: str, **kwargs) -> dict[str, str]:
    """One figure per ``run_monitors`` result — the reference's
    ``Monitor.monitor()`` loop writes one html per monitor class
    (ref: run_monitors.py:58-76 + write_figure).  Each value may be a bare
    DataFrame or a monitor bundle dict, in which case the tracked aggregate
    (``results``, the ``track`` output) is the figure's frame."""
    paths = {}
    for mon, frame in results.items():
        if isinstance(frame, dict):
            frame = frame.get("results") or next(iter(frame.values()))
        paths[mon] = write_figure(frame, mon, output, **kwargs)
    return paths


# --------------------------------------------------------------------------- #
# dependency-free HTML/SVG template                                           #
# --------------------------------------------------------------------------- #

def _scale(vals: list[float], lo_px: float, hi_px: float):
    vmin, vmax = min(vals), max(vals)
    if vmax == vmin:
        vmax = vmin + 1.0
    span = vmax - vmin

    def to_px(v: float) -> float:
        return lo_px + (v - vmin) / span * (hi_px - lo_px)

    return to_px, vmin, vmax


def _svg_chart(rows, x: str, ys: list[str], kind: str) -> str:
    if not rows or not ys:
        return '<p class="muted">no data</p>'
    # x axis: numeric values when possible, else ordinal positions
    raw_x = [r[x] for r in rows]
    if all(isinstance(v, (int, float)) and v is not None for v in raw_x):
        xv = [float(v) for v in raw_x]
    else:
        xv = list(range(len(raw_x)))
    x_px, xmin, xmax = _scale(xv, _ML, _W - _MR)
    yvals = [float(r[c]) for c in ys for r in rows if r[c] is not None]
    if not yvals:
        return '<p class="muted">no data</p>'
    y_px, ymin, ymax = _scale(yvals, _H - _MB, _MT)  # inverted: SVG y grows down

    parts = [
        f'<svg viewBox="0 0 {_W} {_H}" role="img" '
        f'style="max-width:100%;height:auto">',
        # recessive grid: 4 horizontal lines + y tick labels in text tokens
    ]
    for i in range(5):
        gy = _MT + i * (_H - _MT - _MB) / 4
        gv = ymax - i * (ymax - ymin) / 4
        parts.append(
            f'<line x1="{_ML}" y1="{gy:.1f}" x2="{_W - _MR}" y2="{gy:.1f}" '
            'stroke="var(--grid)" stroke-width="1"/>'
            f'<text x="{_ML - 6}" y="{gy + 4:.1f}" text-anchor="end" '
            f'class="tick">{gv:.4g}</text>'
        )
    # x extent labels (rows arrive sorted by x)
    parts.append(
        f'<text x="{_ML}" y="{_H - 12}" class="tick">'
        f"{html.escape(_fmt(raw_x[0]))}</text>"
        f'<text x="{_W - _MR}" y="{_H - 12}" text-anchor="end" class="tick">'
        f"{html.escape(_fmt(raw_x[-1]))}</text>"
    )
    if kind == "bar":
        c = ys[0]
        bw = max(1.0, (_W - _ML - _MR) / max(1, len(rows)) - 2)  # 2px gap
        base = y_px(max(ymin, 0.0) if ymin < 0 else ymin)
        for i, r in enumerate(rows):
            if r[c] is None:
                continue
            px, py = x_px(xv[i]), y_px(float(r[c]))
            top, hgt = min(py, base), abs(base - py)
            parts.append(
                f'<rect x="{px - bw / 2:.1f}" y="{top:.1f}" width="{bw:.1f}" '
                f'height="{max(hgt, 0.5):.1f}" rx="2" fill="var(--s1)">'
                f"<title>{html.escape(_fmt(r[x]))}: {_fmt(r[c])}</title></rect>"
            )
    else:
        for si, c in enumerate(ys):
            pts = [
                (x_px(xv[i]), y_px(float(r[c])), r)
                for i, r in enumerate(rows) if r[c] is not None
            ]
            poly = " ".join(f"{px:.1f},{py:.1f}" for px, py, _ in pts)
            parts.append(
                f'<polyline points="{poly}" fill="none" stroke="var(--s{si + 1})" '
                'stroke-width="2" stroke-linejoin="round"/>'
            )
            for px, py, r in pts:  # hover targets with native tooltips
                parts.append(
                    f'<circle cx="{px:.1f}" cy="{py:.1f}" r="8" fill="transparent">'
                    f"<title>{html.escape(_fmt(r[x]))} — {html.escape(c)}: "
                    f"{_fmt(r[c])}</title></circle>"
                )
    parts.append("</svg>")
    if len(ys) > 1:  # legend only for multi-series; the title names a single one
        parts.append(
            '<div class="legend">'
            + "".join(
                f'<span><span class="swatch" style="background:var(--s{i + 1})">'
                f"</span>{html.escape(c)}</span>"
                for i, c in enumerate(ys)
            )
            + "</div>"
        )
    return "".join(parts)


def _render_html(name: str, rows, x: str, ys: list[str], kind: str) -> str:
    cols = list(rows[0].asDict().keys()) if rows else [x, *ys]
    shown = rows[:200]
    table = (
        "<table><thead><tr>"
        + "".join(f"<th>{html.escape(c)}</th>" for c in cols)
        + "</tr></thead><tbody>"
        + "".join(
            "<tr>" + "".join(f"<td>{html.escape(_fmt(r[c]))}</td>" for c in cols) + "</tr>"
            for r in shown
        )
        + "</tbody></table>"
        + (
            f'<p class="muted">showing 200 of {len(rows)} rows</p>'
            if len(rows) > 200 else ""
        )
    )
    dark_vars = (
        "--surface:#1a1a19;--ink:#ffffff;--muted:#c3c2b7;--grid:#3a3a38;"
        "--s1:#3987e5;--s2:#d95926;--s3:#199e70;--s4:#c98500;"
    )
    return f"""<!doctype html>
<html><head><meta charset="utf-8"><title>{html.escape(name)}</title>
<style>
.viz-root {{ color-scheme: light;
  --surface:#fcfcfb; --ink:#0b0b0b; --muted:#52514e; --grid:#e4e3df;
  --s1:#2a78d6; --s2:#eb6834; --s3:#1baf7a; --s4:#eda100;
  background:var(--surface); color:var(--ink);
  font:14px/1.45 system-ui,sans-serif; padding:24px; }}
@media (prefers-color-scheme: dark) {{
  :root:where(:not([data-theme="light"])) .viz-root {{ color-scheme: dark; {dark_vars} }} }}
:root[data-theme="dark"] .viz-root {{ color-scheme: dark; {dark_vars} }}
h1 {{ font-size:18px; margin:0 0 16px }}
.tick {{ fill:var(--muted); font-size:11px }}
.muted {{ color:var(--muted) }}
.legend {{ display:flex; gap:16px; margin:8px 0; color:var(--muted) }}
.swatch {{ display:inline-block; width:10px; height:10px; border-radius:2px;
  margin-right:6px }}
table {{ border-collapse:collapse; margin-top:16px }}
th,td {{ padding:4px 10px; border-bottom:1px solid var(--grid); text-align:left;
  font-variant-numeric:tabular-nums }}
th {{ color:var(--muted); font-weight:600 }}
</style></head>
<body class="viz-root"><h1>{html.escape(name)}</h1>
{_svg_chart(rows, x, ys, kind)}
{table}
</body></html>
"""
