"""Static-HTML dashboard over the pipeline's exported results — the
serving surface for the reference's Streamlit app (services/
visualization/app.py:14-53, components.py:26-167, helpers.py:236-319)
restated for a cluster-scale engine.

Design: Spark computes every panel as a DataFrame (the aggregations in
``visualization.py`` — tiny plans over already-aggregated exports);
the renderer collects ONLY bounded, pre-aggregated relations (cluster
counts, per-cluster quartiles, term rollups, a capped deterministic
scatter sample) and emits one self-contained HTML file: zero
dependencies, no server round-trips, works from any object store via
a plain file link. To serve it live, pass the rendered page as
``index_html`` to ``serving.DashboardServer`` — the chart page
replaces the server's bare-table index, and the JSON panel API keeps
working beside it.

Chart grammar (fixed): KPI stat tiles for the headline numbers;
single-hue column chart for cluster sizes (magnitude job); horizontal
p25–p75 range bars with a median tick for per-cluster token spread;
a 2px line for the per-term trend; a scatter of the 2-D projection
with the three largest clusters in categorical slots 1-3 and the rest
folded to "Other" in muted gray (all-pairs color cap). Values render
as text labels and in tooltips; every chart has a table-equivalent
``<details>`` block so no value is hover-gated. Labels pass through
html.escape — series/category names are untrusted data.
"""

from __future__ import annotations

import html
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Reference palette (validated default — see the dataviz palette doc):
# categorical slots 1-3 are the all-pairs-safe prefix in both modes.
_LIGHT = {
    "surface": "#fcfcfb", "page": "#f9f9f7", "ink": "#0b0b0b",
    "ink2": "#52514e", "muted": "#898781", "grid": "#e1e0d9",
    "axis": "#c3c2b7", "s1": "#2a78d6", "s2": "#eb6834", "s3": "#1baf7a",
}
_DARK = {
    "surface": "#1a1a19", "page": "#0d0d0d", "ink": "#ffffff",
    "ink2": "#c3c2b7", "muted": "#898781", "grid": "#2c2c2a",
    "axis": "#383835", "s1": "#3987e5", "s2": "#d95926", "s3": "#199e70",
}

_W, _H, _PAD = 640, 260, 44  # fixed chart viewbox


def _compact(v: float | int | None) -> str:
    """Stat-tile auto-compact figures: 1,284 / 12.9K / 4.2M."""
    if v is None:
        return "—"
    a = abs(v)
    if a >= 1_000_000:
        return f"{v / 1_000_000:.1f}M"
    if a >= 10_000:
        return f"{v / 1_000:.1f}K"
    if isinstance(v, float) and not v.is_integer():
        return f"{v:,.1f}"
    return f"{int(v):,}"


def dashboard_panels(
    results: DataFrame,
    report: DataFrame,
    utterances: DataFrame,
    projection: DataFrame | None = None,
    max_scatter: int = 2000,
) -> dict[str, Any]:
    """Compute every dashboard panel Spark-side and collect the
    bounded aggregates. The per-case size metric (total words) joins
    from the utterance export — cluster_results carries only the
    assignment, like the reference's CSV. ``projection`` is an
    optional (x, y, cluster) frame (the t-SNE/PCA output); it is the
    only per-row relation and is capped at ``max_scatter`` rows by
    deterministic hash order — a sample, labeled as such, never the
    full corpus."""
    from .visualization import (
        cluster_box_stats,
        cluster_size_distribution,
        representative_table,
        term_trend,
    )

    sizes = [
        (r["cluster"], r["count"])
        for r in cluster_size_distribution(results).collect()
    ]
    per_case = utterances.groupBy("case_id").agg(
        F.sum("word_count").alias("words")
    )
    assigned = results.join(per_case, "case_id")
    box = {
        r[0]: r for r in cluster_box_stats(assigned, "words").collect()
    }
    trend = [tuple(r) for r in term_trend(utterances).collect()]
    reps = [
        r.asDict()
        for r in representative_table(results, report)
        .orderBy("cluster")
        .collect()
    ]
    totals = assigned.agg(
        F.count("*").alias("n_cases"),
        F.countDistinct("cluster").alias("n_clusters"),
        F.sum(F.col("words").cast("double")).alias("total_tokens"),
        F.avg(F.col("words").cast("double")).alias("avg_tokens"),
    ).collect()[0]
    scatter = []
    if projection is not None:
        scatter = [
            (float(r["x"]), float(r["y"]), r["cluster"])
            for r in projection.orderBy(
                F.xxhash64("x", "y", "cluster")
            ).limit(max_scatter).collect()
        ]
    return {
        "totals": totals.asDict(),
        "sizes": sizes,
        "box": [box[c] for c in sorted(box)],
        "trend": trend,
        "reps": reps,
        "scatter": scatter,
        "scatter_capped": projection is not None
        and len(scatter) == max_scatter,
    }


# ---- SVG primitives (method: thin marks, 4px rounded data ends, ----
# ---- 2px gaps in surface color, hairline grid, text in ink only) ----

def _esc(s: Any) -> str:
    return html.escape(str(s), quote=True)


def _ticks(lo: float, hi: float, n: int = 4) -> list[float]:
    """Clean-number axis ticks covering [lo, hi]."""
    if hi <= lo:
        hi = lo + 1
    span = hi - lo
    step = 10 ** int(f"{span:e}".split("e")[1])
    for s in (step / 10, step / 5, step / 2, step):
        if span / s <= n:
            step = s
            break
    t0 = int(lo / step) * step
    out = []
    t = t0
    while t <= hi + 1e-9:
        if t >= lo - 1e-9:
            out.append(round(t, 10))
        t += step
    return out or [lo, hi]


def _grid(ymax: float, x0: int = _PAD, x1: int = _W - 12) -> tuple[str, list[float]]:
    ticks = _ticks(0, ymax)
    parts = []
    for t in ticks:
        y = _H - _PAD - (t / ticks[-1]) * (_H - 2 * _PAD)
        parts.append(
            f'<line x1="{x0}" y1="{y:.1f}" x2="{x1}" y2="{y:.1f}" '
            f'stroke="var(--grid)" stroke-width="1"/>'
            f'<text x="{x0 - 6}" y="{y + 4:.1f}" text-anchor="end" '
            f'class="tick">{_compact(t)}</text>'
        )
    return "".join(parts), ticks


def _column_chart(sizes: list[tuple[Any, int]]) -> str:
    """Cluster-size distribution: single-series column chart, series
    slot 1, value on every cap (few categories), tooltip per mark."""
    if not sizes:
        return '<p class="empty">no clusters</p>'
    ymax = max(c for _, c in sizes)
    grid, ticks = _grid(max(ymax, 1))
    span = _W - _PAD - 12
    n = len(sizes)
    band = span / n
    bw = min(24.0, band * 0.6)
    bars = []
    for i, (cid, cnt) in enumerate(sizes):
        h = (cnt / ticks[-1]) * (_H - 2 * _PAD)
        x = _PAD + i * band + (band - bw) / 2
        y = _H - _PAD - h
        label = _esc(f"cluster {cid}")
        bars.append(
            f'<path d="M{x:.1f} {_H - _PAD} v{-max(h - 4, 0):.1f} '
            f'q0 -4 4 -4 h{bw - 8:.1f} q4 0 4 4 v{max(h - 4, 0):.1f} z" '
            f'fill="var(--s1)" class="mark" tabindex="0" '
            f'data-tip="{label}: {cnt:,}"/>'
            f'<text x="{x + bw / 2:.1f}" y="{y - 6:.1f}" '
            f'text-anchor="middle" class="val">{_compact(cnt)}</text>'
            f'<text x="{x + bw / 2:.1f}" y="{_H - _PAD + 16}" '
            f'text-anchor="middle" class="tick">{_esc(cid)}</text>'
        )
    base = (
        f'<line x1="{_PAD}" y1="{_H - _PAD}" x2="{_W - 12}" '
        f'y2="{_H - _PAD}" stroke="var(--axis)" stroke-width="1"/>'
    )
    return (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" '
        f'aria-label="cluster sizes">{grid}{"".join(bars)}{base}</svg>'
    )


def _range_chart(box: list) -> str:
    """Per-cluster token spread: horizontal p25–p75 range bar with a
    median tick — the honest 1-hue reduction of a box plot."""
    if not box:
        return '<p class="empty">no clusters</p>'
    hi = max(float(r["p75"]) for r in box) or 1.0
    n = len(box)
    h = max(2 * _PAD + n * 28, 120)
    span = _W - 150 - 24
    rows = []
    for i, r in enumerate(box):
        y = _PAD + i * 28
        x25 = 150 + float(r["p25"]) / hi * span
        x75 = 150 + float(r["p75"]) / hi * span
        xmed = 150 + float(r["p50"]) / hi * span
        tip = (
            f"cluster {r[0]}: p25 {_compact(float(r['p25']))} · median "
            f"{_compact(float(r['p50']))} · p75 {_compact(float(r['p75']))}"
        )
        rows.append(
            f'<text x="142" y="{y + 5}" text-anchor="end" class="tick">'
            f'{_esc(r[0])}</text>'
            f'<rect x="{x25:.1f}" y="{y - 7}" width="{max(x75 - x25, 2):.1f}" '
            f'height="14" rx="4" fill="var(--s1)" opacity="0.35" '
            f'class="mark" tabindex="0" data-tip="{_esc(tip)}"/>'
            f'<rect x="{xmed - 1.5:.1f}" y="{y - 9}" width="3" height="18" '
            f'fill="var(--s1)"/>'
            f'<text x="{x75 + 8:.1f}" y="{y + 5}" class="val">'
            f'{_compact(float(r["p50"]))}</text>'
        )
    return (
        f'<svg viewBox="0 0 {_W} {h}" role="img" '
        f'aria-label="token spread per cluster">{"".join(rows)}</svg>'
    )


def _line_chart(trend: list[tuple]) -> str:
    """Per-term utterance trend: one 2px line, end-dot + end-label."""
    if not trend:
        return '<p class="empty">no utterances</p>'
    ys = [float(t[2]) for t in trend]
    grid, ticks = _grid(max(ys))
    span = _W - _PAD - 24
    n = len(trend)
    pts = []
    for i, t in enumerate(trend):
        x = _PAD + (i + 0.5) * span / n
        y = _H - _PAD - float(t[2]) / ticks[-1] * (_H - 2 * _PAD)
        pts.append((x, y, t))
    path = "M" + " L".join(f"{x:.1f} {y:.1f}" for x, y, _ in pts)
    dots = "".join(
        f'<circle cx="{x:.1f}" cy="{y:.1f}" r="4" fill="var(--s1)" '
        f'stroke="var(--surface)" stroke-width="2" class="mark" '
        f'tabindex="0" data-tip="{_esc(t[0])}: {int(t[2]):,} utterances, '
        f'{int(t[1]):,} cases"/>'
        f'<text x="{x:.1f}" y="{_H - _PAD + 16}" text-anchor="middle" '
        f'class="tick">{_esc(t[0])}</text>'
        for x, y, t in pts
    )
    ex, ey, et = pts[-1]
    end = (
        f'<text x="{ex:.1f}" y="{ey - 10:.1f}" text-anchor="end" '
        f'class="val">{_compact(float(et[2]))}</text>'
    )
    return (
        f'<svg viewBox="0 0 {_W} {_H}" role="img" aria-label="term trend">'
        f'{grid}<path d="{path}" fill="none" stroke="var(--s1)" '
        f'stroke-width="2" stroke-linejoin="round" '
        f'stroke-linecap="round"/>{dots}{end}</svg>'
    )


def _scatter_chart(scatter: list[tuple], capped: bool) -> str:
    """2-D projection: the three largest clusters take categorical
    slots 1-3 (the all-pairs-safe prefix); every other cluster folds
    to "Other" in muted gray. Legend always present (4 keys)."""
    if not scatter:
        return '<p class="empty">no projection exported</p>'
    from collections import Counter

    top3 = [c for c, _ in Counter(c for _, _, c in scatter).most_common(3)]
    slot = {c: f"var(--s{i + 1})" for i, c in enumerate(top3)}
    xs = [p[0] for p in scatter]
    ys = [p[1] for p in scatter]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    sx = (_W - 2 * _PAD) / ((x1 - x0) or 1)
    sy = (_H - 2 * _PAD) / ((y1 - y0) or 1)
    dots = "".join(
        f'<circle cx="{_PAD + (x - x0) * sx:.1f}" '
        f'cy="{_H - _PAD - (y - y0) * sy:.1f}" r="4" '
        f'fill="{slot.get(c, "var(--muted)")}" '
        f'stroke="var(--surface)" stroke-width="2" class="mark" '
        f'tabindex="0" data-tip="cluster {_esc(c)} ({x:.2f}, {y:.2f})"/>'
        for x, y, c in scatter
    )
    keys = [(c, slot[c]) for c in top3] + [("Other", "var(--muted)")]
    legend = "".join(
        f'<span class="key"><span class="swatch" '
        f'style="background:{col}"></span>cluster {_esc(k)}</span>'
        if k != "Other"
        else f'<span class="key"><span class="swatch" '
        f'style="background:{col}"></span>Other</span>'
        for k, col in keys
    )
    note = (
        '<p class="note">deterministic sample — not the full corpus</p>'
        if capped
        else ""
    )
    return (
        f'<div class="legend">{legend}</div>'
        f'<svg viewBox="0 0 {_W} {_H}" role="img" '
        f'aria-label="cluster projection">{dots}</svg>{note}'
    )


def _table(reps: list[dict]) -> str:
    if not reps:
        return '<p class="empty">no representatives</p>'
    cols = list(reps[0])
    head = "".join(f"<th>{_esc(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc(r[c])}</td>" for c in cols) + "</tr>"
        for r in reps
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def _data_table(headers: list[str], rows: list[tuple]) -> str:
    """The no-hover fallback: every charted value, as a table."""
    head = "".join(f"<th>{_esc(h)}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{_esc(v)}</td>" for v in r) + "</tr>"
        for r in rows
    )
    return (
        f"<details><summary>table view</summary><table><thead><tr>{head}"
        f"</tr></thead><tbody>{body}</tbody></table></details>"
    )


_CSS = """
:root { color-scheme: light dark; }
body { margin: 0; background: var(--page); color: var(--ink);
  font: 14px/1.5 system-ui, -apple-system, "Segoe UI", sans-serif; }
.viz-root { %LIGHT% }
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root { %DARK% } }
:root[data-theme="dark"] .viz-root { %DARK% }
main { max-width: 720px; margin: 0 auto; padding: 24px 16px; }
h1 { font-size: 22px; } h2 { font-size: 15px; color: var(--ink2);
  font-weight: 600; margin: 28px 0 8px; }
.card { background: var(--surface); border: 1px solid var(--grid);
  border-radius: 8px; padding: 16px; }
.tiles { display: grid; grid-template-columns: repeat(4, 1fr);
  gap: 12px; }
.tile .label { color: var(--ink2); font-size: 12px; }
.tile .value { font-size: 26px; font-weight: 600; }
svg { width: 100%; height: auto; display: block; }
.tick { font-size: 11px; fill: var(--muted); }
.val { font-size: 11px; font-weight: 600; fill: var(--ink2); }
.empty, .note { color: var(--muted); font-size: 12px; }
.legend { display: flex; gap: 14px; font-size: 12px;
  color: var(--ink2); margin-bottom: 6px; }
.swatch { display: inline-block; width: 10px; height: 10px;
  border-radius: 2px; margin-right: 5px; }
table { border-collapse: collapse; width: 100%; font-size: 12px; }
th { text-align: left; color: var(--ink2); }
td { font-variant-numeric: tabular-nums; }
th, td { padding: 4px 8px; border-bottom: 1px solid var(--grid); }
details summary { color: var(--muted); font-size: 12px;
  cursor: pointer; margin-top: 6px; }
.mark:hover, .mark:focus { opacity: 0.8; outline: none; }
#tip { position: fixed; pointer-events: none; background: var(--ink);
  color: var(--surface); padding: 4px 8px; border-radius: 4px;
  font-size: 12px; display: none; z-index: 9; }
"""

_JS = """
const tip = document.getElementById('tip');
function show(e) {
  tip.textContent = e.target.dataset.tip;   // untrusted: textContent
  tip.style.display = 'block';
  const x = e.clientX ?? e.target.getBoundingClientRect().x;
  const y = e.clientY ?? e.target.getBoundingClientRect().y;
  tip.style.left = Math.min(x + 12, innerWidth - 180) + 'px';
  tip.style.top = (y - 30) + 'px';
}
function hide() { tip.style.display = 'none'; }
for (const m of document.querySelectorAll('.mark')) {
  m.addEventListener('pointermove', show);
  m.addEventListener('pointerleave', hide);
  m.addEventListener('focus', show);
  m.addEventListener('blur', hide);
}
"""


def render_dashboard_html(
    panels: dict[str, Any], title: str = "cluster dashboard"
) -> str:
    """Panels → one self-contained HTML document (no external
    requests, CSP-friendly inline everything)."""
    t = panels["totals"]
    tiles = "".join(
        f'<div class="card tile"><div class="label">{_esc(lbl)}</div>'
        f'<div class="value">{_compact(val)}</div></div>'
        for lbl, val in [
            ("Total cases", t["n_cases"]),
            ("Clusters found", t["n_clusters"]),
            ("Total words", t["total_tokens"]),
            ("Avg words/case", t["avg_tokens"]),
        ]
    )
    css = _CSS.replace(
        "%LIGHT%", "".join(f"--{k}:{v};" for k, v in _LIGHT.items())
    ).replace("%DARK%", "".join(f"--{k}:{v};" for k, v in _DARK.items()))
    sections = [
        ("Cluster sizes", _column_chart(panels["sizes"])
         + _data_table(["cluster", "cases"], panels["sizes"])),
        ("Token spread per cluster", _range_chart(panels["box"])
         + _data_table(
             ["cluster", "p25", "median", "p75", "n"],
             [tuple(r) for r in panels["box"]])),
        ("Utterances per term", _line_chart(panels["trend"])
         + _data_table(
             ["term", "cases", "utterances", "words"], panels["trend"])),
        ("Cluster projection",
         _scatter_chart(panels["scatter"], panels["scatter_capped"])),
        ("Cluster representatives", _table(panels["reps"])),
    ]
    body = "".join(
        f'<h2>{_esc(h)}</h2><div class="card">{content}</div>'
        for h, content in sections
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{css}</style></head>"
        f"<body><div class='viz-root'><main><h1>{_esc(title)}</h1>"
        f"<div class='tiles'>{tiles}</div>{body}</main>"
        f"<div id='tip' role='status'></div></div>"
        f"<script>{_JS}</script></body></html>"
    )


def write_dashboard(
    spark: SparkSession,
    out_dir: str,
    dashboard_path: str,
    projection: DataFrame | None = None,
) -> str:
    """Load a pipeline run's exports (visualization.load_results),
    aggregate, render, write. Returns the path written."""
    from .visualization import load_results

    res = load_results(spark, out_dir)
    panels = dashboard_panels(
        res["cluster_results"],
        res["cluster_report"],
        res["utterances"],
        projection=projection,
    )
    html_doc = render_dashboard_html(panels)
    with open(dashboard_path, "w", encoding="utf-8") as fh:
        fh.write(html_doc)
    return dashboard_path


def dashboard_summary_json(panels: dict[str, Any]) -> str:
    """Machine-readable sidecar (the reference exports metadata JSON
    next to the app): headline numbers + per-cluster sizes."""
    t = panels["totals"]
    return json.dumps(
        {
            "total_cases": t["n_cases"],
            "clusters_found": t["n_clusters"],
            "total_tokens": t["total_tokens"],
            "avg_tokens_per_case": t["avg_tokens"],
            "cluster_sizes": {str(c): n for c, n in panels["sizes"]},
        },
        sort_keys=True,
    )
