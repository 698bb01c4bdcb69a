"""Single-run HTML report over the metrics parquet — the reference's
reporter (framework/metrics/reporter.py:126-1313: data funnel, Sankey flow,
latency heatmap, bottleneck callout, detail tables) re-expressed as a
dependency-free generator: inline SVG instead of plotly, reading the
run/stage/operator parquet written by metrics.write_metrics. Report
generation is driver-side pandas over tiny frames — never a Spark job per
visual.

Reference sections with no Spark equivalent are documented out rather than
faked: the stage-duration timeline and latency-percentile heatmap
(reporter.py:908-946, 1014-1055) need per-record latencies that a fused
whole-stage-codegen plan never observes; the pass-rate heatmap and record
waterfall carry the same diagnostic role from count metrics.
"""

from __future__ import annotations

import html
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# palette: sequential blue for magnitude, status red for rejected flow;
# both validated (CVD + contrast) on light and dark surfaces. Text always
# wears ink tokens, never a series color.
_CSS = """
:root{color-scheme:light dark;
 --surface:#fcfcfb;--ink:#0b0b0b;--ink-2:#52514e;--grid:#e4e3df;
 --keep:#2a78d6;--keep-soft:#86b6ef;--reject:#e34948;
 --ramp-0:#cde2fb;--ramp-1:#9ec5f4;--ramp-2:#6da7ec;--ramp-3:#3987e5;
 --ramp-4:#256abf;--ramp-5:#184f95;--ramp-6:#0d366b}
@media (prefers-color-scheme: dark){:root{
 --surface:#1a1a19;--ink:#ffffff;--ink-2:#c3c2b7;--grid:#383835;
 --keep:#3987e5;--keep-soft:#1c5cab;--reject:#e66767}}
body{font-family:system-ui,sans-serif;margin:2rem;color:var(--ink);background:var(--surface)}
h1,h2{font-weight:600} h2{margin-top:2rem}
table{border-collapse:collapse;margin:1rem 0}
td,th{border:1px solid var(--grid);padding:.35rem .6rem;text-align:right;font-variant-numeric:tabular-nums}
th{background:color-mix(in srgb,var(--grid) 40%,var(--surface))}
td:first-child,th:first-child,td:nth-child(2),th:nth-child(2){text-align:left}
.lowpass{color:var(--reject);font-weight:600}
.tiles{display:flex;gap:1.5rem;flex-wrap:wrap;margin:1rem 0}
.tile{border:1px solid var(--grid);border-radius:8px;padding:.8rem 1.2rem;min-width:9rem}
.tile .v{font-size:1.6rem;font-weight:650} .tile .l{color:var(--ink-2);font-size:.85rem}
.legend{color:var(--ink-2);font-size:.85rem;margin:.25rem 0}
.swatch{display:inline-block;width:.8rem;height:.8rem;border-radius:3px;vertical-align:-2px;margin:0 .3rem 0 .8rem}
svg text{font-family:system-ui,sans-serif}
"""

_RAMP = 7  # --ramp-0 .. --ramp-6


def _esc(s) -> str:
    return html.escape(str(s))


def _stat_tiles(run) -> str:
    tiles = [
        (f"{run['duration_sec']:.2f}s", "wall clock"),
        (f"{run['input_records']:,}", "records in"),
        (f"{run['output_records']:,}", "records out"),
        (f"{run['pass_rate']:.2f}%", "overall pass rate"),
    ]
    if run["throughput_rps"]:
        tiles.append((f"{run['throughput_rps']:,.0f}/s", "throughput"))
    return '<div class="tiles">' + "".join(
        f'<div class="tile"><div class="v">{_esc(v)}</div><div class="l">{_esc(label)}</div></div>'
        for v, label in tiles
    ) + "</div>"


def _funnel_svg(ops, total_in: int) -> str:
    """Horizontal funnel: one bar per operator, width = surviving records.
    Single series (kept records) -> no legend; direct labels on each bar;
    native <title> tooltips carry exact counts."""
    if not ops:
        return ""
    bar_h, gap, left, width = 22, 6, 230, 420
    h = len(ops) * (bar_h + gap) + 10
    rows = []
    for i, m in enumerate(ops):
        y = 5 + i * (bar_h + gap)
        w = max(2, int(width * m["output_records"] / total_in)) if total_in else 2
        label = f"{m['stage_name']} / {m['operator_name']}"
        tip = f"{label}: {m['input_records']:,} in → {m['output_records']:,} out ({m['pass_rate']:.2f}% pass)"
        rows.append(
            f'<g><title>{_esc(tip)}</title>'
            f'<text x="{left - 8}" y="{y + 15}" text-anchor="end" font-size="12" fill="var(--ink-2)">{_esc(label[:34])}</text>'
            f'<rect x="{left}" y="{y}" width="{w}" height="{bar_h}" rx="4" fill="var(--keep)"/>'
            f'<text x="{left + w + 6}" y="{y + 15}" font-size="12" fill="var(--ink)">{m["output_records"]:,}</text>'
            f"</g>"
        )
    return (
        f'<svg role="img" aria-label="operator funnel" viewBox="0 0 760 {h}" width="760" height="{h}">'
        + "".join(rows)
        + "</svg>"
    )


def _sankey_svg(ops, total_in: int) -> str:
    """Record-flow ribbon (the reference Sankey's job, reporter.py:753-905):
    the kept band flows left->right through every operator; each operator
    peels its rejected share downward. Two flows -> legend + direct labels."""
    if not ops or not total_in:
        return ""
    n = len(ops)
    col_w, band_x0, top, max_h = max(90, 660 // max(n, 1)), 10, 20, 120
    h = top + max_h + 70
    parts = []
    x = band_x0
    in_rec = total_in
    for m in ops:
        out_rec = m["output_records"]
        in_h = max(2, int(max_h * in_rec / total_in))
        out_h = max(2, int(max_h * out_rec / total_in)) if out_rec else 0
        rej = in_rec - out_rec
        # kept ribbon segment: tapers from in_h to out_h across the column
        x1 = x + col_w - 14
        parts.append(
            f'<g><title>{_esc(m["operator_name"])}: keep {out_rec:,} / reject {rej:,}</title>'
            f'<path d="M{x},{top} L{x1},{top} L{x1},{top + out_h} L{x},{top + in_h} Z" fill="var(--keep)" opacity="0.85"/>'
        )
        if rej > 0:
            rej_h = max(2, in_h - out_h)
            ry = top + max_h + 8
            parts.append(
                f'<path d="M{x1 - 26},{top + out_h} L{x1},{top + out_h} L{x1},{top + out_h + rej_h} L{x1 - 26},{top + in_h} Z"'
                f' fill="var(--reject)" opacity="0.8"/>'
                f'<rect x="{x1 - 26}" y="{ry}" width="26" height="{max(3, rej_h)}" rx="2" fill="var(--reject)"/>'
                f'<text x="{x1 - 30}" y="{ry + 11}" text-anchor="end" font-size="11" fill="var(--ink-2)">-{rej:,}</text>'
            )
        parts.append(
            f'<text x="{x + 2}" y="{top + max_h + 48}" font-size="11" fill="var(--ink-2)" '
            f'transform="rotate(-18 {x + 2} {top + max_h + 48})">{_esc(m["operator_name"][:18])}</text></g>'
        )
        x += col_w
        in_rec = out_rec
    parts.append(
        f'<text x="{band_x0}" y="{top - 6}" font-size="11" fill="var(--ink-2)">{total_in:,} in</text>'
        f'<text x="{x + 4}" y="{top + 14}" font-size="11" fill="var(--ink)">{in_rec:,} kept</text>'
    )
    # width scales with operator count: at 9+ operators a fixed 760 box
    # clipped the last columns and the terminal kept-label (SVG overflow
    # is hidden by default)
    svg_w = max(760, x + 90)
    return (
        '<div class="legend">flow:<span class="swatch" style="background:var(--keep)"></span>kept'
        '<span class="swatch" style="background:var(--reject)"></span>rejected</div>'
        f'<svg role="img" aria-label="record flow" viewBox="0 0 {svg_w} {h}" width="{svg_w}" height="{h}">'
        + "".join(parts)
        + "</svg>"
    )


def _heatmap_svg(ops) -> str:
    """Pass-rate heatmap, stage x operator (count-metric stand-in for the
    reference latency heatmap, reporter.py:1014-1055). Sequential blue,
    dark = high pass rate; every cell direct-labeled so color is never the
    only encoding."""
    if not ops:
        return ""
    stages = list(dict.fromkeys(m["stage_name"] for m in ops))
    # label duplicates (two instances of one operator class in a stage)
    # with an index suffix — a dict keyed on the bare name silently kept
    # only the LAST instance's pass rate
    seen: dict[str, int] = {}
    labels = []
    for m in ops:
        name = m["operator_name"]
        seen[name] = seen.get(name, 0) + 1
        labels.append(f"{name} #{seen[name]}" if seen[name] > 1 else name)
    op_names = list(dict.fromkeys(labels))
    cell = {(m["stage_name"], lbl): m["pass_rate"] for m, lbl in zip(ops, labels)}
    cw, ch, left, top = 86, 26, 180, 28
    w, h = left + cw * len(op_names) + 10, top + ch * len(stages) + 10
    parts = [
        f'<text x="{left + i * cw + cw / 2}" y="{top - 8}" text-anchor="middle" font-size="11" '
        f'fill="var(--ink-2)">{_esc(o[:12])}</text>'
        for i, o in enumerate(op_names)
    ]
    for r, s in enumerate(stages):
        y = top + r * ch
        parts.append(
            f'<text x="{left - 6}" y="{y + 17}" text-anchor="end" font-size="11" fill="var(--ink-2)">{_esc(s[:26])}</text>'
        )
        for i, o in enumerate(op_names):
            pr = cell.get((s, o))
            if pr is None:
                continue
            step = min(_RAMP - 1, int(pr / 100.0 * _RAMP))
            ink = "var(--ink)" if step < 3 else "#ffffff"
            xx = left + i * cw
            parts.append(
                f'<g><title>{_esc(s)} / {_esc(o)}: {pr:.2f}% pass</title>'
                f'<rect x="{xx + 1}" y="{y + 1}" width="{cw - 2}" height="{ch - 2}" rx="3" fill="var(--ramp-{step})"/>'
                f'<text x="{xx + cw / 2}" y="{y + 17}" text-anchor="middle" font-size="11" fill="{ink}">{pr:.1f}%</text></g>'
            )
    return (
        f'<svg role="img" aria-label="pass-rate heatmap" viewBox="0 0 {w} {h}" width="{w}" height="{h}">'
        + "".join(parts)
        + "</svg>"
    )


_SAMPLE_N = 5
_SAMPLE_CELL_CHARS = 80


def _sample_tables(spark: SparkSession, rejected_path: str, operators: list[str], run_id: str | None = None) -> str:
    """Debug sample rows per rejecting operator (the reference reporter's
    rejected-sample tables, framework/metrics/reporter.py:126-1313).

    The rejected sink is hive-partitioned by ``operator``, so each
    operator's samples are one partition-pruned scan + LIMIT — a per-
    partition take, never a sort or full scan of the rejected data. Cells
    are truncated driver-side; only N rows per operator ever reach the
    driver."""
    from pyspark.errors import AnalysisException

    # Resolve the rejected sink ONCE: a missing/never-written path is the
    # expected skip case; anything else (schema mismatch, permissions) must
    # surface, not render as "no samples".
    try:
        rejected = spark.read.parquet(rejected_path)
    except AnalysisException:  # no rejected sink written for this run
        return ""
    # scope to THIS run when the sink carries run_id (the sink is append-
    # mode, so a shared path accumulates rows from earlier runs and the
    # single-run report would show stale samples)
    if run_id is not None and "run_id" in rejected.columns:
        rejected = rejected.filter(F.col("run_id") == run_id)
    sections = []
    for op in operators:
        rows = rejected.filter(F.col("operator") == op).limit(_SAMPLE_N).collect()
        if not rows:
            continue
        cols = [c for c in rows[0].asDict() if c != "_rejection_details"]
        detail_cols = ["reason", "dedup_key", "representative_id"]

        def cell(v):
            s = "" if v is None else str(v)
            return _esc(s[:_SAMPLE_CELL_CHARS] + ("…" if len(s) > _SAMPLE_CELL_CHARS else ""))

        head = "".join(f"<th>{_esc(c)}</th>" for c in detail_cols + cols)
        body = []
        for r in rows:
            d = r["_rejection_details"]
            det = [d[c] if d else None for c in detail_cols]
            body.append(
                "<tr>" + "".join(f"<td>{cell(v)}</td>" for v in det + [r[c] for c in cols]) + "</tr>"
            )
        sections.append(
            f"<h3>{_esc(op)}</h3><table><tr>{head}</tr>" + "\n".join(body) + "</table>"
        )
    if not sections:
        return ""
    return "<h2>Rejected samples</h2>" + "".join(sections)


def generate_report(
    spark: SparkSession, metrics_path: str, run_id: str | None = None, *, rejected_path: str | None = None
) -> str:
    """Render the HTML report for ``run_id`` (default: latest run) from the
    metrics parquet at ``metrics_path``. Returns the HTML string. With
    ``rejected_path`` (the pipeline's rejected sink), embeds up to
    ``_SAMPLE_N`` sample rows per rejecting operator."""
    runs = spark.read.parquet(os.path.join(metrics_path, "runs"))
    if run_id is None:
        latest = runs.orderBy(F.col("timestamp").desc()).first()
        if latest is None:
            raise ValueError(f"no runs recorded in {metrics_path}/runs")
        run_id = latest["run_id"]
    run = runs.filter(F.col("run_id") == run_id).first()
    if run is None:
        raise ValueError(f"run_id {run_id!r} not found in {metrics_path}/runs")
    ops_df = spark.read.parquet(os.path.join(metrics_path, "operators")).filter(
        F.col("run_id") == run_id
    )
    # explicit pipeline order: parquet read-back is file-order; fall back
    # to funnel monotonicity (input desc) for pre-`position` metrics
    order = (
        [F.col("position").asc()]
        if "position" in ops_df.columns
        else [F.col("input_records").desc()]
    )
    ops = ops_df.orderBy(*order).collect()
    stages_df = spark.read.parquet(os.path.join(metrics_path, "stages")).filter(
        F.col("run_id") == run_id
    )
    stage_order = (
        [F.col("position").asc()] if "position" in stages_df.columns else [F.col("stage_name").asc()]
    )
    stages = stages_df.orderBy(*stage_order).collect()

    total_in = run["input_records"] or 1
    bottleneck = min(ops, key=lambda m: m["pass_rate"]) if ops else None

    def _op_rows():
        out = []
        for m in ops:
            cls = ' class="lowpass"' if m["pass_rate"] < 50 else ""
            out.append(
                f"<tr><td>{_esc(m['stage_name'])}</td><td>{_esc(m['operator_name'])}</td>"
                f"<td>{m['input_records']:,}</td><td>{m['output_records']:,}</td>"
                f"<td{cls}>{m['pass_rate']:.2f}%</td></tr>"
            )
        return "\n".join(out)

    stage_rows = "\n".join(
        f"<tr><td>{_esc(s['stage_name'])}</td><td></td><td>{s['input_records']:,}</td>"
        f"<td>{s['output_records']:,}</td><td>{s['pass_rate']:.2f}%</td></tr>"
        for s in stages
    )

    bn = (
        f"<p><b>Bottleneck (lowest pass rate):</b> {_esc(bottleneck['operator_name'])} "
        f"({bottleneck['pass_rate']:.2f}% pass)</p>"
        if bottleneck
        else ""
    )
    samples = (
        _sample_tables(spark, rejected_path, [m["operator_name"] for m in ops], run_id)
        if rejected_path
        else ""
    )
    # optional fourth/fifth levels: stores (incremental-dedup state per
    # run/compaction) and triggers (streaming per-micro-batch telemetry) —
    # rendered when their parquet exists; absence is not an error (batch
    # pipelines without incremental dedup or streaming write neither)
    extra = (
        _store_section(spark, metrics_path)
        + _trigger_section(spark, metrics_path)
        + _telemetry_health_section(spark, metrics_path)
    )
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>Run {_esc(run_id)}</title><style>{_CSS}</style></head><body>
<h1>Pipeline run {_esc(run['pipeline'])} / {_esc(run_id)}</h1>
{_stat_tiles(run)}
{bn}
<h2>Data funnel</h2>
{_funnel_svg(ops, total_in)}
<h2>Record flow</h2>
{_sankey_svg(ops, total_in)}
<h2>Pass-rate heatmap</h2>
{_heatmap_svg(ops)}
<h2>Operators</h2>
<table><tr><th>stage</th><th>operator</th><th>in</th><th>out</th><th>pass</th></tr>
{_op_rows()}
</table>
<h2>Stages</h2>
<table><tr><th>stage</th><th></th><th>in</th><th>out</th><th>pass</th></tr>
{stage_rows}
</table>
{samples}
{extra}
<p class="legend">Per-record latency percentiles and stage-duration timeline are
N/A under Spark's vectorized execution (see metrics/__init__.py); counts and
pass rates carry the funnel/bottleneck diagnostics.</p>
</body></html>"""


def _store_section(spark: SparkSession, metrics_path: str) -> str:
    """Incremental dedup store growth (latest 20 events across runs —
    growth is a cross-run story, so this section is deliberately not
    scoped to one run_id)."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(os.path.join(metrics_path, "stores"))
            .orderBy(F.col("timestamp").desc())
            .limit(20)
            .collect()
        )
    except AnalysisException:
        return ""
    if not rows:
        return ""
    body = "\n".join(
        f"<tr><td>{_esc(r['event'])}</td><td>{_esc(r['operator_name'])}</td>"
        f"<td>{_esc(r['store_path'])}</td><td>{r['rows']:,}</td><td>{r['files']:,}</td>"
        f"<td>{r['bytes']:,}</td><td>{'' if r['rows_before'] is None else format(r['rows_before'], ',')}</td></tr>"
        for r in rows
    )
    return (
        "<h2>Incremental dedup stores</h2>"
        "<table><tr><th>event</th><th>operator</th><th>store</th><th>rows</th>"
        f"<th>files</th><th>bytes</th><th>rows before compaction</th></tr>{body}</table>"
    )


def _telemetry_health_section(spark: SparkSession, metrics_path: str) -> str:
    """Listener loss counters (latest 20 listener lifetimes). A non-zero
    ``rows_dropped``/``flush_failures``/``rows_pending`` means per-trigger
    telemetry was LOST or delayed — flagged in red so it cannot pass as a
    healthy table (round-9 verdict task #7: a silent non-zero is the next
    invisible-loss bug)."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(os.path.join(metrics_path, "telemetry"))
            .orderBy(F.col("timestamp").desc())
            .limit(20)
            .collect()
        )
    except AnalysisException:
        return ""
    if not rows:
        return ""

    def cell(v: int) -> str:
        return f'<td style="color:#b91c1c;font-weight:bold">{v:,} &#9888;</td>' if v else f"<td>{v:,}</td>"

    body = "\n".join(
        f"<tr><td>{_esc(r['pipeline'])}</td><td>{_esc(r['query_id'])}</td>"
        f"<td>{r['rows_written']:,}</td>{cell(r['flush_failures'])}"
        f"{cell(r['rows_dropped'])}{cell(r['rows_pending'])}</tr>"
        for r in rows
    )
    lost = sum(r["rows_dropped"] + r["rows_pending"] for r in rows)
    warn = (
        f'<p style="color:#b91c1c"><b>{lost:,} trigger-telemetry row(s) were dropped or '
        "left unflushed</b> — the streaming-triggers table above is incomplete for "
        "those runs.</p>"
        if lost
        else ""
    )
    return (
        "<h2>Telemetry health</h2>" + warn +
        "<table><tr><th>pipeline</th><th>query</th><th>rows written</th>"
        f"<th>flush failures</th><th>rows dropped</th><th>rows pending</th></tr>{body}</table>"
    )


def _trigger_section(spark: SparkSession, metrics_path: str) -> str:
    """Streaming per-trigger telemetry (latest 20 micro-batches)."""
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(os.path.join(metrics_path, "triggers"))
            .orderBy(F.col("timestamp").desc())
            .limit(20)
            .collect()
        )
    except AnalysisException:
        return ""
    if not rows:
        return ""
    body = "\n".join(
        f"<tr><td>{_esc(r['pipeline'])}</td><td>{r['batch_id']}</td>"
        f"<td>{r['num_input_rows']:,}</td><td>{r['processed_rows_per_second']:,.0f}</td>"
        f"<td>{r['trigger_execution_ms']:,}</td><td>{r['add_batch_ms']:,}</td></tr>"
        for r in rows
    )
    return (
        "<h2>Streaming triggers</h2>"
        "<table><tr><th>pipeline</th><th>batch</th><th>rows in</th><th>rows/s</th>"
        f"<th>trigger ms</th><th>addBatch ms</th></tr>{body}</table>"
    )


def write_report(
    spark: SparkSession,
    metrics_path: str,
    out_path: str,
    run_id: str | None = None,
    *,
    rejected_path: str | None = None,
) -> str:
    html_text = generate_report(spark, metrics_path, run_id, rejected_path=rejected_path)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html_text)
    return out_path
