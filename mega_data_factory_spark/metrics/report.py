"""Single-run HTML report over the metrics parquet — the reference's
reporter (framework/metrics/reporter.py:126-1313: funnel, per-operator
table, bottleneck callout) re-expressed as a dependency-free generator:
plain HTML/CSS bars instead of plotly, reading the run/stage/operator
parquet written by metrics.write_metrics. Report generation is driver-side
pandas over tiny frames — never a Spark job per visual."""

from __future__ import annotations

import html
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_CSS = """
body{font-family:system-ui,sans-serif;margin:2rem;color:#222}
table{border-collapse:collapse;margin:1rem 0}
td,th{border:1px solid #ccc;padding:.35rem .6rem;text-align:right}
th{background:#f2f2f2}
td:first-child,th:first-child,td:nth-child(2),th:nth-child(2){text-align:left}
.bar{background:#4a7ebb;height:1rem;display:inline-block;vertical-align:middle}
.lowpass{color:#b00}
"""


def generate_report(spark: SparkSession, metrics_path: str, run_id: str | None = None) -> str:
    """Render the HTML report for ``run_id`` (default: latest run) from the
    metrics parquet at ``metrics_path``. Returns the HTML string."""
    runs = spark.read.parquet(os.path.join(metrics_path, "runs"))
    if run_id is None:
        run_id = runs.orderBy(F.col("timestamp").desc()).first()["run_id"]
    run = runs.filter(F.col("run_id") == run_id).first()
    ops = (
        spark.read.parquet(os.path.join(metrics_path, "operators"))
        .filter(F.col("run_id") == run_id)
        .collect()
    )
    stages = (
        spark.read.parquet(os.path.join(metrics_path, "stages"))
        .filter(F.col("run_id") == run_id)
        .collect()
    )

    total_in = run["input_records"] or 1
    bottleneck = min(ops, key=lambda m: m["pass_rate"]) if ops else None

    def _funnel_rows():
        out = []
        for m in ops:
            width = int(260 * (m["output_records"] / total_in)) if total_in else 0
            cls = ' class="lowpass"' if m["pass_rate"] < 50 else ""
            out.append(
                f"<tr><td>{html.escape(m['stage_name'])}</td><td>{html.escape(m['operator_name'])}</td>"
                f"<td>{m['input_records']}</td><td>{m['output_records']}</td>"
                f"<td{cls}>{m['pass_rate']:.2f}%</td>"
                f'<td style="text-align:left"><span class="bar" style="width:{width}px"></span></td></tr>'
            )
        return "\n".join(out)

    stage_rows = "\n".join(
        f"<tr><td>{html.escape(s['stage_name'])}</td><td></td><td>{s['input_records']}</td>"
        f"<td>{s['output_records']}</td><td>{s['pass_rate']:.2f}%</td><td></td></tr>"
        for s in stages
    )

    bn = (
        f"<p><b>Bottleneck (lowest pass rate):</b> {html.escape(bottleneck['operator_name'])} "
        f"({bottleneck['pass_rate']:.2f}% pass)</p>"
        if bottleneck
        else ""
    )
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>Run {run_id}</title><style>{_CSS}</style></head><body>
<h1>Pipeline run {html.escape(run['pipeline'])} / {run_id}</h1>
<p>{run['duration_sec']:.2f}s &middot; {run['input_records']} in &rarr; {run['output_records']} out
&middot; overall pass rate {run['pass_rate']:.2f}%</p>
{bn}
<h2>Operator funnel</h2>
<table><tr><th>stage</th><th>operator</th><th>in</th><th>out</th><th>pass</th><th>funnel</th></tr>
{_funnel_rows()}
</table>
<h2>Stages</h2>
<table><tr><th>stage</th><th></th><th>in</th><th>out</th><th>pass</th><th></th></tr>
{stage_rows}
</table>
</body></html>"""


def write_report(spark: SparkSession, metrics_path: str, out_path: str, run_id: str | None = None) -> str:
    html_text = generate_report(spark, metrics_path, run_id)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html_text)
    return out_path
