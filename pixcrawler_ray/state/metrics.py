"""ST4/A6 — per-stage metrics rows + crawl report rendering.

Reference: ``DatasetTracker`` counters (``builder/_helpers.py:55-125``),
``EngineProcessor.engine_stats`` (``builder/_engine.py:112-194``) and the
markdown ``ReportGenerator`` (``utility/report_generator.py:29-352``). The
rebuild's trail is a small Arrow ``metrics`` table assembled from per-stage
row counts plus the checkpoint manifest, rendered to REPORT.md driver-side.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyarrow as pa

METRICS_SCHEMA = pa.schema([
    ("partition", pa.int32()),
    ("stage", pa.string()),
    ("rows_in", pa.int64()),
    ("rows_out", pa.int64()),
    ("bytes", pa.int64()),
    ("wall_s", pa.float64()),
    ("checkpoint_epoch", pa.int32()),
])


@dataclass
class MetricsCollector:
    """Driver-side accumulation of stage metrics (tiny table)."""

    rows: list[dict] = field(default_factory=list)

    def record(self, stage: str, rows_in: int, rows_out: int,
               bytes_: int = 0, wall_s: float = 0.0, partition: int = -1,
               epoch: int = 0) -> None:
        self.rows.append({
            "partition": partition, "stage": stage, "rows_in": rows_in,
            "rows_out": rows_out, "bytes": bytes_, "wall_s": wall_s,
            "checkpoint_epoch": epoch,
        })

    def timed(self, stage: str, fn, rows_in: int = -1):
        t0 = time.time()
        result = fn()
        n = result if isinstance(result, int) else -1
        self.record(stage, rows_in, n, wall_s=round(time.time() - t0, 4))
        return result

    def table(self) -> pa.Table:
        if not self.rows:
            return pa.table({f.name: pa.array([], type=f.type)
                             for f in METRICS_SCHEMA})
        cols = {f.name: [r[f.name] for r in self.rows]
                for f in METRICS_SCHEMA}
        return pa.table(cols, schema=METRICS_SCHEMA)


def render_report(metrics_table: pa.Table, manifest_rows: list[dict],
                  dataset_name: str, kw_downloads: dict | None = None,
                  quarantine: pa.Table | None = None) -> str:
    """S8 — markdown report (summary / keywords / downloads / errors /
    partitions sections, the shape of utility/report_generator.py:29-352).

    ``kw_downloads``: {keyword: committed rows} (one small row per keyword).
    ``quarantine``: the audit-trail table (url, keyword, status, reason) —
    rendered as the per-keyword failure breakdown + error-reason totals.
    """
    lines = [f"# Crawl report — {dataset_name}", ""]
    lines.append("## Stage summary")
    lines.append("| stage | rows_in | rows_out | wall_s |")
    lines.append("|---|---|---|---|")
    df = metrics_table.to_pandas()
    for _, r in df.iterrows():
        lines.append(f"| {r.stage} | {r.rows_in} | {r.rows_out} | "
                     f"{r.wall_s:.3f} |")
    lines.append("")
    if kw_downloads is not None or quarantine is not None:
        # per-keyword failures from the quarantine trail
        kw_fail: dict[str, int] = {}
        reason_counts: dict[str, int] = {}
        if quarantine is not None and quarantine.num_rows:
            qdf = quarantine.to_pandas()
            if "keyword" in qdf.columns:
                kw_fail = qdf.groupby("keyword").size().to_dict()
            if "reason" in qdf.columns:
                reason_counts = qdf.groupby("reason").size().to_dict()
        lines.append("## Keywords")
        lines.append("| keyword | downloads | failures |")
        lines.append("|---|---|---|")
        kws = sorted(set(kw_downloads or {}) | set(kw_fail))
        for kw in kws:
            lines.append(f"| {kw} | {(kw_downloads or {}).get(kw, 0)} | "
                         f"{kw_fail.get(kw, 0)} |")
        lines.append("")
        lines.append("## Errors")
        lines.append("| reason | count |")
        lines.append("|---|---|")
        for reason in sorted(reason_counts):
            lines.append(f"| {reason} | {reason_counts[reason]} |")
        lines.append("")
    lines.append("## Committed partitions")
    lines.append("| partition | epoch | rows | bytes | wall_s |")
    lines.append("|---|---|---|---|---|")
    for m in manifest_rows:
        lines.append(f"| {m['partition']} | {m['epoch']} | {m['rows']} | "
                     f"{m['bytes']} | {m['wall_s']} |")
    lines.append("")
    return "\n".join(lines)
