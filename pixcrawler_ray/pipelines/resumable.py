"""The deployable flagship: checkpointed, resumable crawl with lineage.

Composition of the whole engine (reference:
``backend/services/dataset_processing_pipeline.py:178-579`` DAG +
``builder/progress.py`` resume), Ray-Data-first:

1. decide the resume mode from the manifest:
   - CRASH RESUME (an epoch has committed partitions but no
     ``epoch_complete`` marker): rerun the SAME epoch with NO seen filter —
     committed partitions are skipped at write time, so the resumed output is
     byte-identical to an uninterrupted run (filtering the frontier instead
     would change which row wins the global content dedup / budget).
   - NEW EPOCH (all prior epochs complete): replay the checkpointed ``seen``
     deltas into sharded bloom+exact actors and anti-join the frontier — the
     incremental-crawl path (membership vs prior epochs is order-independent,
     so one pass is exact).
2. crawl (multi-generation) with quarantine capture (audit trail of every
   rejected row, the ``validator/validation.py:129-149`` analog)
3. write extracted output as atomically-committed partitions with
   per-partition lineage rows and seen deltas (``state/checkpoint.py``),
   then mark the epoch complete
4. label projection + category index + report rendering

A re-run against the same ``out_dir`` skips committed partitions and never
re-admits a checkpointed url — byte-exact resume (tests/test_resume.py,
tests/test_resumable_pipeline.py).
"""

from __future__ import annotations

import os
import time

from pixcrawler_ray.pipelines import crawl as crawl_mod
from pixcrawler_ray.pipelines import labels as labels_mod
from pixcrawler_ray.state import checkpoint, metrics
from pixcrawler_ray.stages.expand import CrawlConfig
from pixcrawler_ray.stages.seen import (
    kill_seen_shards,
    load_seen_shards,
    start_seen_shards,
)


def resume_state(out_dir: str) -> tuple[int, bool]:
    """(epoch_to_run, crash_resume) from the manifest.

    crash_resume is True when the latest epoch has committed partitions but
    no ``epoch_complete`` marker — rerun that epoch without a seen filter.
    """
    manifest = checkpoint.read_manifest(out_dir)
    extracted_epochs = {m["epoch"] for m in manifest
                        if m.get("stage") == "extracted"}
    complete_epochs = {m["epoch"] for m in manifest
                       if m.get("stage") == "epoch_complete"}
    partial = sorted(extracted_epochs - complete_epochs)
    if partial:
        return partial[-1], True
    if complete_epochs:
        return max(complete_epochs) + 1, False
    return 0, False


def resumable_crawl(config: CrawlConfig, sf_dir: str, out_dir: str,
                    num_partitions: int = 8, num_seen_shards: int = 4,
                    budget_per_round: int = 8, epoch: int | None = None,
                    write_labels: bool = True,
                    fail_after: int | None = None) -> dict:
    """Run (or resume) the crawl into ``out_dir``. Returns a summary dict."""
    os.makedirs(out_dir, exist_ok=True)
    mc = metrics.MetricsCollector()
    t0 = time.time()

    auto_epoch, crash_resume = resume_state(out_dir)
    epoch = auto_epoch if epoch is None else epoch
    shards = None
    prior_rows = 0
    if not crash_resume and epoch > 0:
        # new-epoch incremental crawl: anti-join vs ALL prior epochs
        prior = checkpoint.load_seen_from_checkpoint(out_dir)
        prior_rows = prior.num_rows
        if prior_rows:
            shards = start_seen_shards(num_seen_shards,
                                       capacity_per_shard=max(
                                           1_000_000, prior_rows))
            load_seen_shards(shards, prior)
    mc.record("seen_replay", prior_rows, prior_rows,
              wall_s=round(time.time() - t0, 4), epoch=epoch)

    try:
        t1 = time.time()
        extracted, failed = crawl_mod.run_crawl(
            config, sf_dir, budget_per_round=budget_per_round,
            seen_shards=shards, with_failed=True)
        rows = checkpoint.write_partitioned(extracted, out_dir,
                                            num_partitions=num_partitions,
                                            epoch=epoch,
                                            fail_after=fail_after)
        total_rows = sum(r["rows"] for r in rows)
        mc.record("crawl_extract_write", -1, total_rows,
                  wall_s=round(time.time() - t1, 4), epoch=epoch)

        # quarantine trail: every rejected row with its audit reason
        # (403/404/415 fetch failures, 422 invalid extracts, 503 exhausted
        # retries) — the CheckManager quarantine analog
        tq = time.time()
        qdir = os.path.join(out_dir, "quarantine", f"epoch={epoch}")
        import shutil
        shutil.rmtree(qdir, ignore_errors=True)
        os.makedirs(qdir, exist_ok=True)
        failed.write_parquet(qdir)
        n_quarantined = checkpoint.read_quarantine(out_dir, epoch).num_rows
        mc.record("quarantine", -1, n_quarantined,
                  wall_s=round(time.time() - tq, 4), epoch=epoch)

        checkpoint.mark_epoch_complete(out_dir, epoch)
    finally:
        kill_seen_shards(shards)

    manifest = checkpoint.read_manifest(out_dir)
    # lazy dataset over the committed partitions — the driver never holds
    # row data (round-2 finding #2: checkpoint.read_output concatenated
    # every partition into one driver pa.Table, twice)
    part_files = sorted({
        os.path.join(out_dir, f"part={m['partition']}", "data.parquet")
        for m in manifest if m.get("stage") == "extracted"})
    part_files = [p for p in part_files if os.path.exists(p)]

    label_paths: list[str] = []
    meta: dict = {}
    kw_downloads: dict[str, int] = {}
    if part_files:
        import ray.data as rd
        out_ds = rd.read_parquet(part_files)
        # per-keyword downloads for the report (A1 analog): distributed
        # groupby, one small row per keyword reaches the driver
        kt = out_ds.select_columns(["keyword"]).groupby("keyword") \
            .count().to_pandas()
        kw_downloads = dict(zip(kt["keyword"], kt["count()"].astype(int)))
        if write_labels and config.generate_labels:
            t2 = time.time()
            # ONE label projection, pinned in the object store (post-budget,
            # bounded by keywords x max_images) and reused by every format
            # sink + the metadata pass
            lab = labels_mod.label_projection(out_ds).materialize()
            label_paths = labels_mod.write_labels(
                lab, os.path.join(out_dir, "labels"),
                formats=("parquet", "csv"))
            meta = labels_mod.dataset_metadata(
                lab, config.dataset_name, "parquet")
            mc.record("labels", total_rows, total_rows,
                      wall_s=round(time.time() - t2, 4), epoch=epoch)

    # per-keyword failure breakdown from the quarantine trail (the
    # reference report's keywords/errors sections,
    # utility/report_generator.py:29-352) — the quarantine table is tiny
    qt = checkpoint.read_quarantine(out_dir)
    report = metrics.render_report(mc.table(), manifest, config.dataset_name,
                                   kw_downloads=kw_downloads,
                                   quarantine=qt)
    with open(os.path.join(out_dir, "REPORT.md"), "w") as f:
        f.write(report)
    # A8 quality score (dataset_processing_pipeline.py:536-559):
    # unique committed rows over all TERMINAL rows (unique + quarantined).
    # Duplicate drops are budget-refunded upstream, so they appear in
    # neither numerator nor denominator (documented deviation from the
    # reference's in-process crawled counter).
    crawled = sum(m["rows"] for m in manifest
                  if m.get("stage") == "extracted")
    attempted = crawled + n_quarantined
    quality_score = round(100.0 * crawled / attempted, 3) if attempted else 0.0
    return {
        "epoch": epoch,
        "crash_resume": crash_resume,
        "partitions_committed": len(rows),
        "rows": total_rows,
        "total_rows": crawled,
        "quarantined": n_quarantined,
        "quality_score": quality_score,
        "label_paths": label_paths,
        "dataset_metadata": meta,
        "report_path": os.path.join(out_dir, "REPORT.md"),
        "wall_s": round(time.time() - t0, 3),
    }
