"""The deployable flagship: checkpointed, resumable crawl with lineage.

Composition of the whole engine (reference:
``backend/services/dataset_processing_pipeline.py:178-579`` DAG +
``builder/progress.py`` resume), Ray-Data-first:

1. replay the checkpointed ``seen`` deltas into sharded bloom+exact actors
2. crawl (multi-generation) with the seen anti-join filtering the frontier
3. write extracted output as atomically-committed partitions with
   per-partition lineage rows and seen deltas (``state/checkpoint.py``)
4. label projection + category index + report rendering

A re-run against the same ``out_dir`` skips committed partitions and never
re-admits a checkpointed url — byte-exact resume (tests/test_resume.py).
"""

from __future__ import annotations

import os
import time

from pixcrawler_ray.pipelines import crawl as crawl_mod
from pixcrawler_ray.pipelines import labels as labels_mod
from pixcrawler_ray.state import checkpoint, metrics
from pixcrawler_ray.stages.expand import CrawlConfig
from pixcrawler_ray.stages.seen import load_seen_shards, start_seen_shards


def resumable_crawl(config: CrawlConfig, sf_dir: str, out_dir: str,
                    num_partitions: int = 8, num_seen_shards: int = 4,
                    budget_per_round: int = 8, epoch: int | None = None,
                    write_labels: bool = True,
                    fail_after: int | None = None) -> dict:
    """Run (or resume) the crawl into ``out_dir``. Returns a summary dict."""
    os.makedirs(out_dir, exist_ok=True)
    mc = metrics.MetricsCollector()
    t0 = time.time()

    prior = checkpoint.load_seen_from_checkpoint(out_dir)
    epoch = (int(prior.column("epoch").to_numpy().max()) + 1
             if prior.num_rows else 0) if epoch is None else epoch
    shards = None
    if prior.num_rows:
        shards = start_seen_shards(num_seen_shards,
                                   capacity_per_shard=max(
                                       1_000_000, prior.num_rows))
        load_seen_shards(shards, prior)
    mc.record("seen_replay", prior.num_rows, prior.num_rows,
              wall_s=round(time.time() - t0, 4), epoch=epoch)

    t1 = time.time()
    extracted = crawl_mod.run_crawl(config, sf_dir,
                                    budget_per_round=budget_per_round,
                                    seen_shards=shards)
    rows = checkpoint.write_partitioned(extracted, out_dir,
                                        num_partitions=num_partitions,
                                        epoch=epoch, fail_after=fail_after)
    total_rows = sum(r["rows"] for r in rows)
    mc.record("crawl_extract_write", -1, total_rows,
              wall_s=round(time.time() - t1, 4), epoch=epoch)

    label_paths: list[str] = []
    meta: dict = {}
    if write_labels and config.generate_labels:
        t2 = time.time()
        out_table = checkpoint.read_output(out_dir)
        if out_table is not None and out_table.num_rows:
            import ray.data as rd
            lab = labels_mod.label_projection(rd.from_arrow(out_table))
            label_paths = labels_mod.write_labels(
                lab, os.path.join(out_dir, "labels"),
                formats=("parquet", "csv"))
            meta = labels_mod.dataset_metadata(
                labels_mod.label_projection(rd.from_arrow(out_table)),
                config.dataset_name, "parquet")
        mc.record("labels", total_rows, total_rows,
                  wall_s=round(time.time() - t2, 4), epoch=epoch)

    manifest = checkpoint.read_manifest(out_dir)
    report = metrics.render_report(mc.table(), manifest, config.dataset_name)
    with open(os.path.join(out_dir, "REPORT.md"), "w") as f:
        f.write(report)
    # A8 quality score: unique/crawled ratio
    # (dataset_processing_pipeline.py:536-559)
    crawled = sum(m["rows"] for m in manifest)
    return {
        "epoch": epoch,
        "partitions_committed": len(rows),
        "rows": total_rows,
        "total_rows": crawled,
        "label_paths": label_paths,
        "dataset_metadata": meta,
        "report_path": os.path.join(out_dir, "REPORT.md"),
        "wall_s": round(time.time() - t0, 3),
    }
