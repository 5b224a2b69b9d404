"""Resumable text-curation pipeline — the corpus analog of
``pipelines.resumable.resumable_crawl``: read documents -> fused curation
gate (quality + repetition + lang agreement) -> exact keep-first dedup ->
partitioned atomic checkpoint write, resumable mid-write.

Reuses the crawl's distributed partition writer verbatim
(``state.checkpoint.write_partitioned``: staging-dir rename commits, a
manifest with per-partition lineage, crash leaves a clean prefix) by
projecting documents onto its (keyword, seq) contract — ``lang`` is the
partition key (a curation run shards by corpus slice exactly like the crawl
shards by keyword) and ``doc_id`` the deterministic order column. At 100 TB
this is THE shape of a curation sweep: signals fused in one pass, one
dedup shuffle, output committed partition-by-partition so a preempted job
skips finished shards on restart.
"""

from __future__ import annotations

import pyarrow as pa


def curated_dataset(sf_dir: str):
    """Curation gate + exact dedup, as a lazy Dataset of survivors with the
    checkpoint writer's (keyword, seq, url, text) contract."""
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.dedup import _md5_hexdigests
    from pixcrawler_ray.stages.shuffle import keep_first_by
    from pixcrawler_ray.stages.textstats import (
        LangId,
        quality_score_batch,
        repetition_stats_batch,
    )

    import numpy as np

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    langid = LangId()

    def gate(t: pa.Table) -> pa.Table:
        q = quality_score_batch(t.select(["doc_id", "text"]))
        r = repetition_stats_batch(t.select(["doc_id", "text"]))
        p = langid(t)
        keep = (q.column("quality_ok").to_numpy(zero_copy_only=False)
                & r.column("rep_ok").to_numpy(zero_copy_only=False)
                & (np.asarray(p.column("lang_pred").to_pylist())
                   == np.asarray(p.column("lang").to_pylist())))
        kept = t.filter(pa.array(keep))
        md5 = _md5_hexdigests([x or ""
                               for x in kept.column("text").to_pylist()])
        return pa.table({
            "keyword": kept.column("lang"),       # partition key contract
            "seq": kept.column("doc_id"),         # deterministic order
            "url": pa.array(md5, type=pa.string()),  # dedup key doubles as
            "text": kept.column("text"),             # the lineage id
        })

    gated = ds.map_batches(gate, batch_format="pyarrow")
    return keep_first_by(gated, ["url"], "seq", num_buckets=16)


def resumable_curation(sf_dir: str, out_dir: str, num_partitions: int = 4,
                       fail_after: int | None = None):
    """Run the curation sweep with atomic partitioned commits; rerun after a
    crash to finish only the missing partitions (byte-identical output —
    asserted in tests)."""
    from pixcrawler_ray.state import checkpoint

    ds = curated_dataset(sf_dir)
    rows = checkpoint.write_partitioned(ds, out_dir,
                                        num_partitions=num_partitions,
                                        fail_after=fail_after)
    checkpoint.mark_epoch_complete(out_dir, 0)
    return rows
