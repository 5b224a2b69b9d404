"""S7 — partitioned checkpoint/resume with per-partition lineage + metrics.

Reference resume is the ProgressCache JSON flushed after every (category,
keyword) unit (``builder/progress.py:37-154``; skip logic
``builder/_generator.py:1241-1244``). Rebuild design (SURVEY §4 "Checkpoint /
resume"):

- output is PARTITIONED parquet: ``out/extracted/part={p}/`` where
  ``p = hash(keyword) % num_partitions`` — a failed run reprocesses only
  partitions without a committed manifest.
- each partition commit is ATOMIC: data written to ``_tmp-{p}``, renamed to
  the final dir, then a manifest row
  ``(partition, epoch, rows, bytes, seen_delta_path, wall_s)`` is appended to
  ``manifest.jsonl`` — the lineage/metrics trail (FIXTURES.md ``metrics``).
- the per-partition ``seen`` delta parquet records admitted url hashes so a
  resumed run anti-joins its frontier against ALL prior epochs (bloom+exact
  shard actors, ``stages/seen.py``).

Byte-exactness on resume holds because extraction is deterministic and
attribution is seq-keyed: re-running a partition yields identical bytes
(FIXTURES.md §4.6), verified by ``tests/test_resume.py``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pixcrawler_ray.functions.hashing import hash64_array
from pixcrawler_ray.stages.seen import seen_delta_table

MANIFEST = "manifest.jsonl"
PROGRESS = "progress.jsonl"


def append_progress(out_dir: str, stage: str, rows_done: int,
                    epoch: int = 0, wall_s: float = 0.0, **extra) -> None:
    """Append one heartbeat row to ``progress.jsonl`` — the SSE progress
    stream analog (reference polls job state and emits progress events,
    ``backend/services/crawl_job.py:997-1154``). Rows accumulate DURING the
    run (one per partition commit + one per pipeline stage), so an external
    watcher tailing the file sees a long 100 TB job move; a crashed run's
    trail ends mid-stream, which is itself the resume signal surfaced to
    operators."""
    row = {"ts": round(time.time(), 3), "stage": stage, "epoch": epoch,
           "rows_done": int(rows_done), "wall_s": round(wall_s, 3), **extra}
    with open(os.path.join(out_dir, PROGRESS), "a") as f:
        f.write(json.dumps(row) + "\n")


def read_progress(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, PROGRESS)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def partition_ids(keywords, num_partitions: int) -> np.ndarray:
    """hash(keyword) % P, hashing each UNIQUE keyword once per batch (the
    keyword column is low-cardinality; per-row blake2b would dominate)."""
    if isinstance(keywords, (pa.Array, pa.ChunkedArray)):
        enc = pa.chunked_array([keywords]).combine_chunks() \
            if isinstance(keywords, pa.ChunkedArray) else keywords
        d = enc.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq_h = hash64_array(d.dictionary)
        idx = d.indices.to_numpy(zero_copy_only=False)
        h = uniq_h[idx]
    else:
        h = hash64_array(keywords)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def read_manifest(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def completed_partitions(out_dir: str) -> set[int]:
    return {m["partition"] for m in read_manifest(out_dir)
            if m.get("stage") == "extracted"}


def mark_epoch_complete(out_dir: str, epoch: int) -> None:
    """Append the epoch-complete marker — its absence distinguishes a crash
    resume (rerun same epoch, skip committed partitions, NO seen filter) from
    a new incremental epoch (seen anti-join)."""
    _append_manifest(out_dir, {"partition": -1, "epoch": epoch,
                               "stage": "epoch_complete",
                               "rows": 0, "bytes": 0,
                               "seen_delta_path": "", "wall_s": 0.0})


def read_quarantine(out_dir: str, epoch: int | None = None) -> pa.Table:
    """Read the quarantine trail (one parquet dir per epoch)."""
    import glob
    pat = (os.path.join(out_dir, "quarantine", "epoch=*", "*.parquet")
           if epoch is None else
           os.path.join(out_dir, "quarantine", f"epoch={epoch}", "*.parquet"))
    files = sorted(glob.glob(pat))
    if not files:
        return pa.table({"url": pa.array([], type=pa.string()),
                         "status": pa.array([], type=pa.int32()),
                         "reason": pa.array([], type=pa.string())})
    return pa.concat_tables([pq.read_table(f) for f in files])


def _append_manifest(out_dir: str, row: dict) -> None:
    with open(os.path.join(out_dir, MANIFEST), "a") as f:
        f.write(json.dumps(row) + "\n")


def write_partitioned(extracted_ds, out_dir: str, num_partitions: int = 8,
                      epoch: int = 0, fail_after: int | None = None) -> list[dict]:
    """Write the extracted dataset as committed partitions + lineage rows.

    DISTRIBUTED writer: rows shuffle once on the partition key
    (``groupby(part).map_groups``), each partition task sorts its own rows by
    ``seq`` and writes ``data.parquet`` + ``seen_delta.parquet`` into a
    ``_tmp-part={p}`` staging dir — the driver never holds row data, only the
    tiny per-partition stats table. The COMMIT (staging-dir rename + manifest
    append) runs on the driver in sorted partition order, so a crash leaves a
    clean prefix of committed partitions and ``fail_after`` is deterministic.

    ``fail_after``: test hook — raise after committing N partitions to
    simulate a mid-run crash (FIXTURES.md §4.6 resume test).

    Partition column is keyword-hash so a partition maps to a stable unit of
    reference work (category/keyword), like the ProgressCache key.
    """
    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir)

    def tag(t: pa.Table) -> pa.Table:
        p = partition_ids(t.column("keyword"), num_partitions)
        t = t.append_column("part", pa.array(p, type=pa.int64()))
        if done:   # skip already-committed partitions before the shuffle
            mask = pc.invert(pc.is_in(
                t.column("part"),
                value_set=pa.array(sorted(done), type=pa.int64())))
            t = t.filter(mask)
        return t

    tagged = extracted_ds.map_batches(tag, batch_format="pyarrow")

    def write_tmp(g: pa.Table) -> pa.Table:
        """Write every partition present in this block (hash partitioning
        co-locates each ``part`` wholly in one block, possibly several parts
        per block)."""
        import numpy as np
        import shutil
        out = {"partition": [], "rows": [], "bytes": [], "wall_s": []}
        if g.num_rows:
            parts = g.column("part").to_numpy()
            for p in np.unique(parts):
                t0 = time.time()
                table = (g.filter(pa.array(parts == p))
                         .sort_by([("seq", "ascending")])
                         .drop_columns(["part"]))
                tmp = os.path.join(out_dir, f"_tmp-part={int(p)}")
                shutil.rmtree(tmp, ignore_errors=True)
                os.makedirs(tmp, exist_ok=True)
                pq.write_table(table, os.path.join(tmp, "data.parquet"))
                keys = (table.column("doc_id").to_numpy()
                        if "doc_id" in table.column_names
                        else table.column("url").to_pylist())
                delta = seen_delta_table(keys, epoch, num_partitions)
                pq.write_table(delta, os.path.join(tmp, "seen_delta.parquet"))
                out["partition"].append(int(p))
                out["rows"].append(table.num_rows)
                out["bytes"].append(int(table.nbytes))
                out["wall_s"].append(round(time.time() - t0, 4))
        return pa.table({
            "partition": pa.array(out["partition"], type=pa.int64()),
            "rows": pa.array(out["rows"], type=pa.int64()),
            "bytes": pa.array(out["bytes"], type=pa.int64()),
            "wall_s": pa.array(out["wall_s"], type=pa.float64()),
        })

    from pixcrawler_ray.stages.shuffle import _hash_shuffle_on
    if _hash_shuffle_on():
        part_ds = tagged.repartition(num_partitions, keys=["part"])
        stats_ds = part_ds.map_batches(write_tmp, batch_format="pyarrow",
                                       batch_size=None)
    else:
        stats_ds = (tagged.groupby("part")
                    .map_groups(write_tmp, batch_format="pyarrow"))
    stats = stats_ds.take_all()   # num_partitions tiny rows — not row data

    rows: list[dict] = []
    committed = 0
    rows_done = 0
    t_commit = time.time()
    for st in sorted(stats, key=lambda r: r["partition"]):
        p = int(st["partition"])
        tmp = os.path.join(out_dir, f"_tmp-part={p}")
        final = os.path.join(out_dir, f"part={p}")
        if os.path.exists(final):
            import shutil
            shutil.rmtree(final)
        os.rename(tmp, final)
        row = {
            "partition": p, "epoch": epoch, "stage": "extracted",
            "rows": int(st["rows"]),
            "bytes": int(st["bytes"]),
            "seen_delta_path": os.path.join(final, "seen_delta.parquet"),
            "wall_s": float(st["wall_s"]),
        }
        _append_manifest(out_dir, row)
        rows.append(row)
        committed += 1
        rows_done += int(st["rows"])
        # per-commit heartbeat: the SSE progress-event analog — emitted
        # BEFORE any simulated crash so a mid-run trail always exists
        append_progress(out_dir, "commit", rows_done, epoch=epoch,
                        wall_s=time.time() - t_commit, partition=p,
                        partitions_committed=committed)
        if fail_after is not None and committed >= fail_after:
            raise RuntimeError(f"simulated crash after {committed} partitions")
    return rows


def load_seen_from_checkpoint(out_dir: str) -> pa.Table:
    """Union of all committed seen deltas (for shard replay on resume)."""
    tables = []
    for m in read_manifest(out_dir):
        if os.path.exists(m["seen_delta_path"]):
            tables.append(pq.read_table(m["seen_delta_path"]))
    if not tables:
        return seen_delta_table([], 0, 1).slice(0, 0)
    return pa.concat_tables(tables)


def read_output(out_dir: str) -> pa.Table:
    """Read all committed partitions back (test verification path)."""
    tables = []
    for m in sorted(read_manifest(out_dir), key=lambda m: m["partition"]):
        p = os.path.join(out_dir, f"part={m['partition']}", "data.parquet")
        if os.path.exists(p):
            tables.append(pq.read_table(p))
    return pa.concat_tables(tables) if tables else None
