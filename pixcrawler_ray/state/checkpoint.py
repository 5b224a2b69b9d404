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


def partition_ids(keywords, num_partitions: int) -> np.ndarray:
    return (hash64_array(keywords) % np.uint64(num_partitions)).astype(np.int64)


def read_manifest(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def completed_partitions(out_dir: str) -> set[int]:
    return {m["partition"] for m in read_manifest(out_dir)}


def _append_manifest(out_dir: str, row: dict) -> None:
    with open(os.path.join(out_dir, MANIFEST), "a") as f:
        f.write(json.dumps(row) + "\n")


def write_partitioned(extracted_ds, out_dir: str, num_partitions: int = 8,
                      epoch: int = 0, fail_after: int | None = None) -> list[dict]:
    """Write the extracted dataset as committed partitions + lineage rows.

    ``fail_after``: test hook — raise after committing N partitions to
    simulate a mid-run crash (FIXTURES.md §4.6 resume test).

    Partition column is keyword-hash so a partition maps to a stable unit of
    reference work (category/keyword), like the ProgressCache key.
    """
    os.makedirs(out_dir, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        p = partition_ids(t.column("keyword"), num_partitions)
        return t.append_column("part", pa.array(p, type=pa.int64()))

    tagged = extracted_ds.map_batches(tag, batch_format="pyarrow")
    done = completed_partitions(out_dir)
    rows: list[dict] = []
    committed = 0
    # One pass over the stream, buffered per partition. Partition count is
    # small (open-file bound); blocks stream through without full pin.
    writers: dict[int, list[pa.Table]] = {}
    for batch in tagged.iter_batches(batch_size=8192, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        parts = batch.column("part").to_numpy()
        for p in np.unique(parts):
            if int(p) in done:
                continue
            sub = batch.filter(pa.array(parts == p))
            writers.setdefault(int(p), []).append(sub)
    for p in sorted(writers):
        t0 = time.time()
        table = pa.concat_tables(writers[p])
        # deterministic layout: sort by seq inside the partition
        table = table.take(pa.compute.sort_indices(table.column("seq")))
        tmp = os.path.join(out_dir, f"_tmp-part={p}")
        final = os.path.join(out_dir, f"part={p}")
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table.drop_columns(["part"]),
                       os.path.join(tmp, "data.parquet"))
        delta = seen_delta_table(table.column("url").to_pylist(), epoch,
                                 num_partitions)
        pq.write_table(delta, os.path.join(tmp, "seen_delta.parquet"))
        if os.path.exists(final):
            import shutil
            shutil.rmtree(final)
        os.rename(tmp, final)
        row = {
            "partition": int(p), "epoch": epoch, "stage": "extracted",
            "rows": table.num_rows,
            "bytes": int(table.nbytes),
            "seen_delta_path": os.path.join(final, "seen_delta.parquet"),
            "wall_s": round(time.time() - t0, 4),
        }
        _append_manifest(out_dir, row)
        rows.append(row)
        committed += 1
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
