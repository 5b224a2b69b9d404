"""Portable crawl-state snapshot — export the CONTINUOUS-crawl actor state
(URL-seen shards + politeness counters) as an atomically-committed parquet
directory, and restore it into fresh actors.

Why it exists: the batch pipelines already resume from the checkpointed
OUTPUT (partition manifests + seen deltas, ``state/checkpoint.py``), but
the streaming mode (``politeness_shards=`` / ``PolitenessShard``) holds its
admission counters and the seen shards hold their key stores in actor
memory — state that dies with the process. A long-lived crawler migrating
hosts, upgrading, or recovering from a node loss needs the frontier state
itself to be portable: this module is that handoff. Layout::

    out_dir/
      seen/shard={i}/part-*.parquet       (url_hash: uint64)
      politeness/shard={i}/part-*.parquet (host: string, admitted: int64)
      _DONE

committed via tmp-dir + atomic rename (the repo's rename-as-marker rule),
so a crashed export never masquerades as a snapshot. Restore spawns fresh
actors and replays each shard's rows into the SAME shard index — shard
count is part of the snapshot (hash placement is shard-count-dependent);
restoring into a different seen-shard count re-hashes the keys instead
(one pass, still exact). Reference analog: the DB-backed job state the
Celery workers reload on restart (``backend/services/crawl_job.py``).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


def export_crawl_state(seen_shards, politeness_shards, out_dir: str) -> dict:
    """Snapshot both actor families; returns per-family row counts."""
    tmp = out_dir.rstrip("/") + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    counts = {"seen_keys": 0, "politeness_hosts": 0,
              "seen_shards": len(seen_shards or []),
              "politeness_shards": len(politeness_shards or [])}

    snaps = ray.get([s.snapshot.remote() for s in (seen_shards or [])])
    for i, keys in enumerate(snaps):
        d = os.path.join(tmp, "seen", f"shard={i}")
        os.makedirs(d)
        pq.write_table(
            pa.table({"url_hash": pa.array(np.asarray(keys, dtype=np.uint64),
                                           type=pa.uint64())}),
            os.path.join(d, "part-0.parquet"))
        counts["seen_keys"] += len(keys)

    states = ray.get([s.state.remote() for s in (politeness_shards or [])])
    for i, (hosts, admitted) in enumerate(states):
        d = os.path.join(tmp, "politeness", f"shard={i}")
        os.makedirs(d)
        pq.write_table(
            pa.table({"host": pa.array(hosts, type=pa.string()),
                      "admitted": pa.array(admitted, type=pa.int64())}),
            os.path.join(d, "part-0.parquet"))
        counts["politeness_hosts"] += len(hosts)

    open(os.path.join(tmp, "_DONE"), "w").close()
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return counts


def restore_crawl_state(out_dir: str, num_seen_shards: int | None = None,
                        capacity_per_shard: int = 1_000_000,
                        budget_per_round: int | None = None,
                        respect_crawl_delay: bool = False):
    """Spawn fresh actors loaded from a committed snapshot. Returns
    (seen_shards, politeness_shards); either may be an empty list when the
    snapshot holds no state for that family."""
    from pixcrawler_ray.stages.politeness import (DEFAULT_BUDGET_PER_ROUND,
                                                  make_politeness_shards)
    from pixcrawler_ray.stages.seen import start_seen_shards

    if not os.path.exists(os.path.join(out_dir, "_DONE")):
        raise FileNotFoundError(f"no committed crawl snapshot at {out_dir}")

    def shard_dirs(fam: str) -> list[str]:
        base = os.path.join(out_dir, fam)
        if not os.path.isdir(base):
            return []
        return sorted((os.path.join(base, p) for p in os.listdir(base)
                       if p.startswith("shard=")),
                      key=lambda p: int(p.rsplit("=", 1)[1]))

    seen_dirs = shard_dirs("seen")
    seen_shards = []
    if seen_dirs:
        n = num_seen_shards or len(seen_dirs)
        seen_shards = start_seen_shards(n, capacity_per_shard)
        if n == len(seen_dirs):
            refs = []
            for i, d in enumerate(seen_dirs):
                keys = pq.read_table(d).column("url_hash").to_numpy() \
                    .astype(np.uint64)
                if len(keys):
                    refs.append(seen_shards[i].add.remote(keys))
            ray.get(refs)
        else:
            # different shard count: re-hash placement in one pass
            allk = np.concatenate(
                [pq.read_table(d).column("url_hash").to_numpy()
                 .astype(np.uint64) for d in seen_dirs])
            s = (allk % np.uint64(n)).astype(np.int64)
            ray.get([seen_shards[i].add.remote(allk[s == i])
                     for i in range(n) if (s == i).any()])

    pol_dirs = shard_dirs("politeness")
    politeness_shards = []
    if pol_dirs:
        politeness_shards = make_politeness_shards(
            len(pol_dirs),
            budget_per_round=(budget_per_round
                              if budget_per_round is not None
                              else DEFAULT_BUDGET_PER_ROUND),
            respect_crawl_delay=respect_crawl_delay)
        refs = []
        for i, d in enumerate(pol_dirs):
            t = pq.read_table(d)
            refs.append(politeness_shards[i].load_state.remote(
                t.column("host").to_pylist(),
                t.column("admitted").to_pylist()))
        ray.get(refs)

    return seen_shards, politeness_shards
