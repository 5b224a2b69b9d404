"""ST3/J3 — the URL-seen set: within-run dedup + cross-epoch resume anti-join.

The reference's seen-set is the ProgressCache JSON dict flushed after every
work unit (``builder/progress.py:37-154``) plus icrawler's in-process URL
dedup. Rebuild semantics (SURVEY §7.5.3):

- WITHIN one generation, "seen" means *the min-seq occurrence wins* —
  reproduced exactly by a hash-partitioned keep-first shuffle
  (:func:`dedup_frontier`). Deterministic under any parallelism.
- ACROSS generations / resumed runs, "seen" is plain membership in the
  checkpointed ``seen`` table — order-independent, so a single-pass
  actor-sharded bloom+exact filter is exact (:class:`SeenShard` +
  :class:`SeenAntiJoin`). The bloom filter only accelerates negative lookups;
  positives always hit the exact set, so no URL is ever wrongly dropped.

Sharding is by ``url_hash % num_shards``. Each shard's exact set is a SORTED
uint64 numpy array probed with ``searchsorted`` behind the bloom (8 bytes/key
— ~10x below a Python ``set``), built incrementally: adds append to a small
pending buffer that is merged into the sorted base past a threshold, so adds
stay amortized O(1) and probes O(log n). Memory budget at 10^10 URLs: with
S = 1024 shards, 10^10/S keys × 8 B ≈ 78 MB of exact array per shard plus a
~12 MB bloom (1% fpr) — one commodity node holds dozens of shards. The same
sorted-array bytes are exactly what the checkpointed ``seen`` delta parquet
stores, so a resumed shard can also be mmap-loaded from disk rather than
replayed (``checkpoint.load_seen_from_checkpoint``). Host-affine routing
(hash of host) is used by the politeness stage; the seen filter shards on
the full url hash for uniform load.

Keying: every frontier/extracted row carries the integer ``doc_id`` (bijective
with url in this corpus), so the seen key is the VECTORIZED
``fnv1a64_ints(doc_id)`` — no per-row Python hashing anywhere in the seen hot
path. The blake2b url-string hash remains only as the fallback for tables
without a ``doc_id`` column (external corpora).

The shard actors are membership stores, not compute: ``num_cpus=0`` so they
never hold CPU reservations that could starve the fetch/shuffle actor pools
(a real deadlock observed at num_cpus=4 in round 1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from pixcrawler_ray.functions.bloom import BloomFilter
from pixcrawler_ray.functions.hashing import fnv1a64_ints, hash64_array
from pixcrawler_ray.stages.shuffle import keep_first_by

SEEN_SCHEMA = pa.schema(
    [("url_hash", pa.uint64()), ("shard", pa.int32()), ("epoch", pa.int32())]
)


def seen_keys(batch: pa.Table) -> np.ndarray:
    """uint64 seen-set keys for a batch — vectorized on ``doc_id`` when
    present, per-row blake2b of ``url`` otherwise."""
    if "doc_id" in batch.column_names:
        return fnv1a64_ints(batch.column("doc_id").to_numpy())
    return hash64_array(batch.column("url"))


def dedup_frontier(frontier_ds, num_buckets: int = 64):
    """Within-generation URL dedup: keep the min-``seq`` row per url."""
    return keep_first_by(frontier_ds, ["url"], "seq", num_buckets=num_buckets)


class SeenStore:
    """Exact membership store: sorted uint64 base array + pending buffer.

    8 bytes/key vs ~70 for a Python set (the round-2 doc/impl gap on the
    10^10 budget). Adds append unique-sorted chunks to ``pending`` and merge
    into ``base`` past ``merge_threshold`` (amortized O(1) per key); probes
    binary-search the base and the small pending chunks. Plain class so the
    10M-key memory/correctness test runs without an actor.
    """

    __slots__ = ("base", "pending", "n_pending", "merge_threshold",
                 "removed")

    def __init__(self, merge_threshold: int = 1 << 18):
        self.base = np.zeros(0, dtype=np.uint64)
        self.pending: list[np.ndarray] = []
        self.n_pending = 0
        self.merge_threshold = merge_threshold
        # budget-refund tombstones against ``base`` (applied at compact);
        # stays small — refunds are rare relative to adds
        self.removed = np.zeros(0, dtype=np.uint64)

    def _compact(self) -> None:
        if self.pending or len(self.removed):
            merged = np.unique(np.concatenate([self.base] + self.pending))
            if len(self.removed):
                merged = np.setdiff1d(merged, self.removed,
                                      assume_unique=True)
                self.removed = np.zeros(0, dtype=np.uint64)
            self.base = merged
            self.pending = []
            self.n_pending = 0

    def add(self, h: np.ndarray) -> None:
        h = np.unique(np.asarray(h, dtype=np.uint64))
        if not len(h):
            return
        if len(self.removed):
            # a re-added key clears its tombstone
            self.removed = np.setdiff1d(self.removed, h,
                                        assume_unique=True)
        self.pending.append(h)
        self.n_pending += len(h)
        if self.n_pending >= self.merge_threshold:
            self._compact()

    def remove(self, h: np.ndarray) -> None:
        """Un-mark keys (budget refund). Pending adds of these keys are
        cancelled; keys already merged into ``base`` get a tombstone."""
        h = np.unique(np.asarray(h, dtype=np.uint64))
        if not len(h):
            return
        if self.pending:
            self.pending = [p[~np.isin(p, h)] for p in self.pending]
            self.n_pending = sum(len(p) for p in self.pending)
        if len(self.base):
            pos = np.searchsorted(self.base, h)
            inb = pos < len(self.base)
            hit = h[inb][self.base[pos[inb]] == h[inb]]
            if len(hit):
                self.removed = np.union1d(self.removed, hit)

    def contains(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        out = np.zeros(len(h), dtype=bool)
        for arr in [self.base] + self.pending:
            if not len(arr):
                continue
            pos = np.searchsorted(arr, h)
            inb = pos < len(arr)
            out[inb] |= arr[pos[inb]] == h[inb]
        if len(self.removed):
            # base hits under a tombstone are gone UNLESS re-added later
            # (re-adds cleared their tombstone in add())
            out &= ~np.isin(h, self.removed)
        return out

    def __len__(self) -> int:
        self._compact()
        return int(len(self.base))

    def snapshot(self) -> np.ndarray:
        self._compact()
        return self.base


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set: exact sorted-array store + a
    negative-lookup accelerator (``filter_kind``: "bloom" default, or
    "cuckoo" — the deletable variant, functions/cuckoo.py — when budget
    refunds need to un-mark urls)."""

    def __init__(self, shard_id: int, capacity: int = 1_000_000,
                 fpr: float = 0.01, filter_kind: str = "bloom"):
        self.shard_id = shard_id
        self.exact = SeenStore()
        if filter_kind == "cuckoo":
            from pixcrawler_ray.functions.cuckoo import CuckooFilter
            self.bloom = CuckooFilter(capacity)
        else:
            self.bloom = BloomFilter(capacity, fpr)

    def add(self, hashes: np.ndarray) -> int:
        h = np.asarray(hashes, dtype=np.uint64)
        self.bloom.add_many(h)
        self.exact.add(h)
        return len(self.exact)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Exact membership mask; bloom short-circuits definite negatives."""
        h = np.asarray(hashes, dtype=np.uint64)
        maybe = self.bloom.contains_many(h)
        out = np.zeros(len(h), dtype=bool)
        idx = np.nonzero(maybe)[0]
        if len(idx):
            out[idx] = self.exact.contains(h[idx])
        return out

    def remove(self, hashes: np.ndarray) -> None:
        """Budget refund: un-mark urls so a later generation may retry them.
        The cuckoo accelerator deletes too (restoring the fast-path miss);
        a plain bloom cannot — its stale positives are harmless because the
        exact store is authoritative."""
        h = np.asarray(hashes, dtype=np.uint64)
        self.exact.remove(h)
        if hasattr(self.bloom, "remove_many"):
            self.bloom.remove_many(h)

    def snapshot(self) -> np.ndarray:
        return self.exact.snapshot()


def start_seen_shards(num_shards: int, capacity_per_shard: int = 1_000_000):
    return [SeenShard.remote(i, capacity_per_shard) for i in range(num_shards)]


def kill_seen_shards(shards) -> None:
    """Release the shard actors (their state lives on in the checkpointed
    ``seen`` deltas; a resumed run replays those into fresh actors)."""
    for s in shards or []:
        try:
            ray.kill(s)
        except Exception:
            pass


def load_seen_shards(shards, seen_table: pa.Table) -> None:
    """Replay a checkpointed ``seen`` table into the shard actors."""
    if seen_table.num_rows == 0:
        return
    h = seen_table.column("url_hash").to_numpy().astype(np.uint64)
    s = (h % np.uint64(len(shards))).astype(np.int64)
    ray.get([shards[i].add.remote(h[s == i]) for i in range(len(shards))
             if (s == i).any()])


class SeenAntiJoin:
    """Actor-pool ``map_batches`` stage: drop URLs already in the seen shards.

    Used on resume (J3 anti-join, ``builder/_generator.py:1241-1244``):
    membership against PRIOR epochs is order-independent, so one pass is
    exact. Shard handles are resolved once per actor in ``__init__``.
    """

    def __init__(self, shard_handles: list):
        self.shards = shard_handles
        self.n = len(shard_handles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = seen_keys(batch)
        s = (h % np.uint64(self.n)).astype(np.int64)
        seen_mask = np.zeros(len(h), dtype=bool)
        futures, owners = [], []
        for i in range(self.n):
            idx = np.nonzero(s == i)[0]
            if len(idx):
                futures.append(self.shards[i].contains.remote(h[idx]))
                owners.append(idx)
        for idx, res in zip(owners, ray.get(futures)):
            seen_mask[idx] = res
        return batch.filter(pa.array(~seen_mask))


class SeenRegister(SeenAntiJoin):
    """Register a batch's URLs into the shards (post-admission), pass through."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = seen_keys(batch)
        s = (h % np.uint64(self.n)).astype(np.int64)
        ray.get([self.shards[i].add.remote(h[s == i]) for i in range(self.n)
                 if (s == i).any()])
        return batch


def seen_delta_table(keys, epoch: int, num_shards: int) -> pa.Table:
    """Checkpoint rows for newly-admitted urls (FIXTURES.md ``seen`` schema).

    ``keys``: int64 doc_ids (vectorized fnv key) or url strings (fallback).
    """
    arr = np.asarray(keys)
    if arr.dtype.kind in "iu" and len(arr):
        h = fnv1a64_ints(arr.astype(np.int64))
    elif arr.dtype.kind in "iu":
        h = np.zeros(0, dtype=np.uint64)
    else:
        h = hash64_array(list(keys))
    return pa.table({
        "url_hash": pa.array(h, type=pa.uint64()),
        "shard": pa.array((h % np.uint64(num_shards)).astype(np.int32)),
        "epoch": pa.array(np.full(len(h), epoch, dtype=np.int32)),
    })
