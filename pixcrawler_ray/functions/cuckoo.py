"""Numpy-backed Cuckoo filter — the DELETABLE URL-seen accelerator.

The north rule names a "bloom/cuckoo URL-seen filter"; this is the cuckoo
half (Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014). Same contract as
:class:`pixcrawler_ray.functions.bloom.BloomFilter` — it only short-circuits
NEGATIVE membership (a miss is definitive, a hit must be confirmed against
the exact set) — plus ``remove_many``, which a bloom cannot offer. Deletion
matters at frontier scale for budget refunds: a URL admitted then dropped by
a downstream gate can be un-marked so a later generation may retry it.

Layout: ``num_buckets`` x ``bucket_size`` uint16 fingerprint slots (0 =
empty; fingerprints are mapped into 1..65535). Partial-key cuckoo hashing:
the two candidate buckets are ``i1 = h(x)`` and ``i2 = i1 ^ h(fp)``, so
relocation needs only the stored fingerprint. Lookups/deletes are fully
vectorized; inserts use a vectorized first-try fast path and fall back to
the standard per-item kick loop only for items whose both buckets are full.
"""

from __future__ import annotations

import numpy as np

from pixcrawler_ray.functions.hashing import fnv1a64_ints

_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4, seed: int = 7):
        capacity = max(64, int(capacity))
        # ~95% load max for b=4; size to the next power of two of cap/b
        nb = 1 << int(np.ceil(np.log2(max(16, capacity // bucket_size + 1))))
        self.num_buckets = nb
        self.bucket_size = bucket_size
        self.table = np.zeros((nb, bucket_size), dtype=np.uint16)
        self.seed = seed
        self.count = 0

    # --- hashing -----------------------------------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        f = (fnv1a64_ints(keys, seed=0xC2B2AE35) & np.uint64(0xFFFF)) \
            .astype(np.uint16)
        return np.where(f == 0, np.uint16(1), f)   # 0 is the empty sentinel

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (fnv1a64_ints(keys, seed=self.seed)
                & np.uint64(self.num_buckets - 1)).astype(np.int64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = fnv1a64_ints(fp.astype(np.int64), seed=0x9E3779B9)
        return (i.astype(np.uint64) ^ h) & np.uint64(self.num_buckets - 1)

    # --- ops ---------------------------------------------------------------
    def add_many(self, keys: np.ndarray) -> int:
        """Insert; returns how many were stored (a full table drops the rest
        — callers treat the filter as an accelerator, the exact set stays
        authoritative). Duplicate inserts store duplicate fingerprints, so
        remove_many stays safe under multiset semantics."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return 0
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp).astype(np.int64)
        stored = 0
        # vectorized fast path: fill the first empty slot of i1 (then i2),
        # one collision-free wave per slot column
        pending = np.arange(len(keys))
        for buckets in (i1, i2):
            for s in range(self.bucket_size):
                if not len(pending):
                    break
                b = buckets[pending]
                free = self.table[b, s] == 0
                if not free.any():
                    continue
                cand = pending[free]
                bc = buckets[cand]
                # first occurrence per bucket wins this wave; rest retry
                uniq, first_idx = np.unique(bc, return_index=True)
                take = cand[first_idx]
                self.table[buckets[take], s] = fp[take]
                stored += len(take)
                keep = np.ones(len(pending), dtype=bool)
                keep[np.isin(pending, take)] = False
                pending = pending[keep]
        # kick loop for the stragglers (both buckets full)
        rng = np.random.default_rng(self.seed)
        for j in pending:
            f = fp[j]
            i = int(i1[j])
            placed = False
            for _ in range(_MAX_KICKS):
                row = self.table[i]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    self.table[i, empty[0]] = f
                    placed = True
                    break
                s = int(rng.integers(self.bucket_size))
                f, self.table[i, s] = self.table[i, s], f
                i = int(self._alt(np.array([i]), np.array([f]))[0])
            if placed:
                stored += 1
        self.count += stored
        return stored

    def _match_mask(self, keys: np.ndarray):
        fp = self._fp(keys)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp).astype(np.int64)
        m1 = self.table[i1] == fp[:, None]
        m2 = self.table[i2] == fp[:, None]
        return fp, i1, i2, m1, m2

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized maybe-membership. False => definitely not present."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return np.zeros(0, dtype=bool)
        _, _, _, m1, m2 = self._match_mask(keys)
        return m1.any(axis=1) | m2.any(axis=1)

    def remove_many(self, keys: np.ndarray) -> np.ndarray:
        """Delete one stored fingerprint per present key (vectorized with a
        per-duplicate-bucket serial fallback). Returns the removed mask.
        Only ever called for keys known present in the exact set — deleting
        a never-inserted key could evict another key's colliding
        fingerprint, which is why the exact set stays authoritative."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return np.zeros(0, dtype=bool)
        removed = np.zeros(len(keys), dtype=bool)
        fp, i1, i2, m1, m2 = self._match_mask(keys)
        for idx in range(len(keys)):
            for i, m in ((i1[idx], m1[idx]), (i2[idx], m2[idx])):
                s = np.flatnonzero(self.table[int(i)] == fp[idx])
                if len(s):
                    self.table[int(i), s[0]] = 0
                    removed[idx] = True
                    break
        self.count -= int(removed.sum())
        return removed

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=np.uint64))[0])
