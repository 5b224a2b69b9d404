"""Numpy-backed Bloom filter — the URL-seen negative-lookup accelerator.

The north rule calls for a bloom/cuckoo URL-seen structure; the reference has
none (its seen-set is an exact JSON dict, ``builder/progress.py:84-117``), so
semantics here must stay EXACT: the bloom filter only short-circuits *negative*
membership checks (definitely-new URLs skip the exact-set probe); positives are
always confirmed against the exact backing set (SURVEY §7.5 item 3). At 10^10
URLs a 1%-FPR filter is ~12 GB total — sharded across hosts/actors it is a few
tens of MB per shard, while the exact set lives in the sharded on-disk ``seen``
Parquet table.
"""

from __future__ import annotations

import numpy as np

from pixcrawler_ray.functions.hashing import fnv1a64_ints


class BloomFilter:
    """Standard k-hash Bloom filter over uint64 keys, vectorized add/contains."""

    def __init__(self, capacity: int, fpr: float = 0.01):
        capacity = max(64, int(capacity))
        m = int(-capacity * np.log(fpr) / (np.log(2) ** 2))
        self.num_bits = 1 << int(np.ceil(np.log2(max(64, m))))  # pow2 for masking
        self.num_hashes = max(1, int(round(self.num_bits / capacity * np.log(2))))
        self.bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2."""
        h1 = fnv1a64_ints(keys, seed=0x9E3779B9)
        h2 = fnv1a64_ints(keys, seed=0x85EBCA6B) | np.uint64(1)
        i = np.arange(self.num_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) & np.uint64(self.num_bits - 1)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(np.asarray(keys, dtype=np.uint64)).ravel()
        np.bitwise_or.at(self.bits, (pos >> 3).astype(np.int64),
                         (1 << (pos & 7)).astype(np.uint8))
        self.count += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized maybe-membership. False => definitely not present."""
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        byte = self.bits[(pos >> 3).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bit.all(axis=0).astype(bool)

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.array([key], dtype=np.uint64))[0])
