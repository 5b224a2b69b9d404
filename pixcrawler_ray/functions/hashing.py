"""Stable hashing primitives shared by the seen-filter, dedup and sharding.

All hashes are content-defined and process-stable (no PYTHONHASHSEED
dependence) — a requirement the reference never had (its dedup MD5s file
contents, ``validator/integrity.py:130-148``, but its seen-set is a JSON dict
keyed by strings, ``builder/progress.py:84-117``). At 10^10-URL scale every
byte of per-row hash cost matters, so the vectorized variants below operate on
whole Arrow/numpy arrays where possible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash64(s: str | bytes) -> int:
    """Stable 64-bit hash of a string/bytes (blake2b-8). Scalar path."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def hash64_array(arr) -> np.ndarray:
    """Stable 64-bit hashes for a string Arrow array / list. uint64 out."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_pylist()
    out = np.empty(len(arr), dtype=np.uint64)
    for i, s in enumerate(arr):
        out[i] = hash64(s or "")
    return out


def fnv1a64_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized FNV-1a-style mix of int64 values (for shard routing/salts)."""
    with np.errstate(over="ignore"):
        h = np.full(len(values), _FNV_OFFSET ^ np.uint64(seed), dtype=np.uint64)
        v = values.astype(np.uint64)
        for shift in (0, 8, 16, 24, 32, 40, 48, 56):
            h = (h ^ ((v >> np.uint64(shift)) & np.uint64(0xFF))) * _FNV_PRIME
    return h


def md5_hex_array(texts: list[str]) -> list[str]:
    """Lowercase hex MD5 per text — matches DuckDB ``md5(text)`` exactly."""
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def rolling_fingerprint(text: str, window: int = 8, base: int = 257,
                        mod: int = (1 << 61) - 1, keep_mask: int = 0x7F) -> list[int]:
    """Winnowing-style rolling-hash fingerprint of a document.

    Classic Rabin-Karp rolling hash over byte windows; keep hashes whose low
    bits are zero under ``keep_mask`` (content-defined selection). Used by the
    ``doc_fingerprint`` query; the reference has no analog (its identity is
    whole-file MD5) — this is the scale path for containment queries.
    """
    data = text.encode("utf-8")
    if len(data) < window:
        return [hash64(data) & ((1 << 61) - 1)] if data else []
    h = 0
    pw = pow(base, window - 1, mod)
    out = []
    for i, b in enumerate(data):
        h = (h * base + b) % mod
        if i >= window - 1:
            if h & keep_mask == 0:
                out.append(h)
            h = (h - data[i - window + 1] * pw) % mod
    return out
