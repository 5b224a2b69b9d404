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


_FP_BASE = np.uint64(1099511628211)   # FNV prime as the polynomial base


def rolling_fingerprint(text: str, window: int = 8,
                        keep_mask: int = 0x7F) -> list[int]:
    """Winnowing-style content-defined fingerprint of a document (scalar
    reference implementation; the hot path is
    :func:`rolling_fingerprints_batch`).

    Polynomial hash over byte windows in overflow-wrapped uint64 arithmetic
    (the fixed spec — same family as the shingle hashing); keep hashes whose
    low bits are zero under ``keep_mask``. The reference has no analog (its
    identity is whole-file MD5) — this is the scale path for containment
    queries.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return []
    if len(data) < window:
        return [hash64(data.tobytes()) & ((1 << 61) - 1)]
    with np.errstate(over="ignore"):
        pows = np.empty(window, dtype=np.uint64)
        pows[-1] = 1
        for i in range(window - 2, -1, -1):
            pows[i] = pows[i + 1] * _FP_BASE
        out = []
        for i in range(len(data) - window + 1):
            h = np.uint64(0)
            for j in range(window):
                h = h + np.uint64(data[i + j]) * pows[j]
            if int(h) & keep_mask == 0:
                out.append(int(h))
    return out


def rolling_fingerprints_batch(texts: list[str], window: int = 8,
                               keep_mask: int = 0x7F) -> list[np.ndarray]:
    """Vectorized :func:`rolling_fingerprint` for a batch of documents —
    sliding-window view + one matvec per doc, value-identical to the scalar
    path (asserted in tests)."""
    from numpy.lib.stride_tricks import sliding_window_view

    with np.errstate(over="ignore"):
        pows = np.empty(window, dtype=np.uint64)
        pows[-1] = 1
        for i in range(window - 2, -1, -1):
            pows[i] = pows[i + 1] * _FP_BASE
        out: list[np.ndarray] = []
        for t in texts:
            data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if len(data) == 0:
                out.append(np.zeros(0, dtype=np.uint64))
                continue
            if len(data) < window:
                out.append(np.array(
                    [hash64(data.tobytes()) & ((1 << 61) - 1)],
                    dtype=np.uint64))
                continue
            win = sliding_window_view(data, window).astype(np.uint64)
            h = (win * pows[None, :]).sum(axis=1, dtype=np.uint64)
            out.append(h[(h & np.uint64(keep_mask)) == 0])
    return out
