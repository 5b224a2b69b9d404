"""Near-duplicate fingerprints: shingles, MinHash, LSH bands, SimHash.

The reference's only near-dup machinery is an 8x8 perceptual aHash over
images grouped by exact hash equality (``validator/integrity.py:108-128,
389-426``). For a 100 TB text corpus the standard toolkit is MinHash+LSH
(Broder 1997) and SimHash (Charikar 2002; Manku et al. WWW'07) — implemented
here from the public papers, vectorized with numpy, and exposed as Ray Data
stages in ``stages/dedup.py``.

All hash seeds are fixed constants: signatures are reproducible across
workers and runs.
"""

from __future__ import annotations

import numpy as np

from pixcrawler_ray.functions.hashing import hash64

_MERSENNE = (1 << 61) - 1
_RNG = np.random.default_rng(0x5EED_CAFE)
_MAX_PERMS = 256
_A = _RNG.integers(1, _MERSENNE, size=_MAX_PERMS, dtype=np.int64).astype(np.uint64)
_B = _RNG.integers(0, _MERSENNE, size=_MAX_PERMS, dtype=np.int64).astype(np.uint64)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed k-word shingles (uint64), deduplicated."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    out = np.fromiter((hash64(g) for g in set(grams)), dtype=np.uint64)
    return out


def minhash_signature(shingles: np.ndarray, num_perms: int = 128) -> np.ndarray:
    """(a*x + b) mod p universal-hash MinHash signature, uint64[num_perms]."""
    if len(shingles) == 0:
        return np.full(num_perms, np.uint64(_MERSENNE), dtype=np.uint64)
    x = shingles.astype(np.uint64) % np.uint64(_MERSENNE)
    with np.errstate(over="ignore"):
        # (num_perms, n) — modular mul in python ints would be slow; 64-bit
        # overflow-wrapped arithmetic is a valid universal family for dedup
        # purposes and is what we fix as the spec.
        vals = (_A[:num_perms, None] * x[None, :] + _B[:num_perms, None])
    return vals.min(axis=1)


def lsh_band_keys(signature: np.ndarray, bands: int = 16) -> np.ndarray:
    """Band buckets: uint64 hash per band (rows = len(sig)//bands)."""
    rows = len(signature) // bands
    sig = signature[: bands * rows].reshape(bands, rows)
    out = np.empty(bands, dtype=np.uint64)
    for i in range(bands):
        out[i] = hash64(sig[i].tobytes())
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over shingle sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str, k: int = 2) -> int:
    """Charikar SimHash over hashed k-word shingles (64-bit).

    Used as the crawl pipeline's ``phash`` column: deterministic, exact-match
    groupable (the reference also groups exact aHash values only), and
    Hamming-comparable for the near-dup query path.
    """
    sh = word_shingles(text, k=k)
    if len(sh) == 0:
        return 0
    bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    weights = bits.sum(axis=0) * 2 - len(sh)   # +1 / -1 vote per shingle
    return int(np.packbits((weights > 0)[::-1]).view(">u8")[0])


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Hamming distance between uint64 array and a scalar."""
    x = a.astype(np.uint64) ^ np.uint64(b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
