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


# word -> stable 64-bit hash memo (vocabulary of a corpus is tiny relative
# to its token count; bounded to keep worker heaps predictable)
_WORD_HASH_CACHE: dict[str, int] = {}
_WORD_CACHE_MAX = 1_000_000
_POLY = np.uint64(0x9E3779B97F4A7C15)   # golden-ratio odd constant


def _word_hashes(words: list[str]) -> np.ndarray:
    out = np.empty(len(words), dtype=np.uint64)
    cache = _WORD_HASH_CACHE
    for i, w in enumerate(words):
        h = cache.get(w)
        if h is None:
            h = hash64(w)
            if len(cache) < _WORD_CACHE_MAX:
                cache[w] = h
        out[i] = h
    return out


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed k-word shingles (uint64), deduplicated.

    Each WORD is hashed once (memoized blake2b); the k-gram hash is a
    vectorized polynomial combination of consecutive word hashes — no string
    joins, no per-shingle crypto hashing.
    """
    words = text.split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    wh = _word_hashes(words)
    if len(words) < k:
        k = len(words)
    with np.errstate(over="ignore"):
        h = wh[: len(wh) - k + 1].copy()
        for j in range(1, k):
            h = h * _POLY + wh[j: len(wh) - k + 1 + j]
    return np.unique(h)


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


def _flat_doc_shingles(texts: list[str], k: int):
    """Flattened per-doc unique shingle hashes.

    Returns (hashes, doc_index, seg_starts, n_docs): ``hashes`` sorted by
    doc, deduplicated within doc; ``seg_starts`` indexes each doc's segment
    (empty docs excluded — their fingerprint is 0 by definition).

    Tokenization + word hashing run through Arrow C++ kernels: whitespace
    split, then dictionary-encode the flat token stream so each DISTINCT
    word is hashed exactly once per batch (corpus vocabulary << token
    count). Identical output to the ``str.split()`` scalar path
    (pytest-asserted batch == scalar).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts, type=pa.string())
    sp = pc.utf8_split_whitespace(arr)
    lens0 = pc.list_value_length(sp).to_numpy(zero_copy_only=False).astype(
        np.int64)
    flat = pc.list_flatten(sp)
    doc_of_word = np.repeat(np.arange(len(texts)), lens0)
    # arrow emits empty tokens at string edges; str.split() drops them
    nonempty = pc.greater(pc.binary_length(flat), 0)
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    if not ne_np.all():
        flat = flat.filter(nonempty)
        doc_of_word = doc_of_word[ne_np]
    lens = np.bincount(doc_of_word, minlength=len(texts)).astype(np.int64)
    if len(flat) == 0:
        return (np.zeros(0, np.uint64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), len(texts))
    dic = flat.dictionary_encode()
    uniq_h = _word_hashes(dic.dictionary.to_pylist())
    wh = uniq_h[dic.indices.to_numpy(zero_copy_only=False)]
    with np.errstate(over="ignore"):
        # windows of size k starting at each word (within-doc only);
        # docs shorter than k use their full length (scalar-path semantics)
        h = wh.copy()
        valid = np.ones(len(wh), dtype=bool)
        for j in range(1, k):
            shifted = np.empty_like(wh)
            shifted[:-j] = wh[j:]
            shifted[-j:] = 0
            same_doc = np.empty(len(wh), dtype=bool)
            same_doc[:-j] = doc_of_word[j:] == doc_of_word[:-j]
            same_doc[-j:] = False
            h = np.where(same_doc, h * _POLY + shifted, h)
            # a window is a full k-gram only if it stays in its doc; for
            # docs with >= k words keep only full windows, shorter docs
            # keep their single truncated window (start position 0)
            starts0 = np.zeros(len(wh), dtype=bool)
        # recompute validity: position i valid iff i + k <= doc_end, or
        # doc has < k words and i is the doc start
        ends = np.cumsum(lens)
        starts = ends - lens
        pos_in_doc = np.arange(len(wh)) - starts[doc_of_word]
        full = pos_in_doc + k <= lens[doc_of_word]
        short = (lens[doc_of_word] < k) & (pos_in_doc == 0)
        valid = full | short
    h = h[valid]
    doc = doc_of_word[valid]
    order = np.lexsort((h, doc))
    h, doc = h[order], doc[order]
    keep = np.ones(len(h), dtype=bool)
    keep[1:] = (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])
    h, doc = h[keep], doc[keep]
    seg_starts = np.searchsorted(doc, np.unique(doc))
    return h, doc, seg_starts, len(texts)


def simhash64_batch(texts: list[str], k: int = 2) -> np.ndarray:
    """Vectorized batch SimHash — bit-identical to :func:`simhash64` per doc
    (asserted by tests), ~20x faster via whole-batch numpy ops."""
    h, doc, seg_starts, n = _flat_doc_shingles(texts, k)
    out = np.zeros(n, dtype=np.uint64)
    if len(h) == 0:
        return out
    seg_ends = np.append(seg_starts[1:], len(h)).astype(np.int64)
    seg_lens = seg_ends - seg_starts
    docs_with = np.unique(doc)
    # CHUNKED bit expansion: the whole-batch (n_shingles, 64) uint8 matrix
    # is tens of MB per call — on this host the FIRST touch of that much
    # fresh heap per worker costs seconds (hypervisor demand-paging;
    # see pixcrawler_ray._tune_allocator), turning worker cold-start into
    # the scaling bottleneck. ~32k shingles/chunk keeps the working set
    # ~2 MB (cache-resident, allocator-reused) at vector speed.
    CHUNK = 32768
    vals = np.empty((len(seg_starts), 8), dtype=np.uint8)
    s = 0
    while s < len(seg_starts):
        e = s
        while e < len(seg_starts) and seg_ends[e] - seg_starts[s] <= CHUNK:
            e += 1
        e = max(e, s + 1)          # a single giant doc still goes through
        lo, hi = seg_starts[s], seg_ends[e - 1]
        bits = np.unpackbits(
            np.ascontiguousarray(h[lo:hi]).view(np.uint8).reshape(-1, 8),
            axis=1, bitorder="little")
        # dtype=int32 ON the reduceat: widening via .astype first would
        # materialize a 4x temp (measured 3x slower on this host)
        votes = np.add.reduceat(bits, seg_starts[s:e] - lo, axis=0,
                                dtype=np.int32)
        set_bits = (votes * 2) > seg_lens[s:e, None]
        vals[s:e] = np.packbits(set_bits, axis=1, bitorder="little")
        s = e
    out[docs_with] = vals.view(np.uint64).ravel()
    return out


def minhash_signature_batch(texts: list[str], num_perms: int = 128,
                            k: int = 3) -> np.ndarray:
    """Vectorized batch MinHash: (n_docs, num_perms) uint64 — identical to
    per-doc :func:`minhash_signature` values."""
    h, doc, seg_starts, n = _flat_doc_shingles(texts, k)
    out = np.full((n, num_perms), np.uint64(_MERSENNE), dtype=np.uint64)
    if len(h) == 0:
        return out
    x = h % np.uint64(_MERSENNE)
    with np.errstate(over="ignore"):
        vals = (_A[:num_perms, None] * x[None, :] + _B[:num_perms, None])
    mins = np.minimum.reduceat(vals, seg_starts, axis=1)     # (perms, docs_ne)
    out[np.unique(doc), :] = mins.T
    return out


def hamming64(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorized Hamming distance between uint64 array and a scalar."""
    x = a.astype(np.uint64) ^ np.uint64(b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
