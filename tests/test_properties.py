"""Property-based tests (hypothesis) over the pure kernels.

The reference ships no property tests (SURVEY.md §5); these are the
rebuild's addition: batch kernels must equal their scalar specs on
ARBITRARY input, not just the fixture corpus. All pure functions — no Ray.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pixcrawler_ray.functions.bloom import BloomFilter
from pixcrawler_ray.functions.cuckoo import CuckooFilter
from pixcrawler_ray.functions.hashing import (
    rolling_fingerprint,
    rolling_fingerprints_batch,
)
from pixcrawler_ray.functions.mediameta import (
    encode_bmp_header,
    encode_gif_header,
    encode_jpeg_header,
    encode_png_header,
    sniff_dims,
)
from pixcrawler_ray.functions.minhash import (
    minhash_signature,
    simhash64,
    simhash64_batch,
    word_shingles,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, max_size=12), st.integers(min_value=1, max_value=4))
def test_simhash_batch_equals_scalar(texts, k):
    batch = simhash64_batch(texts, k=k)
    for t, got in zip(texts, batch):
        assert int(got) == simhash64(t, k=k)


@settings(max_examples=60, deadline=None)
@given(TEXT, st.integers(min_value=1, max_value=5))
def test_word_shingles_set_semantics(text, k):
    sh = word_shingles(text, k=k)
    # deterministic, sorted-unique, and invariant to repeated whitespace
    assert list(sh) == sorted(set(sh.tolist()))
    again = word_shingles("  ".join(text.split()), k=k)
    assert np.array_equal(sh, again)


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_minhash_signature_is_permutation_min(text):
    """Each signature slot is the min of its hash family over the shingle
    set — so any SUPERSET of shingles can only lower each slot."""
    a = word_shingles(text, k=2)
    sig_a = minhash_signature(a, num_perms=32)
    extra = word_shingles(text + " zz qq", k=2)
    both = np.union1d(a, extra)
    sig_b = minhash_signature(both, num_perms=32)
    if len(a) and len(both):
        assert (sig_b <= sig_a).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, max_size=8),
       st.integers(min_value=2, max_value=16))
def test_rolling_fingerprints_batch_equals_scalar(texts, window):
    batch = rolling_fingerprints_batch(texts, window=window)
    for t, got in zip(texts, batch):
        assert [int(x) for x in got] == rolling_fingerprint(t, window=window)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                max_size=300, unique=True))
def test_bloom_no_false_negatives(keys):
    bf = BloomFilter(capacity=max(64, len(keys)))
    arr = np.asarray(keys, dtype=np.uint64)
    if len(arr):
        bf.add_many(arr)
        assert bf.contains_many(arr).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                max_size=200, unique=True))
def test_cuckoo_no_false_negatives_and_delete(keys):
    cf = CuckooFilter(capacity=max(64, len(keys) * 2))
    arr = np.asarray(keys, dtype=np.uint64)
    if not len(arr):
        return
    cf.add_many(arr)
    assert cf.contains_many(arr).all()
    # deletability: removing the first half must not evict the second
    half = len(arr) // 2
    if half:
        cf.remove_many(arr[:half])
        assert cf.contains_many(arr[half:]).all()


@settings(max_examples=60, deadline=None)
@given(st.sampled_from(["png", "gif", "bmp", "jpeg"]),
       st.integers(min_value=1, max_value=65535),
       st.integers(min_value=1, max_value=65535),
       st.binary(max_size=64))
def test_sniff_roundtrip_property(kind, width, height, filler):
    enc = {"png": encode_png_header, "gif": encode_gif_header,
           "bmp": encode_bmp_header, "jpeg": encode_jpeg_header}[kind]
    fmts, w, h = sniff_dims([enc(width, height, filler)])
    assert fmts == [kind] and w[0] == width and h[0] == height


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=80))
def test_url_canonicalize_idempotent(s):
    """Canonicalization is idempotent on ARBITRARY strings (RFC 3986 §6
    normalization is a projection), and never returns null."""
    import pyarrow as pa

    from pixcrawler_ray.stages.urlnorm import canonicalize_urls

    once = canonicalize_urls(pa.array([s], type=pa.string())).to_pylist()
    twice = canonicalize_urls(pa.array(once, type=pa.string())).to_pylist()
    assert twice == once and once[0] is not None


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(alphabet=" abcdef", max_size=40), max_size=8))
def test_repetition_kernel_matches_counter_reference(texts):
    """Vectorized repetition signals == the Counter spec on arbitrary
    ASCII-word text (the oracle SQL mirrors the same spec)."""
    from collections import Counter

    import pyarrow as pa

    from pixcrawler_ray.stages.textstats import repetition_stats_batch

    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = repetition_stats_batch(t)
    for i, x in enumerate(texts):
        words = (x or "").split()
        bigrams = Counter(zip(words, words[1:]))
        assert out.column("n_tokens")[i].as_py() == len(words)
        assert out.column("n_distinct_tokens")[i].as_py() == len(set(words))
        assert out.column("top_bigram_count")[i].as_py() \
            == (max(bigrams.values()) if bigrams else 0)
