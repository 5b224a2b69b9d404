"""M12 — the deterministic extraction transform (the per-row invariant).

The reference "extracts" by letting icrawler's engine parsers pull image URLs
out of result pages and saving the bytes (``builder/_engine.py:542-578`` wraps
the parser; DDGS hands the url directly, ``builder/_search_engines.py:237``).
Here extraction is re-specified as a pure Arrow-batch transform
``html:binary -> (text:string, image_links:list<string>, valid:bool)`` that
must reproduce the corpus ground-truth ``text`` byte-for-byte per url
(BASELINE.json per-row invariant).

Also folds in the reference's validity/metadata projections:
- M10 validity filter (PIL verify analog, ``validator/integrity.py:454-542``):
  a malformed/truncated page -> ``valid=False``, ``text=''``.
- M15 safe-parser semantics (``builder/_engine.py:542-578``): any parse error
  -> empty links + empty text, never an exception.
- M11 metadata (``builder/_generator.py:864-894``): byte size.
- A3/A4 hash columns: ``content_md5`` of the text bytes
  (``validator/integrity.py:130-148``) and a 64-bit ``phash`` analog of the
  reference's 8x8 average-hash (``validator/integrity.py:108-128``) computed
  over the html byte histogram — exact-match grouping only, like the
  reference (it groups identical aHash hex strings, never hamming distance).
"""

from __future__ import annotations

import hashlib
import html as _html_mod
import re

import numpy as np
import pyarrow as pa

from pixcrawler_ray.functions.minhash import simhash64_batch

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_IMG_RE = re.compile(rb'<img src="([^"]*)"/>')

# M9 — valid image extensions (builder/_constants.py:40-41; gate applied in
# valid_image_ext, builder/_helpers.py:39-52)
IMAGE_EXTENSIONS = frozenset(
    {".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp", ".tiff"})


def filter_image_links(links: list[str]) -> list[str]:
    """M9 — keep only links whose (lowercased) suffix is a valid image
    extension; the batch-level gate mirroring ``valid_image_ext``."""
    out = []
    for u in links:
        dot = u.rfind(".")
        if dot != -1 and u[dot:].lower() in IMAGE_EXTENSIONS:
            out.append(u)
    return out


def extract_one(html: bytes) -> tuple[str, list[str], bool]:
    """Invert ``corpus.render_html``: html bytes -> (text, image_links, valid).

    Deterministic, total: malformed input yields ('', [], False) — the
    safe-parser contract (``builder/_engine.py:542-578``).
    """
    try:
        m = _P_RE.search(html)
        if m is None or b"</body></html>" not in html:
            return "", [], False
        text = _html_mod.unescape(m.group(1).decode("utf-8"))
        links = [u.decode("utf-8") for u in _IMG_RE.findall(html)]
        return text, links, True
    except Exception:
        return "", [], False


def ahash64(html: bytes) -> int:
    """64-bit average-hash analog over the byte histogram (A4).

    The reference aHashes an 8x8 grayscale thumbnail
    (``validator/integrity.py:108-128``); for opaque binary payloads we hash
    the 64-bucket byte histogram against its mean — same shape (64 bits,
    average-threshold bitmap), deterministic, exact-match groupable.
    """
    if not html:
        return 0
    counts = np.bincount(
        np.frombuffer(html, dtype=np.uint8) >> 2, minlength=64
    ).astype(np.float64)
    bits = counts > counts.mean()
    return int(np.packbits(bits).view(">u8")[0])


def _extract_columns_vectorized(batch: pa.Table):
    """Arrow-kernel extraction core — value-identical to the scalar
    :func:`extract_one` loop on the closed corpus-html world (pytest-asserted
    batch == scalar), ~5x faster per batch.

    Returns (texts, links_arr, raw_counts, valid, sizes) or None when the
    payload is not valid utf-8 (the scalar loop then handles it row by row).
    The entity unescape is the exact inverse of ``corpus.render_html``'s
    ``html.escape(text, quote=False)`` (&amp;/&lt;/&gt; only — escape
    guarantees every raw '&' became '&amp;', so the three sequential
    replacements in reverse order ARE html.unescape on this input set).
    """
    import pyarrow.compute as pc

    html_bin = batch.column("html")
    if html_bin.null_count:
        html_bin = pc.fill_null(html_bin, b"")
    try:
        s = pc.cast(html_bin, pa.string())
    except Exception:
        return None
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n = batch.num_rows
    has_end = pc.match_substring(s, "</body></html>")
    m = pc.extract_regex(s, r"(?s)<p>(?P<t>.*?)</p>")
    t_raw = pc.struct_field(m, "t")
    valid = pc.fill_null(pc.and_kleene(has_end, pc.is_valid(t_raw)), False)
    txt = pc.replace_substring(pc.fill_null(t_raw, ""),
                               pattern="&lt;", replacement="<")
    txt = pc.replace_substring(txt, pattern="&gt;", replacement=">")
    txt = pc.replace_substring(txt, pattern="&amp;", replacement="&")
    texts = pc.if_else(valid, txt, "")

    # multi-match '<img src="..."/>': split on the literal prefix, then the
    # piece must START with url + '"/>' (anchored regex == the scalar regex)
    parts = pc.split_pattern(s, pattern='<img src="')
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs = np.asarray(parts.offsets)
    flat = pc.list_flatten(parts)
    nf = len(flat)
    keep = np.ones(nf, dtype=bool)
    keep[offs[:-1]] = False                 # first piece per row is pre-text
    cand_idx = np.flatnonzero(keep)
    row_of = np.repeat(np.arange(n), np.diff(offs))
    vmask = valid.to_numpy(zero_copy_only=False)
    if len(cand_idx):
        cand = flat.take(pa.array(cand_idx))
        um = pc.extract_regex(cand, r'^(?P<u>[^"]*)"/>')
        urls = pc.struct_field(um, "u")
        uvalid = pc.is_valid(um).to_numpy(zero_copy_only=False)
        rowc = row_of[cand_idx]
        link_ok = uvalid & vmask[rowc]
        raw_counts = np.bincount(rowc[link_ok], minlength=n)
        low = pc.utf8_lower(pc.fill_null(urls, ""))
        extm = None
        for ext in sorted(IMAGE_EXTENSIONS):    # M9 gate, 7 suffix kernels
            e = pc.ends_with(low, pattern=ext)
            extm = e if extm is None else pc.or_(extm, e)
        keep_l = link_ok & extm.to_numpy(zero_copy_only=False)
        kept_idx = np.flatnonzero(keep_l)
        kept_urls = pc.cast(urls.take(pa.array(kept_idx)), pa.string())
        if isinstance(kept_urls, pa.ChunkedArray):
            kept_urls = kept_urls.combine_chunks()
        counts_kept = np.bincount(rowc[kept_idx], minlength=n)
    else:
        raw_counts = np.zeros(n, dtype=np.int64)
        counts_kept = np.zeros(n, dtype=np.int64)
        kept_urls = pa.array([], type=pa.string())
    loffs = np.concatenate([[0], np.cumsum(counts_kept)]).astype(np.int32)
    links_arr = pa.ListArray.from_arrays(
        pa.array(loffs, type=pa.int32()), kept_urls)
    sizes = pc.binary_length(html_bin).cast(pa.int64())
    return (pc.cast(texts, pa.string()),
            links_arr,
            pa.array(raw_counts.astype(np.int64)),
            pc.cast(valid, pa.bool_()),
            sizes)


# content-keyed signature memo, per worker process: md5 and simhash are pure
# functions of the text, and crawl corpora carry heavy exact duplication
# (boilerplate, mirrors, re-fetches) — recomputing the signature per COPY is
# wasted CPU that grows with the duplication factor. Bounded; cleared when
# full (vocabulary-of-contents, not rows).
_SIG_CACHE: dict[str, tuple[bytes, int]] = {}
_SIG_CACHE_MAX = 65536


def _signatures(texts: list[str]) -> tuple[list[bytes], list[int]]:
    cache = _SIG_CACHE
    miss = [i for i, t in enumerate(texts) if t not in cache]
    if miss:
        miss_ph = simhash64_batch([texts[i] for i in miss])
        if len(cache) + len(miss) > _SIG_CACHE_MAX:
            cache.clear()
        for j, i in enumerate(miss):
            t = texts[i]
            cache[t] = (hashlib.md5(t.encode("utf-8")).digest(),
                        int(miss_ph[j]))
    md5s, phashes = [], []
    for t in texts:
        d, p = cache[t]
        md5s.append(d)
        phashes.append(p)
    return md5s, phashes


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> extracted batch. Stateless ``map_batches`` stage.

    Keeps lineage columns present in the input (url, doc_id, plus frontier
    attribution columns when run post-fetch) and DROPS the html column on the
    way out — wide binary payloads must not travel further than extraction
    (SURVEY §7.5 item 5). Hot path is the Arrow-kernel core; the scalar
    :func:`extract_one` loop is the reference spec and the non-utf8 fallback.
    """
    vec = _extract_columns_vectorized(batch)
    if vec is not None:
        texts_a, links_arr, raw_arr, valid_a, sizes_a = vec
        texts = texts_a.to_pylist()
        md5s, phashes = _signatures(texts)
        drop = ["html"] + (["text"] if "text" in batch.column_names else [])
        out = batch.drop_columns(drop)
        out = out.append_column("text", texts_a)
        out = out.append_column("image_links", links_arr)
        out = out.append_column("n_links_raw", raw_arr)
        out = out.append_column("valid", valid_a)
        out = out.append_column("content_md5",
                                pa.array(md5s, type=pa.binary(16)))
        out = out.append_column("phash",
                                pa.array(phashes, type=pa.uint64()))
        return out.append_column("html_bytes", sizes_a)
    htmls = batch.column("html").to_pylist()
    texts: list[str] = []
    links: list[list[str]] = []
    raw_counts: list[int] = []
    valids: list[bool] = []
    sizes: list[int] = []
    for h in htmls:
        h = h or b""
        t, ln, v = extract_one(h)
        texts.append(t)
        raw_counts.append(len(ln))
        links.append(filter_image_links(ln))   # M9 extension gate
        valids.append(v)
        sizes.append(len(h))
    md5s, phashes = _signatures(texts)
    drop = ["html"] + (["text"] if "text" in batch.column_names else [])
    out = batch.drop_columns(drop)
    out = out.append_column("text", pa.array(texts, type=pa.string()))
    out = out.append_column(
        "image_links", pa.array(links, type=pa.list_(pa.string()))
    )
    out = out.append_column("n_links_raw",
                            pa.array(raw_counts, type=pa.int64()))
    out = out.append_column("valid", pa.array(valids, type=pa.bool_()))
    out = out.append_column(
        "content_md5", pa.array(md5s, type=pa.binary(16))
    )
    out = out.append_column("phash", pa.array(phashes, type=pa.uint64()))
    out = out.append_column("html_bytes", pa.array(sizes, type=pa.int64()))
    return out


def extracted_dataset(pages_ds, batch_size: int = 2048):
    """pages Dataset -> extracted Dataset (drops html early).

    Modest batch_size on purpose: the fingerprint kernels allocate a few MB
    per batch, and keeping those inside the allocator's reused arena matters
    on machines where fresh page faults are expensive (see
    ``pixcrawler_ray._tune_allocator``).
    """
    return pages_ds.map_batches(extract_batch, batch_format="pyarrow",
                                batch_size=batch_size)
