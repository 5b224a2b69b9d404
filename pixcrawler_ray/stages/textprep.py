"""Training-data preparation operators: PII scrubbing, segment-level
(CCNet-style) dedup, inverted-index postings, shuffled context packing,
and bigram-LM frequency scoring — over the ``documents`` table.

The reference has no text-prep beyond keyword munging
(``builder/_keywords.py``); these are the corpus-preparation stages an
LLM-scale pipeline runs after the crawl (public-literature shapes: CCNet
paragraph dedup [Wenzek et al.], n-gram LM quality scoring, sequence
packing, PII redaction a la C4/Dolma), each a vectorized ``map_batches``
stage with the wide steps expressed as keyed bucket shuffles.

All oracled outputs are integer/string exact (no float accumulations —
see the float-safety rule in the repo's oracle notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pixcrawler_ray.sources.readers import read_table

# RE2 patterns — identical semantics in Arrow (RE2) and DuckDB (RE2), so
# the scrub replays verbatim as regexp_replace/regexp_extract_all.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


def scrub_pii_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Redact emails → phones → IPv4 (in that fixed order: an address that
    survives an earlier pass can still match a later one, so both sides
    chain identically). Adds ``clean_text`` plus per-pattern match counts,
    each counted on the text as it stood BEFORE that pattern's replacement.
    Pure Arrow RE2 kernels — zero per-row Python."""
    s0 = t.column(col)
    n_emails = pc.count_substring_regex(s0, PII_EMAIL)
    s1 = pc.replace_substring_regex(s0, PII_EMAIL, "<EMAIL>")
    n_phones = pc.count_substring_regex(s1, PII_PHONE)
    s2 = pc.replace_substring_regex(s1, PII_PHONE, "<PHONE>")
    n_ips = pc.count_substring_regex(s2, PII_IPV4)
    s3 = pc.replace_substring_regex(s2, PII_IPV4, "<IP>")
    t = t.append_column("clean_text", s3)
    t = t.append_column("n_emails", n_emails.cast(pa.int64()))
    t = t.append_column("n_phones", n_phones.cast(pa.int64()))
    return t.append_column("n_ips", n_ips.cast(pa.int64()))


def pii_scrub(sf_dir: str):
    """PII-redaction query over ``documents``: the synthetic corpus has no
    natural PII, so each doc is first augmented with a DETERMINISTIC contact
    trailer derived from ``doc_id`` (email + phone + IP; docs with
    doc_id%3==0 get a second email) — the identical expression is built in
    the SQL oracle, so the scrub kernel itself is what's under test.
    Output (doc_id, n_emails, n_phones, n_ips, clean_text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def kernel(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d = ids.astype(np.int64)

        def s(arr) -> pa.Array:   # int column -> string column (vectorized)
            return pc.cast(pa.array(arr, type=pa.int64()), pa.string())

        extra = pa.array(np.where(d % 3 == 0,
                                  " and admin@corp.example.org", ""),
                         type=pa.string())
        n = t.num_rows

        def const(v: str) -> pa.Array:
            return pa.array([v] * n, type=pa.string())

        aug = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()),
            const(" contact user"), s(d), const("@mail"), s(d % 7),
            const(".example.com"), extra, const(" call +1-"),
            s(100 + d % 900), const("-"), s(1000 + d % 9000),
            const(" from 10.0."), s(d % 256), const("."), s((d * 3) % 256),
            "")
        out = scrub_pii_batch(pa.table({"doc_id": t.column("doc_id"),
                                        "text": aug}))
        return out.select(["doc_id", "n_emails", "n_phones", "n_ips",
                           "clean_text"])

    return ds.map_batches(kernel, batch_format="pyarrow")


# text_normalize RE2 patterns — identical semantics in Arrow and DuckDB
# (both RE2; the \xNN escapes are interpreted by RE2 itself, so the same
# pattern string works verbatim on both sides).
NORM_CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
NORM_WS = r"[ \t\r\n\f\v]+"


def normalize_text_batch(t: pa.Table, col: str = "text") -> pa.Table:
    """Unicode/whitespace normalization (C4/Dolma-style cleanup): NFC
    normalize -> strip C0/DEL control chars -> collapse ASCII whitespace
    runs to single spaces -> trim. Adds ``norm_text`` plus codepoint
    lengths before/after and a ``changed`` flag.

    NFC uses the ICU quick-check shape: ASCII is NFC by construction, so
    an Arrow RE2 scan flags only rows containing non-ASCII codepoints and
    the scalar ``unicodedata.normalize`` touches just that subset (this
    build's ``pc.utf8_normalize`` decomposes regardless of ``form`` —
    verified NFC(precomposed) growing 5->6 codepoints — so it cannot be
    the compose step). Everything else is vectorized Arrow kernels."""
    import unicodedata

    s0 = t.column(col).cast(pa.string())
    if isinstance(s0, pa.ChunkedArray):
        s0 = s0.combine_chunks()
    n_before = pc.utf8_length(s0)
    non_ascii = pc.match_substring_regex(s0, r"[^\x00-\x7f]")
    mask = non_ascii.to_numpy(zero_copy_only=False)
    if mask.any():
        idx = np.nonzero(mask)[0]
        vals = s0.take(pa.array(idx)).to_pylist()
        comp = pa.array(
            [None if v is None else unicodedata.normalize("NFC", v)
             for v in vals], type=pa.string())
        s1 = pc.replace_with_mask(s0, non_ascii, comp)
    else:
        s1 = s0
    s2 = pc.replace_substring_regex(s1, NORM_CTRL, "")
    s3 = pc.replace_substring_regex(s2, NORM_WS, " ")
    s4 = pc.utf8_trim(s3, " ")
    n_after = pc.utf8_length(s4)
    t = t.append_column("norm_text", s4)
    t = t.append_column("n_before", n_before.cast(pa.int64()))
    t = t.append_column("n_after", n_after.cast(pa.int64()))
    # string inequality, not length inequality: length-preserving edits
    # (tab -> space) must still report changed=1
    return t.append_column(
        "changed", pc.cast(pc.not_equal(t.column(col).cast(pa.string()), s4),
                           pa.int64()))


def text_normalize(sf_dir: str):
    """Normalization query over ``documents``: the synthetic corpus is
    ASCII-clean, so each doc is first augmented with a DETERMINISTIC dirty
    trailer derived from ``doc_id`` (an NFD combining sequence, a tab, a
    variable-width space run, and a BEL control char on even ids) — the
    identical expression is built in the SQL oracle with ``chr()``, so the
    normalization kernel itself is what's under test.
    Output (doc_id, n_before, n_after, changed, norm_text)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def kernel(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        d = ids.astype(np.int64)
        n = t.num_rows

        def const(v: str) -> pa.Array:
            return pa.array([v] * n, type=pa.string())

        spaces = pa.array([" " * (1 + int(x % 3)) for x in d],
                          type=pa.string())
        bel = pa.array(np.where(d % 2 == 0, "\x07", ""), type=pa.string())
        aug = pc.binary_join_element_wise(
            t.column("text").cast(pa.string()),
            spaces, const("école\tfin"), bel, "")
        out = normalize_text_batch(pa.table({"doc_id": t.column("doc_id"),
                                             "text": aug}))
        return out.select(["doc_id", "n_before", "n_after", "changed",
                           "norm_text"])

    return ds.map_batches(kernel, batch_format="pyarrow")


def _nonempty_words(col):
    """(flat_words, doc_word_counts) with empty strings dropped — matches
    DuckDB ``list_filter(string_split(text,' '), w -> w <> '')`` exactly
    (Arrow's whitespace split yields '' segments where Python yields
    nothing; both sides filter)."""
    words = pc.utf8_split_whitespace(col)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offs = np.asarray(words.offsets, dtype=np.int64)
    flat = pc.list_flatten(words)
    keep = pc.greater(pc.utf8_length(flat), 0)
    kept = np.asarray(keep.to_numpy(zero_copy_only=False), dtype=np.int64)
    cs = np.concatenate([[0], np.cumsum(kept)])
    nw = cs[offs[1:]] - cs[offs[:-1]]
    return flat.filter(keep), nw


def explode_segments(t: pa.Table, k: int = 12) -> pa.Table:
    """Explode docs into k-word segments (the corpus has no newlines, so the
    CCNet 'paragraph' is a fixed k-word window; last segment may be short).
    All-Arrow: the per-segment text is a ``binary_join`` over a re-offset
    view of the SAME flat word buffer — no per-segment Python joins."""
    flat, nw = _nonempty_words(t.column("text"))
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    nseg = -(-nw // k)                      # ceil; 0 for empty docs
    total = int(nseg.sum())
    if total == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "seg_idx": pa.array([], type=pa.int64()),
                         "n_segs": pa.array([], type=pa.int64()),
                         "seg_text": pa.array([], type=pa.string())})
    seg_local = np.arange(total, dtype=np.int64) \
        - np.repeat(np.concatenate([[0], np.cumsum(nseg)[:-1]]), nseg)
    doc_start = np.concatenate([[0], np.cumsum(nw)[:-1]])
    starts = np.repeat(doc_start, nseg) + seg_local * k
    offsets = np.append(starts, int(nw.sum()))
    # int64 offsets (LargeList): a batch with >2^31 total words must not
    # silently wrap segment boundaries
    seg_list = pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), flat)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, nseg)),
        "seg_idx": pa.array(seg_local),
        "n_segs": pa.array(np.repeat(nseg, nseg)),
        "seg_text": pc.binary_join(seg_list, " "),
    })


# global order key for segment keep-first: doc_id * 2^20 + seg_idx.
# Assumes < 2^20 segments per doc and doc_id < 2^43 — fine for web docs
# (a 2^20-segment doc is a ~12M-word page); overflow would need a
# two-column order key in keep_first_n.
_SEG_ORD = 1 << 20


def segment_dedup(sf_dir: str, k: int = 12, num_buckets: int = 32):
    """CCNet-shape segment-level dedup: explode every doc into k-word
    segments, keep the GLOBALLY first occurrence of each distinct segment
    text (order = (doc_id, seg_idx)), and reassemble each doc from its kept
    segments in order. Docs whose segments are all duplicates drop out
    (CCNet drops empty docs too).

    Scale shape: one keyed keep-first shuffle on seg_text (hash-bucketed —
    the exact-dedup primitive), one doc-keyed shuffle to reassemble; the
    reassembly join is an Arrow ``binary_join`` over the sorted segment
    lists, no per-doc Python. Output (doc_id, n_segs, n_kept, clean_text).
    """
    from pixcrawler_ray.stages.shuffle import keep_first_n, per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        e = explode_segments(t, k=k)
        ordv = pc.add(pc.multiply(e.column("doc_id"),
                                  pa.scalar(_SEG_ORD, type=pa.int64())),
                      e.column("seg_idx"))
        return e.append_column("ord", ordv)

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    kept = keep_first_n(exploded, ["seg_text"], "ord", 1,
                        num_buckets=num_buckets)
    return per_bucket(kept, ["doc_id"], _reassemble_kept_segments,
                      num_buckets=num_buckets)


def _reassemble_kept_segments(df: pd.DataFrame) -> pd.DataFrame:
    """Doc-keyed reassembly kernel shared by segment_dedup and
    boilerplate_filter: rebuild each doc's clean_text from its surviving
    segments in (doc_id, seg_idx) order via one Arrow binary_join."""
    df = df.sort_values(["doc_id", "seg_idx"], kind="mergesort")
    ids, counts = np.unique(df["doc_id"].to_numpy(), return_counts=True)
    # np.unique sorts ascending and df is doc-sorted, so counts align
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    seg_list = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(df["seg_text"].to_numpy(),
                                    type=pa.string()))
    clean = pc.binary_join(seg_list, " ")
    first = df.groupby("doc_id", sort=True)["n_segs"].first()
    return pd.DataFrame({
        "doc_id": ids,
        "n_segs": first.to_numpy().astype(np.int64),
        "n_kept": counts.astype(np.int64),
        "clean_text": clean.to_pandas().to_numpy(),
    })


def boilerplate_filter(sf_dir: str, min_df: int = 3, k: int = 12,
                       num_buckets: int = 32):
    """CCNet-style boilerplate removal: drop every segment whose GLOBAL
    occurrence count across the corpus is >= ``min_df`` (nav menus,
    footers, cookie banners — text repeated verbatim on many pages), keep
    everything else, and reassemble each doc from its surviving segments
    in order. Unlike ``segment_dedup`` (which keeps the FIRST occurrence
    of a repeated segment), boilerplate removal drops ALL occurrences of a
    frequent segment — the two compose: boilerplate first, then dedup.
    Docs whose segments are all boilerplate drop out. Output
    (doc_id, n_segs, n_kept, clean_text).

    Scale shape: identical to segment_dedup — one seg_text-keyed bucket
    exchange (the per-group kernel counts occurrences and emits all rows
    of groups under the threshold; partials bounded by bucket size), then
    one doc-keyed reassembly exchange. No broadcast of the segment-count
    table (it is corpus-sized) and no driver materialization."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        return explode_segments(t, k=k)

    def rare_only(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby("seg_text", sort=False)["doc_id"].transform("size")
        return df[cnt.to_numpy() < min_df]

    rare = per_bucket(ds.map_batches(explode, batch_format="pyarrow"),
                      ["seg_text"], rare_only, num_buckets=num_buckets)
    return per_bucket(rare, ["doc_id"], _reassemble_kept_segments,
                      num_buckets=num_buckets)


# distinct-word 64-bit hash cache, per worker process (the BPE stage's
# distinct-word-cache pattern): web text repeats words heavily, so the
# scalar blake2b cost is paid once per distinct word, not per token.
_WORDHASH_CACHE: dict[str, int] = {}
_WORDHASH_CACHE_MAX = 1 << 20


def _word_hash64(flat: pa.Array) -> np.ndarray:
    from pixcrawler_ray.functions.hashing import hash64
    cache = _WORDHASH_CACHE
    out = np.empty(len(flat), dtype=np.uint64)
    for i, sv in enumerate(flat.to_pylist()):
        h = cache.get(sv)
        if h is None:
            if len(cache) >= _WORDHASH_CACHE_MAX:
                cache.clear()
            h = hash64(sv or "")
            cache[sv] = h
        out[i] = h
    return out


def explode_ngrams(t: pa.Table, w: int = 8,
                   hashed: bool = False) -> pa.Table:
    """(doc_id, pos, ngram) for every w-word window of each doc (the
    Lee et al. 2022 ExactSubstr explode; ``pos`` is the 0-based word index
    of the window start). Windows overlap, so a single list-offsets view is
    impossible — instead the ngram strings are one
    ``binary_join_element_wise`` over ``w`` shifted gathers of the SAME
    flat word buffer: w vectorized takes + one Arrow join, no per-window
    Python. Separator is US (0x1f) so joined windows can't collide across
    word boundaries."""
    flat, nw = _nonempty_words(t.column("text"))
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    npos = np.maximum(nw - w + 1, 0)
    total = int(npos.sum())
    if total == 0:
        ng_type = pa.int64() if hashed else pa.string()
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "pos": pa.array([], type=pa.int64()),
                         "ngram": pa.array([], type=ng_type)})
    pos_local = np.arange(total, dtype=np.int64) \
        - np.repeat(np.concatenate([[0], np.cumsum(npos)[:-1]]), npos)
    doc_start = np.concatenate([[0], np.cumsum(nw)[:-1]])
    starts = np.repeat(doc_start, npos) + pos_local
    if hashed:
        # 8 B/window scale path: FNV-1a-fold the per-word 64-bit hashes —
        # one numpy pass per window offset, no string materialization
        from pixcrawler_ray.functions.hashing import _FNV_OFFSET, _FNV_PRIME
        wh = _word_hash64(flat)
        h = np.full(total, _FNV_OFFSET ^ np.uint64(w), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(w):
                h = (h ^ wh[starts + j]) * _FNV_PRIME
        ng = pa.array(h.view(np.int64))
    else:
        cols = [flat.take(pa.array(starts + j)) for j in range(w)]
        ng = pc.binary_join_element_wise(*cols, "\x1f")
    return pa.table({"doc_id": pa.array(np.repeat(ids, npos)),
                     "pos": pa.array(pos_local),
                     "ngram": ng})


def exact_substr_spans(sf_dir: str, w: int = 8, num_buckets: int = 32,
                       hash_windows: bool = False):
    """ExactSubstr-shape duplicate-span finder (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    w-word window occurring more than once in the corpus — across OR within
    docs, exactly the suffix-array criterion — marks its [pos, pos+w) token
    span; overlapping/adjacent marked spans per doc merge into maximal
    spans, the ranges ExactSubstr would cut. SQL-oracled.

    Distributed shape (the paper's suffix array is a single-machine
    artifact; the streaming equivalent is this explode): ngram-keyed bucket
    exchange -> duplicated-window locations (groups are complete per
    bucket, so the >1 count is global) -> doc-keyed bucket exchange ->
    vectorized island merge. Nothing corpus-sized transits the driver; the
    explode is w gathers per batch. At 100 TB, ``w`` windows ship ~w x the
    corpus bytes through one exchange — ``hash_windows=True`` is the scale
    path: each window keys the exchange by its 64-bit FNV-1a hash instead
    (8 B/window; a cross-window collision can only ADD a span mark, and a
    span-identical equality vs the string path is pinned in pytest). The
    default stays strings for exact SQL-oracle parity.

    Output (doc_id, span_start, span_end) in 0-based word indices,
    span_end exclusive.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    exploded = ds.map_batches(
        lambda t: explode_ngrams(t, w=w, hashed=hash_windows),
        batch_format="pyarrow")

    def dup_locs(df: pd.DataFrame) -> pd.DataFrame:
        n = df.groupby("ngram", sort=False)["doc_id"].transform("size")
        out = df.loc[n.to_numpy() > 1, ["doc_id", "pos"]]
        if not len(out):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "pos": pd.Series(dtype=np.int64)})
        return out

    hits = per_bucket(exploded, ["ngram"], dup_locs,
                      num_buckets=num_buckets)

    def spans(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "span_start": pd.Series(dtype=np.int64),
                                 "span_end": pd.Series(dtype=np.int64)})
        df = df.sort_values(["doc_id", "pos"], kind="mergesort")
        ids = df["doc_id"].to_numpy().astype(np.int64)
        p = df["pos"].to_numpy().astype(np.int64)
        brk = np.ones(len(p), dtype=bool)
        # new island at a doc change or a gap wider than the window (equal
        # widths: spans [a,a+w) and [b,b+w) with b>a merge iff b-a <= w,
        # i.e. they overlap or touch)
        brk[1:] = (ids[1:] != ids[:-1]) | (p[1:] - p[:-1] > w)
        si = np.flatnonzero(brk)
        ei = np.append(si[1:], len(p)) - 1
        return pd.DataFrame({"doc_id": ids[si], "span_start": p[si],
                             "span_end": p[ei] + w})

    return per_bucket(hits, ["doc_id"], spans, num_buckets=num_buckets)


def term_postings(sf_dir: str, num_buckets: int = 16):
    """Inverted-index build, posting-list summary form: per distinct term,
    document frequency, total term frequency, and min/max/sum of the doc-id
    posting list (order-insensitive integer summaries instead of the raw
    list — list-valued outputs hash badly; the full postings are the same
    groupby one ``collect_list`` away).

    Scale shape: per-batch partial aggregation (docs never span batches, so
    batch-distinct doc counts sum exactly), ONE tiny term-keyed bucket
    exchange (vocab << corpus by Heaps' law) — the same map-side-combine
    plan as ``textstats.top_terms``. Output
    (term, df, tf, min_doc, max_doc, sum_doc)."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, nw = _nonempty_words(t.column("text"))
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        docs = np.repeat(ids, nw)
        df = pd.DataFrame({"term": flat.to_pandas().to_numpy(),
                           "doc_id": docs})
        per_doc = (df.groupby(["term", "doc_id"], sort=False)
                   .size().rename("tf").reset_index())
        g = per_doc.groupby("term", sort=False).agg(
            df=("doc_id", "size"), tf=("tf", "sum"),
            min_doc=("doc_id", "min"), max_doc=("doc_id", "max"),
            sum_doc=("doc_id", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", sort=False).agg(
            df=("df", "sum"), tf=("tf", "sum"), min_doc=("min_doc", "min"),
            max_doc=("max_doc", "max"),
            sum_doc=("sum_doc", "sum")).reset_index()

    return per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                      ["term"], merge, num_buckets=num_buckets)


_PACK_RANGES = 64
_MERS31 = 2147483647


def scan_prefix_tokens(sf_dir: str):
    """Distributed EXCLUSIVE prefix sum of per-doc token counts in the
    seeded global shuffle order (Lehmer rank) — the shared scan primitive
    behind ``pack_contexts`` (bin = prefix // budget) and
    ``token_budget_cut`` (include while prefix + n_tokens <= budget).
    Returns (doc_id, shuffle_rank, n_tokens, prefix_before), all int64.

    The global prefix sum is distributed as a two-step scan (no sort, no
    driver-side row loop):

    1. shuffle ranks are uniform on [0, 2^31-1), so rank-range id
       ``r = rank * R >> 31`` RANGE-partitions the order; per-range token
       totals are map-side combined into an R-row table, exclusive-scanned
       on the driver (R = 64 rows), and broadcast;
    2. one range-keyed bucket shuffle; each range kernel sorts its ranks,
       local-cumsums, and adds its broadcast base — exact global prefix.

    Ranks are collision-free below 2^31-1 ids (Lehmer bijection), so the
    order — and everything derived from the scan — is total and
    resume-stable."""
    from pixcrawler_ray.stages.sample import lehmer_rank
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        _, nw = _nonempty_words(t.column("text"))
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank = lehmer_rank(ids)
        rng = (rank * _PACK_RANGES) >> 31
        return pa.table({"doc_id": pa.array(ids),
                         "shuffle_rank": pa.array(rank),
                         "n_tokens": pa.array(nw),
                         "rng": pa.array(rng)})

    toks = ds.map_batches(tokens, batch_format="pyarrow")

    # step 1 via the shared two-step-scan helper (reduce='sum')
    from pixcrawler_ray.stages.shuffle import range_scan_totals
    totals = range_scan_totals(toks, "rng", "n_tokens", reduce="sum")
    base = dict(zip(
        totals["rng"].to_numpy(),
        np.concatenate([[0],
                        np.cumsum(totals["n_tokens"].to_numpy())[:-1]
                        ]).astype(np.int64)))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        # per_bucket hands a UNION of ranges (bucket = hash(rng) % B) —
        # the scan must restart at each range's own broadcast base, so
        # sort by (rng, rank) and subtract each range's running start
        df = df.sort_values(["rng", "shuffle_rank"], kind="mergesort")
        tok = df["n_tokens"].to_numpy().astype(np.int64)
        rng = df["rng"].to_numpy().astype(np.int64)
        cum_prev = np.concatenate([[0], np.cumsum(tok)[:-1]])
        starts = np.flatnonzero(np.concatenate(
            [[True], rng[1:] != rng[:-1]]))
        # zero the cumsum at each range boundary, then add that range's base
        prev = cum_prev - np.repeat(cum_prev[starts],
                                    np.diff(np.append(starts, len(rng))))
        bases = np.array([base.get(int(r), 0) for r in rng[starts]],
                         dtype=np.int64)
        prev = prev + np.repeat(bases,
                                np.diff(np.append(starts, len(rng))))
        out = df[["doc_id", "shuffle_rank", "n_tokens"]].copy()
        out["prefix_before"] = prev
        return out

    # each range is one key → lands whole in one kernel; ranges are
    # uniform by construction so no hot bucket
    return per_bucket(toks, ["rng"], pack, num_buckets=8)


def pack_contexts(sf_dir: str, budget: int = 256):
    """Shuffled sequence packing: assign each doc to a fixed-token-budget
    context bin by CUMULATIVE token count in the seeded global shuffle
    order: ``bin_id = floor(prefix_tokens_before_me / budget)`` — the
    sequence-packing step that turns a curated corpus into training
    contexts. Output (doc_id, shuffle_rank, n_tokens, bin_id), all int64.
    One vectorized map over the distributed scan (``scan_prefix_tokens``)."""

    def binned(t: pa.Table) -> pa.Table:
        b = pc.divide(t.column("prefix_before"),
                      pa.scalar(budget, type=pa.int64()))
        return pa.table({"doc_id": t.column("doc_id"),
                         "shuffle_rank": t.column("shuffle_rank"),
                         "n_tokens": t.column("n_tokens"),
                         "bin_id": b})

    return scan_prefix_tokens(sf_dir).map_batches(
        binned, batch_format="pyarrow")


def balanced_shards(sf_dir: str, n_shards: int = 8, num_buckets: int = 16):
    """Balanced shard assignment by token mass — snake (boustrophedon)
    placement over docs ranked by (n_tokens DESC, doc_id ASC): rank r goes
    to shard ``r % k`` on even passes and ``k-1 - r % k`` on odd passes,
    the classic deterministic near-LPT balancer (per-shard totals differ
    by at most one document) used to cut training corpora into equal-work
    shards for tokenizer/dataloader fleets.

    The global rank needs NO global sort: (1) per-batch partial token-
    count histograms merge through one n_tokens-keyed exchange into the
    global (n_tokens → count) table — bounded by DISTINCT document
    lengths, not corpus size — whose exclusive cumsum in DESC token order
    (computed on the driver over that bounded table, broadcast once)
    gives each token value its rank base; (2) one n_tokens-keyed exchange
    ranks ties by doc_id; global rank = base + tie rank. Output
    (doc_id, rank, n_tokens, shard_id), all int64; SQL replays it as one
    ROW_NUMBER window.
    """
    import ray as _ray

    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        _, nw = _nonempty_words(t.column("text"))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_tokens": pa.array(nw.astype(np.int64))})

    docs = ds.map_batches(toks, batch_format="pyarrow")

    def hist_partial(t: pa.Table) -> pa.Table:
        v, c = np.unique(t.column("n_tokens").to_numpy(), return_counts=True)
        return pa.table({"n_tokens": pa.array(v.astype(np.int64)),
                         "cnt": pa.array(c.astype(np.int64))})

    def hist_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("n_tokens", sort=False)["cnt"].sum().reset_index()

    hist = per_bucket(docs.map_batches(hist_partial, batch_format="pyarrow"),
                      ["n_tokens"], hist_merge,
                      num_buckets=4).to_pandas()
    hist = hist.sort_values("n_tokens", ascending=False)
    base = dict(zip(
        hist["n_tokens"].to_numpy(),
        np.concatenate([[0], np.cumsum(hist["cnt"].to_numpy())[:-1]])
        .astype(np.int64)))
    base_ref = _ray.put(base)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        b = _ray.get(base_ref)
        g = g.sort_values(["n_tokens", "doc_id"], kind="mergesort")
        tie = g.groupby("n_tokens", sort=False).cumcount().to_numpy()
        tok = g["n_tokens"].to_numpy()
        rank = np.array([b[int(v)] for v in tok[
            np.concatenate([[True], tok[1:] != tok[:-1]])]],
            dtype=np.int64)  # one lookup per distinct value in this bucket
        starts = np.flatnonzero(np.concatenate(
            [[True], tok[1:] != tok[:-1]]))
        rank = np.repeat(rank, np.diff(np.append(starts, len(tok))))
        rank = rank + tie
        q, pos = np.divmod(rank, n_shards)
        shard = np.where(q % 2 == 0, pos, n_shards - 1 - pos)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
            "rank": rank,
            "n_tokens": tok.astype(np.int64),
            "shard_id": shard.astype(np.int64)})

    return per_bucket(docs, ["n_tokens"], assign, num_buckets=num_buckets)


def token_budget_cut(sf_dir: str, budget_tokens: int = 20_000):
    """Fixed-token training-mix cut: take WHOLE docs in the seeded global
    shuffle order until the token budget is exhausted — a doc is included
    iff its inclusive prefix ``prefix_before + n_tokens <= budget_tokens``
    (never exceeds the budget; deterministic, resume-stable). The standard
    "give me exactly <= N tokens of this corpus, uniformly shuffled" step
    before training. Output (doc_id, shuffle_rank, n_tokens, cum_end) for
    the INCLUDED docs only, all int64.

    Scale shape: one vectorized filter-map over the same distributed
    two-step prefix scan as ``pack_contexts`` — no sort, no driver rows
    beyond the 64-row range table."""

    def cut(t: pa.Table) -> pa.Table:
        cum = pc.add(t.column("prefix_before"), t.column("n_tokens"))
        keep = pc.less_equal(cum, pa.scalar(budget_tokens, type=pa.int64()))
        out = pa.table({"doc_id": t.column("doc_id"),
                        "shuffle_rank": t.column("shuffle_rank"),
                        "n_tokens": t.column("n_tokens"),
                        "cum_end": cum})
        return out.filter(keep)

    return scan_prefix_tokens(sf_dir).map_batches(
        cut, batch_format="pyarrow")


def doc_bigrams(t: pa.Table) -> pd.DataFrame:
    """Consecutive same-doc word pairs of one batch as (doc_id, w1, w2) —
    the single shared bigram extractor (bigram_lm_stats, sketch heavy
    hitters). Pairs never cross doc boundaries: the mask drops each doc's
    last word from the w1 position."""
    flat, nw = _nonempty_words(t.column("text"))
    ids = t.column("doc_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    w = flat.to_pandas().to_numpy()
    if len(w) < 2:
        # typed empty frame: object-dtype [] would infer null-typed Arrow
        # columns and break schema unification across blocks
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "w1": pd.Series([], dtype="string"),
                             "w2": pd.Series([], dtype="string")})
    ends = np.cumsum(nw)
    last = np.zeros(len(w), dtype=bool)
    last[ends[nw > 0] - 1] = True
    keep = ~last[:-1]
    return pd.DataFrame({
        "doc_id": np.repeat(ids, nw)[:-1][keep],
        "w1": w[:-1][keep], "w2": w[1:][keep]})


def bigram_lm_stats(sf_dir: str, broadcast_max_rows: int = 2_000_000):
    """Bigram language-model frequency scoring — the n-gram LM quality
    signal (CCNet's KenLM-perplexity shape) with integer-exact outputs: for
    each doc, the number of bigrams, and the sums over its bigrams of the
    GLOBAL corpus counts C(w1,w2) and context counts C(w1·) (a doc of
    common transitions scores high ≈ low perplexity; a doc of rare ones
    scores low). The float log-prob is one vectorized log away but floats
    don't value-hash — the sums are the oracle-stable core.

    Size-switched plan (same shape as dedup's ``_filter_by_ids``): the
    global bigram count table is built via per-batch partials + one
    w1-keyed exchange, then
    - **broadcast path** (vocab <= ``broadcast_max_rows``): table shipped
      ONCE via ``ray.put``; per-batch doc bigrams scored by a vectorized
      merge — the fast path at test scale;
    - **join path** (vocab above the cap — bigram vocabulary at 100 TB is
      billions of pairs, not a broadcastable object): doc bigrams exploded
      once and joined to the count table through a w1-keyed bucket
      exchange (context counts C(w1.) recomputed INSIDE the bucket, since
      all (w1,*) count rows co-locate with it), then per-doc partials
      summed through one doc_id-keyed exchange — two keyed exchanges, no
      driver or broadcast structure proportional to the vocabulary.
    Both paths are row-identical (pytest:
    test_bigram_lm_join_path_matches_broadcast).
    Output (doc_id, n_bigrams, sum_bigram_freq, sum_context_freq)."""
    import ray

    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = (doc_bigrams(t).groupby(["w1", "w2"], sort=False)
             .size().rename("n").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def count_merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["w1", "w2"], sort=False)["n"].sum()
                .reset_index())

    big_ds = per_bucket(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["w1"], count_merge, num_buckets=4).materialize()

    if big_ds.count() > broadcast_max_rows:
        return _bigram_lm_join_path(ds, big_ds)

    big = big_ds.to_pandas()
    ctx = big.groupby("w1", sort=False)["n"].sum().rename("cn").reset_index()
    big_ref = ray.put((big, ctx))

    def score(t: pa.Table) -> pa.Table:
        btab, ctab = ray.get(big_ref)
        db = doc_bigrams(t)
        if not len(db):
            return pa.table({k: pa.array([], type=pa.int64())
                             for k in ("doc_id", "n_bigrams",
                                       "sum_bigram_freq",
                                       "sum_context_freq")})
        m = db.merge(btab, on=["w1", "w2"], how="left") \
              .merge(ctab, on="w1", how="left")
        g = m.groupby("doc_id", sort=False).agg(
            n_bigrams=("w1", "size"), sum_bigram_freq=("n", "sum"),
            sum_context_freq=("cn", "sum")).reset_index()
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(), type=pa.int64()),
            "n_bigrams": pa.array(g["n_bigrams"].to_numpy(),
                                  type=pa.int64()),
            "sum_bigram_freq": pa.array(
                g["sum_bigram_freq"].to_numpy().astype(np.int64)),
            "sum_context_freq": pa.array(
                g["sum_context_freq"].to_numpy().astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def _bigram_lm_join_path(ds, big_ds):
    """Vocabulary-scale scoring path for :func:`bigram_lm_stats` (see its
    docstring): ``big_ds`` — the global (w1, w2, n) count table — is NEVER
    collected or broadcast. Doc bigrams and count rows meet in a w1-keyed
    bucket exchange (a count row for (w1, w2) hashes to the same bucket as
    every doc bigram with that w1, so the kernel can both merge C(w1,w2)
    and recompute the context count C(w1.) locally); per-doc partials are
    then summed through one doc_id-keyed exchange."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    def explode(t: pa.Table) -> pa.Table:
        db = doc_bigrams(t)
        return pa.table({
            "doc_id": pa.array(db["doc_id"].to_numpy().astype(np.int64)),
            "w1": pa.array(np.asarray(db["w1"], dtype=object),
                           type=pa.string()),
            "w2": pa.array(np.asarray(db["w2"], dtype=object),
                           type=pa.string()),
            "n": pa.array(np.zeros(len(db), dtype=np.int64)),
            "side": pa.array(np.zeros(len(db), dtype=np.int64))})

    def tag_counts(t: pa.Table) -> pa.Table:
        nr = t.num_rows
        return pa.table({
            "doc_id": pa.array(np.full(nr, -1, dtype=np.int64)),
            "w1": t.column("w1").cast(pa.string()),
            "w2": t.column("w2").cast(pa.string()),
            "n": t.column("n").cast(pa.int64()),
            "side": pa.array(np.ones(nr, dtype=np.int64))})

    uni = ds.map_batches(explode, batch_format="pyarrow").union(
        big_ds.map_batches(tag_counts, batch_format="pyarrow"))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0]
        c = g[g["side"] == 1]
        ctx = (c.groupby("w1", sort=False)["n"].sum().rename("cn")
               .reset_index())
        m = (d[["doc_id", "w1", "w2"]]
             .merge(c[["w1", "w2", "n"]], on=["w1", "w2"], how="left")
             .merge(ctx, on="w1", how="left"))
        p = m.groupby("doc_id", sort=False).agg(
            n_bigrams=("w1", "size"), sum_bigram_freq=("n", "sum"),
            sum_context_freq=("cn", "sum")).reset_index()
        return p.astype({c2: np.int64 for c2 in p.columns})

    partials = per_bucket(uni, ["w1"], kernel, num_buckets=16)

    def sum_partials(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", sort=False).agg(
            n_bigrams=("n_bigrams", "sum"),
            sum_bigram_freq=("sum_bigram_freq", "sum"),
            sum_context_freq=("sum_context_freq", "sum")).reset_index()
        return out.astype({c2: np.int64 for c2 in out.columns})

    return per_bucket(partials, ["doc_id"], sum_partials, num_buckets=16)


def lm_quality_buckets(sf_dir: str, cap: int = 1 << 20,
                       broadcast_max_rows: int = 2_000_000):
    """CCNet head/middle/tail LM-quality split (Wenzek et al. 2020 §4.3):
    docs bucket into terciles of an integer LM-quality score — here the
    per-doc average global bigram frequency in x1000 fixed point,
    ``sum_bigram_freq * 1000 // n_bigrams`` from :func:`bigram_lm_stats`
    (high avg frequency = common transitions ≈ low perplexity = 'head'),
    clipped to ``cap``. The x1000 resolution keeps the score domain fine
    enough that tercile cuts don't degenerate on tie-heavy corpora while
    the clip still bounds the histogram.

    Scale shape: the clip bounds the score domain, so the tercile cuts
    come from a CONSTANT-sized histogram (<= cap+1 rows: per-batch
    (score_q, cnt) partials, one keyed exchange, driver readoff — the
    token_quantiles plan), never a corpus-wide sort or rank. The compact
    (doc_id, score_q) table (16 B/doc) is materialized once in the object
    store and reused for the cut pass and the assignment pass, instead of
    recomputing the bigram count exchange twice. Cut rule matches DuckDB
    ``quantile_disc``: idx = max(0, ceil(q*n) - 1). Docs with < 2 words
    have no bigrams and no bucket (CCNet drops them upstream).

    Output (doc_id, score_q, bucket) with bucket in head/middle/tail.
    """
    import math

    from pixcrawler_ray.stages.shuffle import per_bucket

    stats = bigram_lm_stats(sf_dir, broadcast_max_rows=broadcast_max_rows)

    def add_q(t: pa.Table) -> pa.Table:
        nb = t.column("n_bigrams").to_numpy(zero_copy_only=False)
        sbf = t.column("sum_bigram_freq").to_numpy(zero_copy_only=False)
        q = np.minimum(sbf * 1000 // np.maximum(nb, 1),
                       cap).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "score_q": pa.array(q)})

    scored = stats.map_batches(add_q, batch_format="pyarrow").materialize()

    def hpart(t: pa.Table) -> pa.Table:
        g = (t.select(["score_q"]).to_pandas()
             .groupby("score_q", sort=False).size().rename("cnt")
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def hmerge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("score_q", sort=False)["cnt"].sum()
                .reset_index())

    hist = (per_bucket(scored.map_batches(hpart, batch_format="pyarrow"),
                       ["score_q"], hmerge, num_buckets=4)
            .to_pandas().sort_values("score_q"))
    counts = hist["cnt"].to_numpy()
    values = hist["score_q"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    cuts = []
    if n:       # guard BEFORE indexing: empty corpus -> empty histogram
        for q in (1.0 / 3, 2.0 / 3):
            idx = max(0, math.ceil(q * n) - 1)
            cuts.append(int(values[np.searchsorted(cum, idx + 1)]))
    c1, c2 = cuts if n else (0, 0)

    def bucketize(t: pa.Table) -> pa.Table:
        s = t.column("score_q").to_numpy(zero_copy_only=False)
        lab = np.where(s <= c1, "tail",
                       np.where(s <= c2, "middle", "head"))
        return t.append_column("bucket", pa.array(lab, type=pa.string()))

    return scored.map_batches(bucketize, batch_format="pyarrow")


DEFAULT_BM25_TERMS = ("scan", "merge", "window")


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = DEFAULT_BM25_TERMS,
              k: int = 20, k1: float = 1.2, b: float = 0.75):
    """BM25 retrieval of the top-k corpus documents for a fixed query-term
    set — the retrieval-based data-selection primitive (score every doc
    against a target query/domain description and keep the best k; the
    GPT-3/Pile practice of selecting pretraining data by similarity to a
    high-quality target distribution, reference-free variant).

    **Rational idf (documented deviation)**: idf = (N - df + 0.5) /
    (df + 0.5) WITHOUT the usual ``ln`` — monotone in df exactly like the
    Robertson idf, but composed only of IEEE +,-,*,/ which DuckDB replays
    bit-for-bit (libm ``ln`` may differ in the last ulp across engines), so
    the driver value-hash gate covers the SCORES themselves, not just the
    row set. Swap ``ln`` in for deployment ranking quality.

    Scale shape: pass 1 folds (N, sum_dl, df_t) into ONE fixed-width
    partial row per batch -> a Sum aggregate (bytes transit, never rows);
    pass 2 re-tokenizes, scores each batch against the broadcast scalars
    (the term loop is over the QUERY terms — each term is one Arrow
    ``equal`` + cumsum-segment count, never a row loop), filters to
    matching docs (corpus-fraction-sized), and a distributed sort +
    ``limit(k)`` over that small subset yields the answer; only k rows
    reach the driver. Output (rank, doc_id, dl, score), rank 1-based by
    (score DESC, doc_id).
    """
    import ray.data.aggregate as agg

    terms = tuple(terms)
    nt = len(terms)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _tfs(t: pa.Table):
        flat, nw = _nonempty_words(t.column("text"))
        offs = np.concatenate([[0], np.cumsum(nw)]).astype(np.int64)
        tfs = []
        for term in terms:
            eq = pc.equal(flat, term)
            c = np.concatenate(
                [[0], np.cumsum(np.asarray(
                    eq.to_numpy(zero_copy_only=False), dtype=np.int64))])
            tfs.append(c[offs[1:]] - c[offs[:-1]])
        return nw, tfs

    def stats_partial(t: pa.Table) -> pa.Table:
        nw, tfs = _tfs(t)
        cols = {"n_docs": pa.array([t.num_rows], type=pa.int64()),
                "sum_dl": pa.array([int(nw.sum())], type=pa.int64())}
        for i, tf in enumerate(tfs):
            cols[f"df_{i}"] = pa.array([int((tf > 0).sum())],
                                       type=pa.int64())
        return pa.table(cols)

    row = ds.map_batches(stats_partial, batch_format="pyarrow").aggregate(
        agg.Sum("n_docs"), agg.Sum("sum_dl"),
        *[agg.Sum(f"df_{i}") for i in range(nt)])
    n = float(row["sum(n_docs)"])
    avgdl = float(row["sum(sum_dl)"]) / n
    dfs = [float(row[f"sum(df_{i})"]) for i in range(nt)]
    kp1 = k1 + 1.0
    omb = 1.0 - b

    def score(t: pa.Table) -> pa.Table:
        nw, tfs = _tfs(t)
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        dl = nw.astype(np.float64)
        s = np.zeros(len(ids), dtype=np.float64)
        any_tf = np.zeros(len(ids), dtype=np.int64)
        # fixed left-to-right term order: the SQL oracle adds the same
        # per-term expressions in the same order, so the float sum is
        # bit-identical
        for tf_i, df_i in zip(tfs, dfs):
            tf = tf_i.astype(np.float64)
            s = s + tf * kp1 / (tf + k1 * (omb + b * dl / avgdl)) \
                * ((n - df_i + 0.5) / (df_i + 0.5))
            any_tf = any_tf + tf_i
        keep = any_tf > 0
        return pa.table({
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "dl": pa.array(nw[keep].astype(np.int64), type=pa.int64()),
            "score": pa.array(s[keep], type=pa.float64())})

    top = (ds.map_batches(score, batch_format="pyarrow")
             .sort(["score", "doc_id"], descending=[True, False])
             .limit(k).to_pandas())
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top


def bm25_oracle_sql(terms: tuple[str, ...] = DEFAULT_BM25_TERMS,
                    k: int = 20, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB replay of :func:`bm25_topk` — same tokenization, same
    rational-idf BM25 arithmetic in the same operation order (bit-exact
    doubles), same (score DESC, doc_id) top-k."""
    kp1, omb = repr(k1 + 1.0), repr(1.0 - b)
    k1r, br = repr(float(k1)), repr(float(b))
    esc = [t.replace("'", "''") for t in terms]
    tf_cols = ",\n         ".join(
        f"CAST(count(*) FILTER (WHERE term = '{t}') AS BIGINT) AS tf{i}"
        for i, t in enumerate(esc))
    df_cols = ",\n         ".join(
        f"CAST(count(*) FILTER (WHERE tf{i} > 0) AS DOUBLE) AS df{i}"
        for i in range(len(esc)))
    legs = "\n       + ".join(
        f"(CAST(tf{i} AS DOUBLE) * {kp1} / (CAST(tf{i} AS DOUBLE) + {k1r}"
        f" * ({omb} + {br} * CAST(dl AS DOUBLE) / avgdl))"
        f" * ((n - df{i} + 0.5) / (df{i} + 0.5)))"
        for i in range(len(esc)))
    anytf = " + ".join(f"tf{i}" for i in range(len(esc)))
    return f"""
WITH ws AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
  FROM documents
), wd AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl,
         {tf_cols}
  FROM ws GROUP BY doc_id
), dlx AS (
  SELECT d.doc_id, COALESCE(w.dl, 0) AS dl,
         {", ".join(f"COALESCE(w.tf{i}, 0) AS tf{i}"
                    for i in range(len(esc)))}
  FROM documents d LEFT JOIN wd w ON w.doc_id = d.doc_id
), st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {df_cols}
  FROM dlx
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, dl, score
FROM (
  SELECT doc_id, dl,
         {legs} AS score
  FROM dlx, st
  WHERE {anytf} > 0
)
ORDER BY score DESC, doc_id LIMIT {int(k)}"""
