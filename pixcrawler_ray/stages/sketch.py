"""Mergeable cardinality sketches — KMV (k-minimum-values) distinct counts
(Bar-Yossef et al. 2002 "Counting distinct elements in a data stream";
Beyer et al. 2007 for the unbiased (k-1)/u_k estimator).

The at-scale shape for COUNT(DISTINCT x) GROUP BY key when the value domain
per key is too large to shuffle: each batch reduces to the k smallest
64-bit hashes per key (a fixed k·8-byte partial), partials merge
associatively through ONE tiny keyed exchange, and the estimate reads off
the k-th minimum. Exact when a key's true cardinality is <= k. Hashing is
vectorized (polars xxhash over the whole column — process-stable within
the pinned polars version); a 100 TB run merges the same fixed-width
partials regardless of row count.

Oracle note: the estimate depends on the hash function, so this is
pytest-oracled (exact-when-small, bounded relative error when estimating,
merge-order invariance) rather than SQL value-hash oracled — the sketch is
the mandate's "novel sketch" category, where the ground truth is the exact
COUNT(DISTINCT) the sketch approximates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_K = 64
_U64_MAX = float(2**64)


def kmv_partial(keys: np.ndarray, hashes: np.ndarray,
                k: int = DEFAULT_K) -> pd.DataFrame:
    """Per-key k smallest DISTINCT hash values -> long frame (key, h)."""
    df = pd.DataFrame({"key": keys, "h": hashes}).drop_duplicates()
    df = df.sort_values(["key", "h"], kind="mergesort")
    return df.groupby("key", sort=False).head(k).reset_index(drop=True)


def kmv_estimate(group: pd.DataFrame, k: int = DEFAULT_K) -> tuple[int, bool]:
    """(estimate, is_exact) from a merged per-key partial frame."""
    hs = np.unique(group["h"].to_numpy())[:k]
    if len(hs) < k:
        return len(hs), True
    # unbiased KMV: (k-1) / normalized k-th minimum
    return int(round((k - 1) / (float(hs[-1]) / _U64_MAX))), False


def distinct_urls_per_host(sf_dir: str, k: int = DEFAULT_K):
    """Approximate distinct URL count per host over the rendered page set
    (pytest-oracled against exact COUNT DISTINCT). Partial sketches are
    built per batch and merged with one host-keyed bucket exchange."""
    import polars as pl

    from pixcrawler_ray.corpus import urls_hosts_arrow
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        url, host = urls_hosts_arrow(ids)
        hashes = pl.from_arrow(url).hash(seed=0).to_numpy()
        hosts = np.asarray(host.to_pylist(), dtype=object)
        return pa.Table.from_pandas(kmv_partial(hosts, hashes, k),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized k-min merge (no per-host loop): sort distinct (key, h)
        # once, rank within key, keep the k smallest, then one aggregation
        # yields both the exact-below-k count and the k-th minimum
        d = (g[["key", "h"]].drop_duplicates()
             .sort_values(["key", "h"], kind="mergesort"))
        d = d[d.groupby("key", sort=False).cumcount().to_numpy() < k]
        if not len(d):
            return pd.DataFrame({"host": pd.Series([], dtype="string"),
                                 "n_distinct_est": pd.Series(
                                     [], dtype="int64"),
                                 "is_exact": pd.Series([], dtype="bool")})
        agg = d.groupby("key", sort=False)["h"].agg(["count", "max"])
        n = agg["count"].to_numpy().astype(np.int64)
        exact = n < k
        kth = agg["max"].to_numpy().astype(np.float64)
        with np.errstate(divide="ignore"):
            est = np.where(exact, n,
                           np.round((k - 1) / (kth / _U64_MAX))
                           ).astype(np.int64)
        return pd.DataFrame({"host": agg.index.to_numpy(),
                             "n_distinct_est": est,
                             "is_exact": exact})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return per_bucket(partials, ["key"], merge, num_buckets=8)


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidate pass + exact verification pass
# ---------------------------------------------------------------------------

def mg_batch_candidates(keys1: np.ndarray, keys2: np.ndarray,
                        k: int) -> pd.DataFrame:
    """Misra-Gries survivor superset for ONE batch of (w1, w2) keys: any key
    with batch frequency > n_b/(k+1) — at most k keys, the MG-with-k-counters
    guarantee set (Misra & Gries 1982). Keys absent here have batch count
    <= n_b/(k+1), so summing over batches: a key missing from EVERY partial
    has global count <= n/(k+1)."""
    df = pd.DataFrame({"w1": keys1, "w2": keys2})
    n_b = len(df)
    c = (df.groupby(["w1", "w2"], sort=False).size().rename("cnt")
         .reset_index())
    return c[c["cnt"].to_numpy() * (k + 1) > n_b][["w1", "w2"]]


def heavy_hitter_bigrams(sf_dir: str, k: int = 1000,
                         candidate_k: int | None = None,
                         stats: dict | None = None):
    """Approximate-top-k heavy hitters over the corpus BIGRAM stream, made
    EXACT (and SQL-oracled) by a two-pass plan — the at-scale shape for
    "which keys exceed phi = 1/(k+1) of a 100 TB stream" when the key
    domain (urls, hosts, n-grams) is too large to groupby exactly:

    1. candidate pass: per-batch Misra-Gries survivor sets (each <= k keys,
       a fixed-size partial independent of domain size) deduplicated
       DISTRIBUTEDLY (one keyed drop-duplicates exchange) before the driver
       collects them — the driver-side materialization is bounded by the
       number of DISTINCT candidates, not O(k x num_batches); by the MG
       bound the set is a SUPERSET of every key with global count >
       n/(k+1);
    2. verify pass: candidates broadcast via ``ray.put``; each batch
       exact-counts ONLY candidate keys (vectorized isin + value_counts
       partials), merged through one tiny keyed exchange; the final filter
       ``cnt*(k+1) > n`` is therefore the exact GROUP BY ... HAVING answer
       without ever shuffling the full key domain.

    Output (w1, w2, cnt) — deterministic (no merge-order dependence: the
    approximation only ever widens the candidate set; counts are exact).
    ``candidate_k`` (>= k) widens the candidate pass only — the final
    filter stays at k, so the output is invariant in it (pytest-asserted).
    """
    import ray

    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket
    from pixcrawler_ray.stages.textprep import doc_bigrams

    cand_k = candidate_k if candidate_k is not None else k
    if cand_k < k:
        raise ValueError("candidate_k must be >= k (the candidate pass "
                         "must be a superset of the final filter)")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def batch_bigrams(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        df = doc_bigrams(t)
        return df["w1"].to_numpy(), df["w2"].to_numpy()

    def cand_partial(t: pa.Table) -> pa.Table:
        a, b = batch_bigrams(t)
        c = mg_batch_candidates(a, b, cand_k)
        # explicit string schema: an empty partial must not infer null-typed
        # columns and break unification / bucket stamping
        return pa.table({
            "w1": pa.array(np.asarray(c["w1"], dtype=object),
                           type=pa.string()),
            "w2": pa.array(np.asarray(c["w2"], dtype=object),
                           type=pa.string())})

    import ray.data as rd

    def cand_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    # distributed dedup BEFORE the driver collect: the collect is bounded
    # by |distinct candidates| (<= vocab of true heavy hitters' superset),
    # never O(k x num_batches)
    cands = per_bucket(ds.map_batches(cand_partial, batch_format="pyarrow"),
                       ["w1", "w2"], cand_dedup,
                       num_buckets=16).to_pandas()
    if stats is not None:
        stats["driver_candidate_rows"] = int(len(cands))
    empty = pa.table({"w1": pa.array([], type=pa.string()),
                      "w2": pa.array([], type=pa.string()),
                      "cnt": pa.array([], type=pa.int64())})
    if cands.empty:      # no key can exceed n/(k+1) — exact by the MG bound
        return rd.from_arrow(empty)
    cand_ref = ray.put(cands)

    def exact_partial(t: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        a, b = batch_bigrams(t)
        n_b = np.int64(len(a))
        df = pd.DataFrame({"w1": a, "w2": b})
        c = (df.groupby(["w1", "w2"], sort=False).size().rename("cnt")
             .reset_index())
        c = c.merge(cs, on=["w1", "w2"], how="inner")   # vectorized isin
        c = pd.concat([c, pd.DataFrame(
            {"w1": ["\x00total"], "w2": [""], "cnt": [n_b]})])
        return pa.Table.from_pandas(c, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["w1", "w2"], sort=False)["cnt"].sum()
                .reset_index())

    merged = per_bucket(ds.map_batches(exact_partial,
                                       batch_format="pyarrow"),
                        ["w1", "w2"], merge, num_buckets=4).to_pandas()
    tot_rows = merged[merged["w1"] == "\x00total"]
    n = int(tot_rows["cnt"].sum())
    hh = merged[merged["w1"] != "\x00total"]
    hh = hh[hh["cnt"].to_numpy() * (k + 1) > n]
    hh = hh.sort_values(["w1", "w2"]).reset_index(drop=True)
    hh["cnt"] = hh["cnt"].astype(np.int64)
    return rd.from_pandas(hh) if len(hh) else rd.from_arrow(empty)


# ------------------------------------------------------------ HyperLogLog --

HLL_P = 8                      # 2^8 = 256 registers, ~6.5% rel. std error
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (6 shift/compare passes — exact,
    unlike float log2 which rounds above 2^53)."""
    v = v.copy()
    bl = np.zeros(len(v), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = (v >> np.uint64(shift)) > 0
        bl[big] += shift
        v[big] >>= np.uint64(shift)
    return bl + (v > 0)


def hll_partial(keys: np.ndarray, hashes: np.ndarray,
                p: int = HLL_P) -> pd.DataFrame:
    """Per-key HLL register maxima -> long frame (key, reg, rho). The
    partial is bounded by keys_in_batch x 2^p rows regardless of input
    size — the mergeable fixed-width property that makes the sketch the
    at-scale COUNT(DISTINCT) GROUP BY."""
    m = 1 << p
    reg = (hashes & np.uint64(m - 1)).astype(np.int64)
    suffix = hashes >> np.uint64(p)
    # rho = leading zeros of the (64-p)-bit suffix + 1
    rho = (64 - p) - _bit_length_u64(suffix) + 1
    df = pd.DataFrame({"key": keys, "reg": reg, "rho": rho})
    return (df.groupby(["key", "reg"], sort=False)["rho"].max()
            .reset_index())


def hll_estimate_frame(g: pd.DataFrame, p: int = HLL_P) -> pd.DataFrame:
    """Vectorized per-key HLL estimates from merged register maxima
    (Flajolet et al. 2007): E = alpha_m * m^2 / sum(2^-M_j); linear
    counting m*ln(m/V) when E <= 2.5m and V (empty registers) > 0."""
    m = 1 << p
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))
    mx = (g.groupby(["key", "reg"], sort=False)["rho"].max()
          .reset_index())
    agg = mx.groupby("key", sort=False)["rho"].agg(
        n_present="size",
        inv_sum=lambda r: np.sum(np.exp2(-r.to_numpy(dtype=np.float64))))
    n_present = agg["n_present"].to_numpy(dtype=np.float64)
    denom = agg["inv_sum"].to_numpy() + (m - n_present)   # empty regs: 2^0
    raw = alpha * m * m / denom
    v = m - n_present                                     # empty registers
    lin = np.where(v > 0, m * np.log(np.maximum(m / np.maximum(v, 1e-12),
                                                1.0)), raw)
    use_lin = (raw <= 2.5 * m) & (v > 0)
    est = np.where(use_lin, lin, raw)
    return pd.DataFrame({
        "host": agg.index.to_numpy(),
        "n_distinct_est": np.round(est).astype(np.int64),
        "method": np.where(use_lin, "linear", "hll")})


def hll_distinct_urls_per_host(sf_dir: str, p: int = HLL_P,
                               num_buckets: int = 8):
    """HyperLogLog variant of :func:`distinct_urls_per_host` — same query,
    different sketch: 2^p one-byte registers per host instead of k 8-byte
    minima, register-wise max as the (commutative, idempotent) merge.
    Partials are host x register maxima (bounded per batch), merged by ONE
    host-keyed exchange; the estimator runs vectorized per bucket.
    Pytest-oracled (bounded relative error vs exact COUNT DISTINCT, merge
    invariance) like the KMV row — sketch values are hash-dependent."""
    import polars as pl

    from pixcrawler_ray.corpus import urls_hosts_arrow
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        url, host = urls_hosts_arrow(ids)
        hashes = pl.from_arrow(url).hash(seed=0).to_numpy().astype(np.uint64)
        hosts = np.asarray(host.to_pylist(), dtype=object)
        return pa.Table.from_pandas(hll_partial(hosts, hashes, p),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return hll_estimate_frame(g, p)

    return per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                      ["key"], merge, num_buckets=num_buckets)


# -------------------------------------------------------------- Count-Min --

CMS_W = 1024
CMS_D = 4


def cms_cells(terms: list[str], w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """(d, n) Count-Min cell indices: hash_j(term) = the j-th 8-hex-digit
    slice of md5(term) mod w — four independent 32-bit hashes from one
    digest, each exactly replayable in SQL as
    ``CAST(concat('0x', substr(md5(term), 1+8*j, 8)) AS BIGINT) % w``
    (DuckDB md5 == Python hashlib.md5; same parity contract as
    functions.hashing.md5_hex_array). Scalar md5 — callers pass the
    DEDUPLICATED term list, never the raw occurrence stream."""
    import hashlib
    out = np.empty((d, len(terms)), dtype=np.int64)
    for i, t in enumerate(terms):
        hx = hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for j in range(d):
            out[j, i] = int(hx[8 * j:8 * j + 8], 16) % w
    return out


def cms_term_sketch(sf_dir: str, w: int = CMS_W, d: int = CMS_D,
                    probes: tuple[str, ...] | None = None,
                    num_buckets: int = 4):
    """Count-Min sketch over the corpus TERM stream (Cormode &
    Muthukrishnan 2005) + point estimates for the probe terms — the
    at-scale frequency-estimation shape when the term domain is too large
    to groupby exactly: every batch reduces to a fixed d x w counter grid
    (independent of batch size or vocabulary), grids merge by cellwise SUM
    through ONE tiny keyed exchange, and a point query reads min_j of d
    cells. Estimates are deterministic (sums are associative) and obey
    est >= true count (pytest-pinned), with overestimate bounded by
    collisions at w cells.

    Per-batch cost discipline: words are dictionary-encoded (value_counts)
    first, so the scalar md5 runs over batch-DISTINCT terms only;
    occurrence mass enters via one weighted bincount per hash row. Output
    is section-tagged (section, term, j, cell, cnt): the merged sketch's
    nonzero cells ('sketch', <= d*w rows by construction — the driver-side
    materialize is bounded by the sketch size, never the corpus) and one
    ('est') row per probe. SQL-oracled end to end (mimic row: md5-slice
    hashes, cell grouping and min-estimate replayed verbatim in DuckDB).
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket
    from pixcrawler_ray.stages.textstats import _STOPWORDS, _split_words

    if probes is None:
        probes = tuple(sorted(_STOPWORDS))
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        words, _, lens = _split_words(t.column("text"))
        flat = pc.list_flatten(words).filter(pa.array(lens > 0))
        vc = flat.value_counts()
        uniq = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        cells = cms_cells(uniq, w, d)
        js, cs, ns = [], [], []
        for j in range(d):
            grid = np.bincount(cells[j], weights=cnts,
                               minlength=w).astype(np.int64)
            nz = np.flatnonzero(grid)
            js.append(np.full(len(nz), j, dtype=np.int64))
            cs.append(nz.astype(np.int64))
            ns.append(grid[nz])
        return pa.table({"j": pa.array(np.concatenate(js)),
                         "cell": pa.array(np.concatenate(cs)),
                         "cnt": pa.array(np.concatenate(ns))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["j", "cell"], sort=False)["cnt"].sum()
                .reset_index())

    sk = per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                    ["j", "cell"], merge,
                    num_buckets=num_buckets).to_pandas()
    grid = np.zeros((d, w), dtype=np.int64)
    grid[sk["j"].to_numpy(), sk["cell"].to_numpy()] = sk["cnt"].to_numpy()
    pcells = cms_cells(list(probes), w, d)
    est = grid[np.arange(d)[:, None], pcells].min(axis=0)
    out = pa.table({
        "section": pa.array(["sketch"] * len(sk) + ["est"] * len(probes)),
        "term": pa.array([""] * len(sk) + list(probes)),
        "j": pa.array(np.concatenate(
            [sk["j"].to_numpy(), np.full(len(probes), -1)]
            ).astype(np.int64)),
        "cell": pa.array(np.concatenate(
            [sk["cell"].to_numpy(), np.full(len(probes), -1)]
            ).astype(np.int64)),
        "cnt": pa.array(np.concatenate([sk["cnt"].to_numpy(), est]
                                       ).astype(np.int64))})
    return rd.from_arrow(out)
