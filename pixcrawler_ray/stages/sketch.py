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
        rows = []
        for key, grp in g.groupby("key", sort=False):
            est, exact = kmv_estimate(grp, k)
            rows.append({"host": key, "n_distinct_est": est,
                         "is_exact": exact})
        return pd.DataFrame(rows,
                            columns=["host", "n_distinct_est", "is_exact"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return per_bucket(partials, ["key"], merge, num_buckets=8)
