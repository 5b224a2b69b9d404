"""Recrawl scheduling from observed snapshot change history.

A production crawler re-visits pages at a rate matched to how often they
actually change (Cho & Garcia-Molina 2000, "Synchronizing a database to
improve freshness"; 2003 "Effective page refresh policies for web
crawlers"): the fetch log keeps one row per (url, crawl epoch) with the
content checksum, change frequency is estimated per url from adjacent
checksum differences, and the next-visit time is the crawl horizon plus an
interval inversely proportional to the observed change count. The reference
has no recrawl layer (it downloads once per keyword run —
`builder/_generator.py` retries only failed downloads within a run), but
any continuous deployment of it would need one; this is the Ray-Data-native
shape of that maintenance loop.

Scale shape (the part that matters at a 10^10-url frontier):

- the snapshot log is a *stream* — per-batch synthesis / ingest is a
  stateless ``map_batches`` expansion, never materialized on the driver;
- change statistics need all epochs of one url co-located, which is ONE
  url-keyed bucket exchange (``per_bucket``); inside a bucket the kernel is
  a fully vectorized sort + shift-compare (no per-url Python loop);
- the output is one row per url (frontier-sized, not log-sized) with
  integer-exact columns, so the whole plan is SQL-replayable and sits under
  the driver's value-hash gate (merged into the ``crawl_delta`` row).

Snapshot synthesis is pure deterministic arithmetic over ``documents``
(no external data, mirrored in SQL by ``__ray_entry__.oracle_sql``):
epoch e in [0, EPOCHS); a page *changes* at epoch e >= 1 iff
``(doc_id * 48271 + e * 16807) % 97 < 29`` (~30% change rate, both
multipliers are the public MINSTD constants); its content version is the
cumulative change count, and the stored checksum is
``md5(text || '|' || version)`` — checksum-based change detection, exactly
what a fetch log stores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pixcrawler_ray.functions.hashing import md5_hex_array

EPOCHS = 6
CHANGE_MOD = 97
CHANGE_THRESHOLD = 29
_MULT_D = 48271      # MINSTD
_MULT_E = 16807      # MINSTD (Lewis-Goodman-Miller)


def change_matrix(doc_ids: np.ndarray, epochs: int = EPOCHS) -> np.ndarray:
    """(n_docs, epochs) int64 content-version matrix: cumulative count of
    change events per doc. Column 0 is all zeros (the first observation is
    never itself a change)."""
    d = doc_ids.astype(np.int64)[:, None]
    e = np.arange(epochs, dtype=np.int64)[None, :]
    changed = (d * np.int64(_MULT_D) + e * np.int64(_MULT_E)) \
        % np.int64(CHANGE_MOD) < CHANGE_THRESHOLD
    changed[:, 0] = False
    return np.cumsum(changed, axis=1, dtype=np.int64)


def snapshot_history(sf_dir: str, epochs: int = EPOCHS):
    """Synthetic fetch log: one row per (url, epoch) with the content
    checksum of the page's version at that epoch. Stateless row expansion —
    each input batch yields ``epochs``x rows; nothing driver-side."""
    from pixcrawler_ray.corpus import urls_hosts_arrow
    from pixcrawler_ray.sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def expand(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        n = len(ids)
        ver = change_matrix(ids, epochs)            # (n, epochs)
        url, _ = urls_hosts_arrow(ids)
        urls_rep = pa.concat_arrays([url.combine_chunks()] * epochs) \
            if isinstance(url, pa.ChunkedArray) else \
            pa.concat_arrays([url] * epochs)
        # column-major repeat: block e holds every doc at epoch e
        ep_col = np.repeat(np.arange(epochs, dtype=np.int64), n)
        payloads = [f"{texts[i] or ''}|{ver[i, e]}"
                    for e in range(epochs) for i in range(n)]
        return pa.table({
            "url": urls_rep,
            "epoch": pa.array(ep_col, type=pa.int64()),
            "content_md5": pa.array(md5_hex_array(payloads),
                                    type=pa.string()),
        })

    return ds.map_batches(expand, batch_format="pyarrow")


def _change_stats(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-url change statistics over a union of buckets:
    sort by (url, epoch) once, a change is an adjacent checksum difference
    within the same url, then one groupby-sum yields (changes, n_snaps)."""
    if not len(g):
        return pd.DataFrame({
            "url": pd.Series([], dtype="object"),
            "changes": pd.Series([], dtype="int64"),
            "n_snaps": pd.Series([], dtype="int64"),
            "next_epoch": pd.Series([], dtype="int64")})
    g = g.sort_values(["url", "epoch"], kind="mergesort")
    url = g["url"].to_numpy()
    md5 = g["content_md5"].to_numpy()
    same_url = np.empty(len(g), dtype=bool)
    same_url[0] = False
    same_url[1:] = url[1:] == url[:-1]
    chg = np.zeros(len(g), dtype=np.int64)
    chg[1:] = (md5[1:] != md5[:-1]).astype(np.int64)
    chg[~same_url] = 0
    df = pd.DataFrame({"url": url, "chg": chg})
    agg = df.groupby("url", sort=False)["chg"].agg(["sum", "count"])
    changes = agg["sum"].to_numpy().astype(np.int64)
    n_snaps = agg["count"].to_numpy().astype(np.int64)
    # uniform-revisit policy: interval shrinks with observed change count;
    # next visit is the horizon (last epoch) plus that interval
    interval = np.maximum(np.int64(1), (n_snaps - 1) // (changes + 1))
    return pd.DataFrame({
        "url": agg.index.to_numpy(),
        "changes": changes,
        "n_snaps": n_snaps,
        "next_epoch": (n_snaps - 1) + interval})


def recrawl_schedule(sf_dir: str, epochs: int = EPOCHS,
                     num_buckets: int = 16):
    """Per-url recrawl schedule from the snapshot log: ONE url-keyed bucket
    exchange co-locates each url's history, the kernel is vectorized, and
    the result is frontier-sized. Output (url, changes, n_snaps,
    next_epoch), integer-exact and SQL-oracled (``crawl_delta`` row,
    'recrawl' section)."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    snaps = snapshot_history(sf_dir, epochs)
    return per_bucket(snaps, ["url"], _change_stats,
                      num_buckets=num_buckets)
