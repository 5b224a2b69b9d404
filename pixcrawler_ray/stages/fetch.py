"""S4/J5/M7/M8 — the fetch stage: frontier ⨝ pages, with the reference's
status / retry / content-filter semantics.

In the reference, fetch is an HTTP GET with a UA header, 20 s timeout,
SSL-retry, Retry-After handling and content filters
(``builder/_search_engines.py:115-223``). Here the "web" is the corpus
Parquet, so fetch is a JOIN on url (SURVEY §2.4 J5):

- small corpus (tests / single node): BROADCAST join — the pages index is
  ``ray.put`` once (url-sorted arrays) and every fetch actor binary-searches
  it per batch. No shuffle.
- large corpus: partitioned hash join on ``hash(url)`` via
  ``stages.shuffle.bucketed_join``.

Status model (M7, ``builder/_exceptions.py:216-240`` taxonomy):
- 200: url present (html attached)
- 404: url absent from the corpus — PERMANENT, never retried
- 503: deterministic transient set (``doc_id % 89 == 3`` on the first
  attempt, i.e. depth 0) — TRANSIENT, re-queued to the next generation
- 415: present but fails the content filters (M8: min byte size — analog of
  the reference's ≥1000-byte / image/* gates,
  ``builder/_search_engines.py:97-98, 182-188``)

Stateful fetcher = actor pool: the index ref is resolved ONCE per actor in
``__init__`` (ST1 — the reference builds crawler thread pools per keyword;
we amortize across the whole run).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

MIN_CONTENT_BYTES = 64  # scaled-down analog of min_file_size=1000

STATUS_OK = 200
STATUS_NOT_FOUND = 404
STATUS_TRANSIENT = 503
STATUS_CONTENT_REJECTED = 415
STATUS_ROBOTS_BLOCKED = 403

PERMANENT_STATUSES = (STATUS_NOT_FOUND, STATUS_CONTENT_REJECTED,
                      STATUS_ROBOTS_BLOCKED)


def build_pages_index(pages_table: pa.Table):
    """Url-sorted lookup arrays for the broadcast fetch path.

    Returns an object-store ref holding (urls_sorted, warc_ts, html, text?,
    doc_id) — a few columns of the corpus, sorted by url for binary search.
    """
    idx = pa.compute.sort_indices(pages_table.column("url"))
    t = pages_table.take(idx)
    payload = {
        "url": np.asarray(t.column("url").to_pylist(), dtype=object),
        "warc_ts": t.column("warc_ts").to_numpy(),
        "html": np.asarray(t.column("html").to_pylist(), dtype=object),
        "doc_id": t.column("doc_id").to_numpy(),
    }
    return ray.put(payload)


class Fetcher:
    """Actor-pool fetch stage: frontier batch -> fetched batch.

    ``__init__`` resolves the broadcast index once per actor (ST1);
    ``__call__`` does vectorized binary-search lookups per batch.
    """

    def __init__(self, index_ref, min_bytes: int = MIN_CONTENT_BYTES,
                 transient_mod: int = 89, transient_rem: int = 3):
        self.idx = ray.get(index_ref)
        self.min_bytes = min_bytes
        self.transient_mod = transient_mod
        self.transient_rem = transient_rem

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            out = batch.append_column("status", pa.array([], type=pa.int32()))
            out = out.append_column("warc_ts",
                                    pa.array([], type=pa.timestamp("us")))
            return out.append_column("html", pa.array([], type=pa.binary()))
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        pos = np.searchsorted(self.idx["url"], urls)
        pos_clamped = np.minimum(pos, len(self.idx["url"]) - 1)
        found = self.idx["url"][pos_clamped] == urls
        status = np.full(n, STATUS_NOT_FOUND, dtype=np.int32)
        htmls: list[bytes | None] = [None] * n
        ts = np.zeros(n, dtype="datetime64[us]")
        depth = batch.column("depth").to_numpy()
        for i in np.nonzero(found)[0]:
            p = pos_clamped[i]
            doc_id = int(self.idx["doc_id"][p])
            if (doc_id % self.transient_mod == self.transient_rem
                    and depth[i] == 0):
                status[i] = STATUS_TRANSIENT  # first-attempt 503 (retryable)
                continue
            h = self.idx["html"][p]
            if len(h) < self.min_bytes:
                status[i] = STATUS_CONTENT_REJECTED
                continue
            status[i] = STATUS_OK
            htmls[i] = h
            ts[i] = self.idx["warc_ts"][p]
        out = batch.append_column("status", pa.array(status, type=pa.int32()))
        out = out.append_column(
            "warc_ts", pa.array(ts).cast(pa.timestamp("us")))
        return out.append_column("html", pa.array(htmls, type=pa.binary()))


def fetch_dataset(frontier_ds, index_ref, concurrency: int = 8,
                  batch_size: int = 2048):
    """Broadcast-join fetch as an actor pool.

    batch_size is kept modest because output rows carry the html binary
    payload (SURVEY §7.5.5 wide-binary-rows guidance). The pool autoscales
    from 1 actor (``concurrency=(1, max)``) with fractional CPUs so it can
    never deadlock a small cluster waiting for a fixed-size pool, and never
    starves the shuffle stages of CPU slots.
    """
    return frontier_ds.map_batches(
        Fetcher,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(1, concurrency)),
        num_cpus=0.5,
    )


def split_fetched(fetched_ds):
    """(ok, transient, failed) sub-streams by status class."""
    ok = fetched_ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t.column("status"), STATUS_OK)),
        batch_format="pyarrow")
    transient = fetched_ds.map_batches(
        lambda t: t.filter(
            pa.compute.equal(t.column("status"), STATUS_TRANSIENT)),
        batch_format="pyarrow")
    failed = fetched_ds.map_batches(
        lambda t: t.filter(pa.compute.is_in(
            t.column("status"),
            value_set=pa.array(PERMANENT_STATUSES, type=pa.int32()))),
        batch_format="pyarrow")
    return ok, transient, failed
