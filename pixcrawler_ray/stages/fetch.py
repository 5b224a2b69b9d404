"""S4/J5/M7/M8 — the fetch stage: frontier ⨝ pages, with the reference's
status / retry / content-filter semantics.

In the reference, fetch is an HTTP GET with a UA header, 20 s timeout,
SSL-retry, Retry-After handling and content filters
(``builder/_search_engines.py:115-223``). Here the "web" is the corpus
Parquet, so fetch is a JOIN on url (SURVEY §2.4 J5):

- small corpus (tests / single node): BROADCAST join — the pages index is an
  Arrow table ``ray.put`` once, sorted by a 64-bit url hash; actors get it
  ZERO-COPY from the object store (Arrow buffers are shared, never pickled)
  and do a vectorized binary search per batch, then verify candidate matches
  by exact url comparison (hash collisions can never corrupt a result).
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

Stateful fetcher = actor pool: the zero-copy index ref is resolved ONCE per
actor in ``__init__`` (ST1 — the reference builds crawler thread pools per
keyword; we amortize across the whole run).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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
    """Doc-id-sorted Arrow index for the broadcast fetch path.

    The object-store payload is ONE Arrow table (url, warc_ts, html, doc_id)
    sorted by doc_id — zero-copy for every actor that reads it, regardless of
    pool size. doc_id is the corpus primary key (bijective with url); the
    fetcher still verifies the url string per match, so a bad key can never
    silently fetch the wrong page. Generic url-keyed fetch against an
    external corpus is the ``stages.shuffle.bucketed_join`` path.
    """
    d = pages_table.column("doc_id").to_numpy()
    order = np.argsort(d, kind="stable")
    t = pages_table.select(["url", "warc_ts", "html", "doc_id"])
    t = t.append_column(
        "html_len", pc.binary_length(pages_table.column("html")).cast(
            pa.int64()))
    t = t.take(pa.array(order))
    return ray.put(t.combine_chunks())


class Fetcher:
    """Actor-pool fetch stage: frontier batch -> fetched batch.

    ``__init__`` resolves the broadcast index once per actor (zero-copy);
    ``__call__`` is fully vectorized: hash urls -> binary search -> exact-url
    verify -> arrow ``take`` of the matched page rows.
    """

    def __init__(self, index_ref, min_bytes: int = MIN_CONTENT_BYTES,
                 transient_mod: int = 89, transient_rem: int = 3):
        self.t = ray.get(index_ref)
        self.doc_ids = self.t.column("doc_id").to_numpy()   # zero-copy
        self.html_len = self.t.column("html_len").to_numpy()
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
        bd = batch.column("doc_id").to_numpy()
        pos = np.minimum(np.searchsorted(self.doc_ids, bd),
                         len(self.doc_ids) - 1)
        cand = self.doc_ids[pos] == bd
        # verify the url strings of candidate matches (a wrong key can never
        # silently fetch the wrong page)
        idx = pa.array(pos[cand].astype(np.int64))
        same = pc.equal(pc.take(self.t.column("url"), idx),
                        batch.column("url").filter(pa.array(cand)))
        found = cand.copy()
        found[np.nonzero(cand)[0][~same.to_numpy(zero_copy_only=False)]] = False

        depth = batch.column("depth").to_numpy()
        transient = (found & (bd % self.transient_mod == self.transient_rem)
                     & (depth == 0))
        small = found & ~transient & (self.html_len[pos] < self.min_bytes)
        ok = found & ~transient & ~small
        status = np.select(
            [transient, small, ok],
            [STATUS_TRANSIENT, STATUS_CONTENT_REJECTED, STATUS_OK],
            default=STATUS_NOT_FOUND).astype(np.int32)
        # html/warc_ts: arrow take with a null mask — no python objects
        ind = pa.array(np.where(ok, pos, 0).astype(np.int64), mask=~ok)
        out = batch.append_column("status", pa.array(status, type=pa.int32()))
        out = out.append_column("warc_ts",
                                pc.take(self.t.column("warc_ts"), ind))
        return out.append_column("html", pc.take(self.t.column("html"), ind))


def fetch_dataset(frontier_ds, index_ref, concurrency: int | None = None,
                  batch_size: int = 2048):
    """Broadcast-join fetch as an actor pool.

    batch_size is kept modest because output rows carry the html binary
    payload (SURVEY §7.5.5 wide-binary-rows guidance). The pool autoscales
    from 1 actor (``concurrency=(1, max)``) with fractional CPUs so it can
    never starve the shuffle stages (pool defaults to half the cluster).
    """
    from pixcrawler_ray.sources.readers import pool_size
    if concurrency is None:
        concurrency = pool_size(0.5)
    # autoscaling pool with a minimum of ONE actor: a fixed-size pool whose
    # second actor can never be placed (small clusters with other pools
    # holding reservations) stalls the streaming executor forever — the
    # round-1 resume-path deadlock.
    return frontier_ds.map_batches(
        Fetcher,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, max(1, concurrency)),
        num_cpus=1,
    )


def split_fetched(fetched_ds):
    """(ok, transient, failed) sub-streams by status class."""
    ok = fetched_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), STATUS_OK)),
        batch_format="pyarrow")
    transient = fetched_ds.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("status"), STATUS_TRANSIENT)),
        batch_format="pyarrow")
    failed = fetched_ds.map_batches(
        lambda t: t.filter(pc.is_in(
            t.column("status"),
            value_set=pa.array(PERMANENT_STATUSES, type=pa.int32()))),
        batch_format="pyarrow")
    return ok, transient, failed


def statuses_batch(t: pa.Table, min_bytes: int = MIN_CONTENT_BYTES,
                   transient_mod: int = 89, transient_rem: int = 3) -> pa.Table:
    """Status assignment for join-fetched rows (html nullable = not found)."""
    n = t.num_rows
    doc = t.column("doc_id").to_numpy()
    depth = t.column("depth").to_numpy()
    html = t.column("html")
    found = ~np.asarray(html.is_null())
    lengths = pc.fill_null(pc.binary_length(html), 0).to_numpy()
    transient = found & (doc % transient_mod == transient_rem) & (depth == 0)
    small = found & ~transient & (lengths < min_bytes)
    ok = found & ~transient & ~small
    status = np.select([transient, small, ok],
                       [STATUS_TRANSIENT, STATUS_CONTENT_REJECTED, STATUS_OK],
                       default=STATUS_NOT_FOUND).astype(np.int32)
    out = t.append_column("status", pa.array(status, type=pa.int32()))
    # blank the payload for non-OK rows (transient rows are retried; failed
    # rows carry no body downstream)
    ind = pa.array(np.arange(n, dtype=np.int64), mask=~ok)
    idx = out.schema.get_field_index("html")
    return out.set_column(idx, "html", pc.take(out.column("html"), ind))


def fetch_via_join(frontier_ds, pages_ds, num_buckets: int = 64):
    """The 100 TB fetch path: partitioned hash join frontier ⨝ pages.

    No broadcast — both sides shuffle on ``hash(doc_id) % B`` and join
    per-bucket (``stages.shuffle.bucketed_join``). The corpus side ships only
    (doc_id, url, warc_ts, html); the left-join null html marks 404s. Use
    when the corpus exceeds a node's memory; the broadcast index path
    (:func:`fetch_dataset`) wins below that.
    """
    from pixcrawler_ray.stages.shuffle import bucketed_join

    pages = pages_ds.map_batches(
        lambda t: t.select(["doc_id", "warc_ts", "html"]),
        batch_format="pyarrow")
    joined = bucketed_join(frontier_ds, pages, on="doc_id", how="left",
                           num_buckets=num_buckets)
    return joined.map_batches(statuses_batch, batch_format="pyarrow")


class VirtualCorpusFetcher:
    """Fetcher for the DERIVED corpus: renders the page per candidate from
    the (tiny, broadcast) base documents table instead of shipping the
    amplified corpus around.

    Because the corpus is a pure function of ``documents`` (corpus.py
    derivation), fetching doc_id d IS ``render_html(d, text[d % n_base])`` —
    the "web server" computes the page, the pipeline still sees exactly the
    same bytes/status a stored corpus would yield. Scales to any
    amplification with O(base) memory per actor; the stored-corpus paths
    (:func:`fetch_dataset` broadcast index / :func:`fetch_via_join` shuffle
    join) remain for real corpora.
    """

    def __init__(self, texts_ref, n_base: int,
                 min_bytes: int = MIN_CONTENT_BYTES,
                 transient_mod: int = 89, transient_rem: int = 3):
        # Arrow string array in base doc_id order — zero-copy from the
        # object store, vectorized take per batch (no per-row list indexing)
        t = ray.get(texts_ref)
        self.texts = (t.combine_chunks() if isinstance(t, pa.ChunkedArray)
                      else t)
        self.n_base = n_base
        self.min_bytes = min_bytes
        self.transient_mod = transient_mod
        self.transient_rem = transient_rem

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pixcrawler_ray import corpus as _corpus

        n = batch.num_rows
        if n == 0:
            out = batch.append_column("status", pa.array([], type=pa.int32()))
            out = out.append_column("warc_ts",
                                    pa.array([], type=pa.timestamp("us")))
            return out.append_column("html", pa.array([], type=pa.binary()))
        doc = batch.column("doc_id").to_numpy()
        depth = batch.column("depth").to_numpy()
        transient = ((doc % self.transient_mod == self.transient_rem)
                     & (depth == 0))
        malformed = (doc % _corpus.MALFORMED_MOD) == _corpus.MALFORMED_REM
        ok = ~transient & ~malformed     # malformed html is < min_bytes
        status = np.select(
            [transient, malformed],
            [STATUS_TRANSIENT, STATUS_CONTENT_REJECTED],
            default=STATUS_OK).astype(np.int32)
        base_texts = pc.take(
            self.texts, pa.array((doc % self.n_base).astype(np.int64)))
        rendered = _corpus.render_html_batch(doc, base_texts)
        html_col = pc.if_else(pa.array(ok), rendered,
                              pa.scalar(None, type=pa.binary()))
        ts = _corpus.BASE_EPOCH_US + doc.astype(np.int64) * 1_000_000
        ts_arr = pa.array(np.where(ok, ts, 0), mask=~ok).cast(
            pa.timestamp("us"))
        out = batch.append_column("status", pa.array(status, type=pa.int32()))
        out = out.append_column("warc_ts", ts_arr)
        return out.append_column("html", html_col)


@ray.remote
def _load_base_texts(sf_dir: str) -> pa.Array:
    """Base texts in doc_id order, stored straight into the object store
    (task return) — never materialized on the driver."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    order = np.argsort(docs.column("doc_id").to_numpy())
    return (docs.column("text").combine_chunks()
            .take(pa.array(order.astype(np.int64))))


# per-worker-process fetcher cache: the broadcast texts array is fetched
# from local plasma once per (worker, corpus) instead of once per batch
_VF_CACHE: dict = {}


def _virtual_fetch_fn(batch: pa.Table, texts_ref=None,
                      n_base: int = 0) -> pa.Table:
    key = texts_ref.hex() if hasattr(texts_ref, "hex") else id(texts_ref)
    f = _VF_CACHE.get(key)
    if f is None:
        if len(_VF_CACHE) > 4:
            _VF_CACHE.clear()
        f = VirtualCorpusFetcher(texts_ref, n_base)
        _VF_CACHE[key] = f
    return f(batch)


def virtual_fetch_dataset(frontier_ds, sf_dir: str,
                          concurrency: int | None = None,
                          batch_size: int = 2048):
    """Virtual-corpus fetch as a stateless TASK pool.

    The base texts are broadcast once via ``ray.put`` and resolved inside
    each worker process (zero-copy plasma read, memoized per process via
    ``_VF_CACHE``). A task pool beats an autoscaling actor pool here: no
    actor ramp-up from 1, every CPU picks up batches immediately, and the
    only per-task state (the texts array) is shared node-local memory.
    """
    import pyarrow.parquet as pq

    # read+sort+broadcast the base texts in a REMOTE task: the driver only
    # reads parquet metadata (row count), so the ~serial load overlaps with
    # upstream frontier stages instead of sitting on the critical path
    n_base = pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    texts_ref = _load_base_texts.remote(sf_dir)
    return frontier_ds.map_batches(
        _virtual_fetch_fn,
        fn_kwargs={"texts_ref": texts_ref, "n_base": n_base},
        batch_format="pyarrow", batch_size=batch_size)
