"""Deterministic Common-Crawl-style ``pages`` corpus, derived from ``documents``.

``BASELINE.json`` input_hint mandates the corpus shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data is allowed, so the corpus is a *pure deterministic function*
of the driver-provided ``documents`` table (``doc_id, text, lang, source,
n_chars``): every derived column below is simple integer/string arithmetic
that DuckDB can replay exactly, which is what lets the driver's SQL oracle
verify the crawl stages end-to-end (byte-identical ``text`` per ``url``).

Derivation spec (mirrored in SQL by ``__ray_entry__.oracle_sql``):

- ``host_id(d)``  = 0 if ``d % 3 == 0`` else ``1 + (d * 2654435761) % 499``
  → host ``h0`` receives ~1/3 of all pages (deliberate Zipf-style hot-host
  skew so skew splitting is exercised; SURVEY §4 "Skew / stragglers").
- ``host(d)``     = ``'h{host_id}.example.com'``
- ``path(d)``     = ``'/private/doc/{d}'`` if ``d % 50 == 7`` else ``'/doc/{d}'``
  (the ``/private/`` prefix is what synthetic robots rules disallow).
- ``url(d)``      = ``'http://' + host + path``
- ``warc_ts(d)``  = ``2024-01-01T00:00:00Z + d seconds`` (epoch micros
  ``1704067200000000 + d * 1_000_000``).
- ``malformed(d)``= ``d % 97 == 13`` → html truncated to 40 bytes; the
  ground-truth extracted ``text`` for malformed pages is ``''`` (analog of the
  reference's corrupt-image fixtures, ``validator/tests/test_integrity.py:75-80``).
- ``html(d)``     = the template rendered by :func:`render_html` around the
  (escaped) document text plus ``d % 4`` synthetic ``<img>`` links
  ``'http://img.example.com/i/{(d*31 + j*17) % 1000}.jpg'``.
- robots rule: host ``h{k}`` disallows prefix ``/private/`` iff ``k % 20 == 1``
  (plus the hot host h0 allows everything).

The reference has no corpus — it crawls the live web via icrawler/DDGS
(``builder/_search_engines.py:115-223``); this table stands in for the web so
the fetch stage becomes a deterministic join (SURVEY §2.4 J5).
"""

from __future__ import annotations

import html as _html_mod
import numpy as np
import pyarrow as pa

HOT_HOST_MOD = 3          # d % 3 == 0  -> hot host h0
HOST_MULT = 2654435761    # Knuth multiplicative-hash constant (public domain)
HOST_BUCKETS = 499
PRIVATE_MOD = 50          # d % 50 == 7 -> /private/ path
PRIVATE_REM = 7
MALFORMED_MOD = 97        # d % 97 == 13 -> truncated html
MALFORMED_REM = 13
MALFORMED_PREFIX_LEN = 40
BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
IMG_LINK_BUCKETS = 1000
ROBOTS_DISALLOW_MOD = 20  # host h{k} disallows /private/ iff k % 20 == 1
ROBOTS_DISALLOW_REM = 1
TRANSIENT_MOD = 89        # d % 89 == 3 -> first fetch attempt returns 503
TRANSIENT_REM = 3

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("doc_id", pa.int64()),   # lineage back to the source document
        ("host", pa.string()),
    ]
)


def host_ids(doc_ids: np.ndarray) -> np.ndarray:
    """Vectorized host assignment with hot-host skew. int64 in/out."""
    d = doc_ids.astype(np.int64)
    spread = 1 + (d * np.int64(HOST_MULT)) % np.int64(HOST_BUCKETS)
    return np.where(d % HOT_HOST_MOD == 0, np.int64(0), spread)


def hosts_for(doc_ids: np.ndarray) -> np.ndarray:
    hid = host_ids(doc_ids)
    return np.char.add(
        np.char.add("h", hid.astype("U6")), ".example.com"
    )


def paths_for(doc_ids: np.ndarray) -> np.ndarray:
    d = doc_ids.astype(np.int64)
    base = np.char.add("/doc/", d.astype("U12"))
    priv = np.char.add("/private/doc/", d.astype("U12"))
    return np.where(d % PRIVATE_MOD == PRIVATE_REM, priv, base)


def urls_for(doc_ids: np.ndarray) -> np.ndarray:
    return np.char.add(
        np.char.add("http://", hosts_for(doc_ids)), paths_for(doc_ids)
    )


def urls_hosts_arrow(doc_ids: np.ndarray):
    """(url, host) as Arrow string arrays — ~5x faster than the numpy
    ``np.char`` chain for large batches (vectorized C string building)."""
    import pyarrow.compute as pc

    d = pa.array(doc_ids.astype(np.int64))
    d_s = pc.cast(d, pa.string())
    hid_s = pc.cast(pa.array(host_ids(doc_ids)), pa.string())
    host = pc.binary_join_element_wise(
        pc.binary_join_element_wise("h", hid_s, ""), ".example.com", "")
    private = (doc_ids % PRIVATE_MOD) == PRIVATE_REM
    path = pc.if_else(
        pa.array(private),
        pc.binary_join_element_wise("/private/doc/", d_s, ""),
        pc.binary_join_element_wise("/doc/", d_s, ""))
    url = pc.binary_join_element_wise(
        pc.binary_join_element_wise("http://", host, ""), path, "")
    return url, host


# link extension grid: the first five are valid image extensions, the last
# three are the non-image noise a real result page carries (exercises the M9
# extension gate, builder/_helpers.py:39-52)
LINK_EXTS: list[str] = [".jpg", ".jpeg", ".png", ".gif", ".webp",
                        ".svg", ".mp4", ".html"]


def image_links_for(doc_id: int) -> list[str]:
    """``d % 4`` synthetic links; deterministic in ``d`` alone. Extension
    cycles through :data:`LINK_EXTS` by ``(d + j) % 8`` (SQL-replayable)."""
    n = doc_id % 4
    return [
        f"http://img.example.com/i/"
        f"{(doc_id * 31 + j * 17) % IMG_LINK_BUCKETS}"
        f"{LINK_EXTS[(doc_id + j) % len(LINK_EXTS)]}"
        for j in range(n)
    ]


def render_html(doc_id: int, text: str) -> bytes:
    """Render the page html. ``extract.extract_one`` must invert this exactly.

    Text is entity-escaped on the way in and unescaped on the way out so the
    byte-identical invariant holds even for texts containing ``<`` / ``&``.
    """
    esc = _html_mod.escape(text, quote=False)
    imgs = "".join(f'<img src="{u}"/>' for u in image_links_for(doc_id))
    page = (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f"<p>{esc}</p>{imgs}</body></html>"
    )
    body = page.encode("utf-8")
    if doc_id % MALFORMED_MOD == MALFORMED_REM:
        return body[:MALFORMED_PREFIX_LEN]
    return body


def render_html_batch(doc_ids: np.ndarray, texts) -> pa.Array:
    """Vectorized :func:`render_html` — byte-identical per row (pytest-
    asserted), built entirely from Arrow C++ string kernels so the hot fetch
    path never loops Python per row.

    ``texts`` is an Arrow string array (or ChunkedArray) aligned with
    ``doc_ids``.
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    d = doc_ids.astype(np.int64)
    # html.escape(text, quote=False) == sequential &, <, > replacement
    esc = pc.replace_substring(texts, pattern="&", replacement="&amp;")
    esc = pc.replace_substring(esc, pattern="<", replacement="&lt;")
    esc = pc.replace_substring(esc, pattern=">", replacement="&gt;")
    d_s = pc.cast(pa.array(d), pa.string())
    n_links = d % 4
    exts = pa.array(LINK_EXTS, type=pa.string())
    img_parts = []
    for j in range(3):
        num = (d * np.int64(31) + np.int64(j * 17)) % np.int64(IMG_LINK_BUCKETS)
        ext = pc.take(exts, pa.array((d + j) % len(LINK_EXTS)))
        part = pc.binary_join_element_wise(
            '<img src="http://img.example.com/i/',
            pc.cast(pa.array(num), pa.string()), ext, '"/>', "")
        img_parts.append(pc.if_else(pa.array(j < n_links), part, ""))
    page = pc.binary_join_element_wise(
        "<html><head><title>doc ", d_s, "</title></head><body><p>", esc,
        "</p>", img_parts[0], img_parts[1], img_parts[2],
        "</body></html>", "")
    body = page.cast(pa.binary())
    mal = pa.array((d % MALFORMED_MOD) == MALFORMED_REM)
    return pc.if_else(
        mal, pc.binary_slice(body, 0, MALFORMED_PREFIX_LEN), body)


def pages_batch(batch: pa.Table) -> pa.Table:
    """``documents`` Arrow batch -> ``pages`` Arrow batch (stateless map).

    Fully vectorized (Arrow C++ kernels incl. html rendering). Ground-truth
    ``text`` is '' for malformed pages.
    """
    d = batch.column("doc_id").to_numpy()
    texts = batch.column("text")
    langs = batch.column("lang")
    url, host = urls_hosts_arrow(d)
    ts = pa.array(BASE_EPOCH_US + d.astype(np.int64) * 1_000_000).cast(
        pa.timestamp("us")
    )
    import pyarrow.compute as pc
    html_col = render_html_batch(d, texts)
    malformed = (d % MALFORMED_MOD) == MALFORMED_REM
    gt_text = pc.if_else(pa.array(malformed), "",
                         texts.combine_chunks()
                         if isinstance(texts, pa.ChunkedArray) else texts)
    return pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": html_col,
            "text": gt_text,
            "lang": langs,
            "doc_id": pa.array(d, type=pa.int64()),
            "host": host,
        }
    )


def pages_dataset(sf_dir: str):
    """Lazy ``pages`` Dataset derived from ``{sf_dir}/documents.parquet``.

    Column-pruned at the read; stays streaming (no materialize).
    """
    from pixcrawler_ray.sources.readers import read_table

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return docs.map_batches(pages_batch, batch_format="pyarrow")


def amplified_documents(sf_dir: str, factor: int):
    """Deterministic corpus amplification for bench scale: ``factor`` replicas
    of the documents table, replica r shifting ``doc_id`` by ``r * n_docs``
    (distinct urls/hosts per replica; texts repeat, which deliberately
    stresses the dedup stages). Pure function of the driver tables — no new
    entropy."""
    import pyarrow.parquet as pq

    from pixcrawler_ray.sources.readers import read_table

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # block count chosen at the READ so no repartition shuffle is needed:
    # one input block -> one amplified output block of ~n*factor/(4*cpus)
    import math

    import ray as _ray
    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "lang"],
                      target_rows=max(16, math.ceil(n / (4 * cpus))))

    def replicate(t: pa.Table) -> pa.Table:
        parts = []
        for r in range(factor):
            shifted = pa.table({
                "doc_id": pa.compute.add(t.column("doc_id"),
                                         pa.scalar(r * n, pa.int64())),
                "text": t.column("text"),
                "lang": t.column("lang"),
            })
            parts.append(shifted)
        return pa.concat_tables(parts)

    total = n * factor
    out = docs.map_batches(replicate, batch_format="pyarrow")
    return out, total


def amplified_pages_dataset(sf_dir: str, factor: int):
    """Amplified pages corpus (distributed rendering); returns (ds, n_docs)."""
    docs, n_total = amplified_documents(sf_dir, factor)
    return docs.map_batches(pages_batch, batch_format="pyarrow"), n_total


def robots_disallowed_host(host_id: np.ndarray) -> np.ndarray:
    """Boolean mask: does host h{k} disallow the /private/ prefix."""
    k = host_id.astype(np.int64)
    return (k % ROBOTS_DISALLOW_MOD == ROBOTS_DISALLOW_REM) & (k != 0)


def robots_table(num_hosts: int = HOST_BUCKETS + 1) -> pa.Table:
    """Synthetic per-host robots rules (FIXTURES.md §1 companion table)."""
    hid = np.arange(num_hosts, dtype=np.int64)
    dis = robots_disallowed_host(hid)
    hosts = np.char.add(np.char.add("h", hid.astype("U6")), ".example.com")
    prefixes = pa.array(
        [["/private/"] if d else [] for d in dis], type=pa.list_(pa.string())
    )
    return pa.table(
        {"host": pa.array(hosts, type=pa.string()), "disallow_prefixes": prefixes}
    )
