"""Robots gating — frontier URLs against per-host disallow rules.

The reference has NO robots.txt handling (verified by grep, SURVEY §0); the
north rule adds it. Rules are the synthetic per-host table from
``corpus.robots_table`` (host ``h{k}`` disallows ``/private/`` iff
``k % 20 == 1``). Disallowed URLs are tagged, not silently dropped — they
become ``status = 403`` rows in the metrics/lineage trail, mirroring how the
reference records permanent errors instead of retrying them
(``builder/_exceptions.py:216-240``).

The rule set is host-keyed and tiny relative to the frontier, so it is a
broadcast lookup inside a stateless ``map_batches`` (no shuffle); in the
streaming scheduler the same check is cached inside the politeness shard
actors (one robots fetch per host, like a real crawler).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pixcrawler_ray import corpus


def _host_ids_from_urls(urls: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Parse ``h{k}.example.com`` back to k — one Arrow regex kernel."""
    import pyarrow.compute as pc

    # urls look like http://h123.example.com/doc/45
    m = pc.extract_regex(urls, r"//h(?P<hid>\d+)\.")
    return pc.cast(pc.struct_field(m, "hid"), pa.int64()).to_numpy()


def robots_mask_batch(batch: pa.Table) -> pa.Table:
    """Append ``robots_allowed: bool`` to a frontier batch."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return batch.append_column("robots_allowed",
                                   pa.array([], type=pa.bool_()))
    if "host_id" in batch.column_names:      # frontier carries the int key
        hid = batch.column("host_id").to_numpy()
    else:
        hid = _host_ids_from_urls(batch.column("url"))
    disallow_host = corpus.robots_disallowed_host(hid)
    is_private = pc.match_substring(batch.column("url"), "/private/")
    allowed = ~(disallow_host
                & is_private.to_numpy(zero_copy_only=False))
    return batch.append_column("robots_allowed", pa.array(allowed))


def crawl_delay_for(hid: np.ndarray) -> np.ndarray:
    """Per-host Crawl-delay seconds (1 + k % 3) — the single source of the
    delay rule, shared by the robots.txt synthesizer and the delay-aware
    politeness schedule."""
    return 1 + hid.astype(np.int64) % 3


def robots_txt_for(hid: np.ndarray) -> np.ndarray:
    """Synthesize each host's literal robots.txt from the corpus rule —
    a Crawl-delay line (:func:`crawl_delay_for`) plus the /private/
    Disallow for rule-hit hosts. The byte-level round-trip companion to the
    rule-based gate: :func:`parse_robots_batch` must recover the rule from
    these bytes.
    """
    dis = corpus.robots_disallowed_host(hid)
    delay = crawl_delay_for(hid).astype("U2")
    head = np.char.add("User-agent: *\nCrawl-delay: ",
                       np.char.add(delay, "\n"))
    tail = np.where(dis, "Disallow: /private/\n", "Disallow:\n")
    return np.char.add(head, tail)


def parse_robots_batch(t: pa.Table) -> pa.Table:
    """Parse robots.txt text columns with Arrow regex kernels: extracts
    ``crawl_delay`` (int, 0 when absent) and ``disallow_prefix`` (first
    non-empty Disallow value, '' when the host allows everything)."""
    import pyarrow.compute as pc

    txt = t.column("robots_txt")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    cd = pc.extract_regex(txt, r"Crawl-delay: (?P<cd>\d+)")
    delay = pc.fill_null(
        pc.cast(pc.struct_field(cd, "cd"), pa.int64()), 0)
    dis = pc.extract_regex(txt, r"Disallow: (?P<pfx>\S+)")
    prefix = pc.fill_null(pc.struct_field(dis, "pfx"), "")
    out = t.drop_columns(["robots_txt"])
    out = out.append_column("crawl_delay", delay)
    return out.append_column("disallow_prefix", prefix)


def robots_parse(sf_dir: str):
    """Per-host parsed robots verdicts over the hosts the corpus actually
    references (SQL-oracled). The Ray side builds each host's literal
    robots.txt bytes and recovers the rule by parsing them; the oracle
    replays the rule arithmetic directly — any parser defect diverges.
    """
    from pixcrawler_ray.sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def per_host(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        hid = np.unique(corpus.host_ids(ids))
        return pa.table({
            "host_id": pa.array(hid),
            "robots_txt": pa.array(robots_txt_for(hid).tolist(),
                                   type=pa.string()),
        })

    from pixcrawler_ray.stages.shuffle import keep_first_by

    per_batch = ds.map_batches(per_host, batch_format="pyarrow")
    parsed = per_batch.map_batches(parse_robots_batch,
                                   batch_format="pyarrow")
    # batches may repeat a host; keep one deterministic row per host
    parsed = parsed.map_batches(
        lambda t: t.append_column("ord", t.column("host_id")),
        batch_format="pyarrow")
    kept = keep_first_by(parsed, ["host_id"], "ord")
    return kept.map_batches(lambda t: t.drop_columns(["ord"]),
                            batch_format="pyarrow")


def apply_robots(frontier_ds, keep_blocked: bool = False):
    """Tag (and by default drop) robots-disallowed frontier rows."""
    ds = frontier_ds.map_batches(robots_mask_batch, batch_format="pyarrow")
    if keep_blocked:
        return ds
    return ds.map_batches(
        lambda t: t.filter(t.column("robots_allowed")).drop_columns(
            ["robots_allowed"]),
        batch_format="pyarrow",
    )


# -------------------------------------------------------- sitemap.xml --

def sitemap_lastmod_priority(d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-doc sitemap metadata: lastmod date
    2025-MM-DD with MM = 1 + (id // 28) % 12, DD = 1 + id % 28, and
    priority digit id % 10 — plain integer/string arithmetic so the SQL
    oracle replays it with lpad/CAST, no date library divergence."""
    d = d.astype(np.int64)
    month = (1 + (d // 28) % 12).astype("U2")
    day = (1 + d % 28).astype("U2")
    lastmod = np.char.add(
        np.char.add("2025-", np.char.zfill(month, 2)),
        np.char.add("-", np.char.zfill(day, 2)))
    return lastmod, d % 10


def sitemap_xml(sf_dir: str, num_buckets: int = 8):
    """Synthesize each host's literal sitemap.xml (sitemaps.org protocol
    shape: urlset of <url><loc/><lastmod/><priority/> entries, entries
    sorted by doc_id) — the crawl-seeding artifact a real frontier ingests
    per host. ONE host-keyed exchange groups the host's docs; the XML body
    is built with vectorized pandas string concatenation + a C-level join
    per host. Output (host_id, sitemap_xml)."""
    from pixcrawler_ray import corpus
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        url, _ = corpus.urls_hosts_arrow(ids)
        lastmod, pri = sitemap_lastmod_priority(ids)
        return pa.table({
            "host_id": pa.array(corpus.host_ids(ids)),
            "doc_id": pa.array(ids.astype(np.int64)),
            "url": url,
            "lastmod": pa.array(lastmod.tolist(), type=pa.string()),
            "pri": pa.array(pri)})

    def build(df) -> "pd.DataFrame":
        import pandas as pd
        df = df.sort_values(["host_id", "doc_id"], kind="mergesort")
        ent = ("<url><loc>" + df["url"] + "</loc><lastmod>" + df["lastmod"]
               + "</lastmod><priority>0." + df["pri"].astype(str)
               + "</priority></url>")
        g = ent.groupby(df["host_id"].to_numpy(), sort=True).agg("".join)
        body = ('<?xml version="1.0" encoding="UTF-8"?><urlset>'
                + g.to_numpy(dtype=object) + "</urlset>")
        return pd.DataFrame({"host_id": g.index.to_numpy(),
                             "sitemap_xml": body})

    return per_bucket(ds.map_batches(prep, batch_format="pyarrow"),
                      ["host_id"], build, num_buckets=num_buckets)


def parse_sitemap_batch(t: pa.Table) -> pa.Table:
    """Recover (host_id, url, lastmod, priority) rows from literal
    sitemap.xml bytes with Arrow kernels only: split on the entry closer,
    then one extract_regex per field over the flattened fragments (the
    trailing '</urlset>' fragment has no <loc> and is dropped)."""
    import pyarrow.compute as pc

    xml = t.column("sitemap_xml")
    if isinstance(xml, pa.ChunkedArray):
        xml = xml.combine_chunks()
    frs = pc.split_pattern(xml, "</url>")
    n = pc.list_value_length(frs).to_numpy(zero_copy_only=False)
    host_rep = np.repeat(
        t.column("host_id").to_numpy(zero_copy_only=False), n)
    flat = pc.list_flatten(frs)
    loc = pc.extract_regex(flat, r"<loc>(?P<u>[^<]*)</loc>")
    keep = pc.is_valid(loc)
    lm = pc.extract_regex(flat, r"<lastmod>(?P<m>[^<]*)</lastmod>")
    pr = pc.extract_regex(flat, r"<priority>0\.(?P<p>\d)</priority>")
    mask = keep.to_numpy(zero_copy_only=False)
    return pa.table({
        "host_id": pa.array(host_rep[mask]),
        "url": pc.struct_field(loc.filter(keep), "u"),
        "lastmod": pc.struct_field(lm.filter(keep), "m"),
        "priority": pc.cast(pc.struct_field(pr.filter(keep), "p"),
                            pa.int64())})


def sitemap_parse(sf_dir: str, num_buckets: int = 8):
    """Byte-level sitemap round-trip (SQL-oracled): synthesize every
    host's sitemap.xml, then recover each entry by PARSING the bytes —
    the oracle computes the same rows from the doc arithmetic directly,
    so any synthesis or parser defect diverges. One host-keyed exchange
    (the synthesis grouping); parsing is a stateless Arrow-kernel map."""
    return sitemap_xml(sf_dir, num_buckets=num_buckets).map_batches(
        parse_sitemap_batch, batch_format="pyarrow")
