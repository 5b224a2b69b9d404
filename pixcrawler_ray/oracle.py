"""Serial single-process oracle of the crawl semantics.

This is the "reference implementation" for FIXTURES.md §4: plain nested Python
loops in the reference's canonical ordering (SURVEY §3.1), no Ray — the
distributed pipeline in ``pipelines/crawl.py`` must produce the identical
seen-set, admission schedule, budget survivors and extracted bytes. Shares the
same pure functions (corpus derivation, variation selection, candidate
formula, extraction) so any divergence is a parallelism bug, not a spec
ambiguity.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow.parquet as pq

from pixcrawler_ray import corpus, extract
from pixcrawler_ray.functions.minhash import simhash64
from pixcrawler_ray.stages.expand import (
    CrawlConfig,
    PAGE_SIZE,
    candidate_doc_ids,
    work_unit_grid,
)
from pixcrawler_ray.stages.fetch import (
    MIN_CONTENT_BYTES,
    STATUS_CONTENT_REJECTED,
    STATUS_OK,
    STATUS_TRANSIENT,
)


@dataclass
class OracleResult:
    frontier: list[dict] = field(default_factory=list)    # post url-dedup + robots
    admission: list[tuple] = field(default_factory=list)  # (round, host, host_rank, url)
    fetched_ok: list[dict] = field(default_factory=list)
    transient_urls: list[str] = field(default_factory=list)
    budget_survivors: list[dict] = field(default_factory=list)
    extracted: list[dict] = field(default_factory=list)   # post dedup
    seen_urls: set[str] = field(default_factory=set)


def run_oracle(config: CrawlConfig, sf_dir: str,
               budget_per_round: int = 8,
               page_size: int = PAGE_SIZE,
               depth: int = 0,
               prior_seen: set[str] | None = None) -> OracleResult:
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    n_docs = docs.num_rows
    texts = docs.column("text").to_pylist()
    res = OracleResult()
    prior_seen = prior_seen or set()

    # 1. expansion in canonical nested order + within-gen first-occurrence dedup
    grid = work_unit_grid(config, depth=depth).to_pylist()
    seen: set[str] = set()
    for u in grid:
        for slot in range(page_size):
            doc = int(candidate_doc_ids(
                u["cat_i"], u["kw_i"], u["eng_i"], u["var_i"], u["offset"],
                slot, n_docs))
            url = str(corpus.urls_for(np.array([doc]))[0])
            seq = u["unit_seq"] * page_size + slot
            if url in seen or url in prior_seen:
                continue
            seen.add(url)
            # robots gate
            hid = int(corpus.host_ids(np.array([doc]))[0])
            if (corpus.robots_disallowed_host(np.array([hid]))[0]
                    and "/private/" in url):
                continue
            res.frontier.append({
                "url": url, "doc_id": doc, "seq": seq,
                "host": str(corpus.hosts_for(np.array([doc]))[0]),
                "category": u["category"], "keyword": u["keyword"],
                "variation": u["variation"], "engine": u["engine"],
                "priority": u["priority"], "depth": u["depth"],
            })
    res.seen_urls = set(seen)

    # 2. politeness admission schedule
    by_host: dict[str, list[dict]] = {}
    for r in res.frontier:
        by_host.setdefault(r["host"], []).append(r)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: (-r["priority"], r["seq"]))
        for rank, r in enumerate(rows):
            res.admission.append((rank // budget_per_round, host, rank,
                                  r["url"]))
    res.admission.sort()

    # 3. fetch
    for r in res.frontier:
        doc = r["doc_id"]
        html = corpus.render_html(doc, texts[doc])
        if (doc % corpus.TRANSIENT_MOD == corpus.TRANSIENT_REM
                and r["depth"] == 0):
            r["status"] = STATUS_TRANSIENT
            res.transient_urls.append(r["url"])
            continue
        if len(html) < MIN_CONTENT_BYTES:
            r["status"] = STATUS_CONTENT_REJECTED
            continue
        r["status"] = STATUS_OK
        r["html"] = html
        res.fetched_ok.append(r)

    # 4. budget: per keyword first max_images by seq among OK rows
    by_kw: dict[str, int] = {}
    for r in sorted(res.fetched_ok, key=lambda r: r["seq"]):
        k = by_kw.get(r["keyword"], 0)
        if k < config.max_images:
            by_kw[r["keyword"]] = k + 1
            res.budget_survivors.append(r)

    # 5. extract + validity filter, then TWO sequential keep-first passes —
    # exact dedup on md5 (A3) followed by near dedup on phash (A4), matching
    # the pipeline's two groupby shuffles (validator/integrity.py:348-426).
    rows = []
    for r in sorted(res.budget_survivors, key=lambda r: r["seq"]):
        text, links, valid = extract.extract_one(r["html"])
        if not valid:
            continue
        rows.append({
            "url": r["url"], "doc_id": r["doc_id"], "seq": r["seq"],
            "category": r["category"], "keyword": r["keyword"],
            "text": text, "image_links": links,
            "content_md5": hashlib.md5(text.encode()).digest(),
            "phash": simhash64(text),
        })
    seen_md5: set[bytes] = set()
    pass_a = []
    for r in rows:  # already seq-sorted
        if r["content_md5"] not in seen_md5:
            seen_md5.add(r["content_md5"])
            pass_a.append(r)
    seen_ph: set[int] = set()
    for r in pass_a:
        if r["phash"] not in seen_ph:
            seen_ph.add(r["phash"])
            res.extracted.append(r)
    return res
