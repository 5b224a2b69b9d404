"""Oracle-checkable crawl queries: every stage of the crawl replayed in SQL.

The crawl pipeline's semantics (expansion order, seen-set, robots, politeness
schedule, fetch statuses, budget, extraction invariant) are pure functions of
the ``documents`` table plus integer arithmetic (see ``corpus.py``), so each
stage can be expressed BOTH as the Ray Data pipeline and as a DuckDB SQL
query over the same parquet views — the driver hash-compares them at sf0.01.

Seeds for these queries come from the ``region``/``nation`` tables
(categories = regions in r_regionkey order, keywords = nations in n_nationkey
order), and variations use the explicit-template mode so the SQL can inline
the same template list with ``replace()``.
"""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.parquet as pq

from pixcrawler_ray.functions.variations import TEMPLATES
from pixcrawler_ray.pipelines.crawl import n_documents, pages_index_ref
from pixcrawler_ray.stages.expand import (
    CrawlConfig,
    ENGINES,
    PAGE_SIZE,
    frontier_dataset,
    work_unit_grid,
)
from pixcrawler_ray.stages.fetch import STATUS_OK, fetch_dataset
from pixcrawler_ray.stages.politeness import assign_rounds
from pixcrawler_ray.stages.robots import apply_robots
from pixcrawler_ray.stages.seen import dedup_frontier
from pixcrawler_ray.stages.shuffle import keep_first_n

ORACLE_TEMPLATES = TEMPLATES[:4]
ORACLE_MAX_IMAGES = 40
ORACLE_BUDGET_PER_ROUND = 8


def seeds_config(sf_dir: str, max_images: int = ORACLE_MAX_IMAGES) -> CrawlConfig:
    """categories = regions (r_regionkey order), keywords = nations
    (n_nationkey order within region)."""
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = region.sort_values("r_regionkey")
    nation = nation.sort_values("n_nationkey")
    cats: dict[str, list[str]] = {}
    for _, r in region.iterrows():
        ns = nation[nation.n_regionkey == r.r_regionkey]["n_name"].tolist()
        cats[r.r_name] = ns
    return CrawlConfig.from_dict({
        "dataset_name": "oracle_crawl",
        "categories": cats,
        "options": {"max_images": max_images},
    })


def kwgen_config(sf_dir: str,
                 max_images: int = ORACLE_MAX_IMAGES) -> CrawlConfig:
    """Keyword-generation oracle seeds: the first two regions keep their
    nation keywords (union path: user + generated), the rest have none
    (generation-only path); mode=enabled."""
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = region.sort_values("r_regionkey")
    nation = nation.sort_values("n_nationkey")
    cats: dict[str, list[str]] = {}
    for _, r in region.iterrows():
        if r.r_regionkey < 2:
            cats[r.r_name] = nation[
                nation.n_regionkey == r.r_regionkey]["n_name"].tolist()
        else:
            cats[r.r_name] = []
    return CrawlConfig.from_dict({
        "dataset_name": "oracle_kwgen",
        "categories": cats,
        "options": {"max_images": max_images,
                    "keyword_generation": "enabled"},
    })


def _frontier(sf_dir: str):
    cfg = seeds_config(sf_dir)
    nd = n_documents(sf_dir)
    return frontier_dataset(cfg, nd, fixed_templates=ORACLE_TEMPLATES)


# ---------------------------------------------------------------- queries --

def q_crawl_units(sf_dir: str):
    """The work-unit grid (driver-side in Ray, pure cross join in SQL)."""
    import ray.data as rd
    grid = work_unit_grid(seeds_config(sf_dir),
                          fixed_templates=ORACLE_TEMPLATES)
    return rd.from_arrow(grid.select(
        ["category", "keyword", "engine", "variation", "offset", "priority",
         "unit_seq"]))


def q_crawl_units_kwgen(sf_dir: str):
    """The work-unit grid under keyword_generation=enabled (M6/D1 union)."""
    import ray.data as rd
    grid = work_unit_grid(kwgen_config(sf_dir),
                          fixed_templates=ORACLE_TEMPLATES)
    return rd.from_arrow(grid.select(
        ["category", "keyword", "engine", "variation", "offset", "priority",
         "unit_seq"]))


def q_extract_image_links(sf_dir: str):
    """M9 — raw vs valid-extension link counts per page."""
    import pyarrow as pa

    from pixcrawler_ray import corpus
    from pixcrawler_ray.extract import extracted_dataset

    pages = corpus.pages_dataset(sf_dir)
    ex = extracted_dataset(pages)

    def project(t: pa.Table) -> pa.Table:
        n_img = pc.list_value_length(t.column("image_links")).cast(pa.int64())
        return pa.table({
            "url": t.column("url"),
            "n_links_raw": t.column("n_links_raw"),
            "n_links_img": n_img,
        })

    return ex.map_batches(project, batch_format="pyarrow")


def q_crawl_quarantine(sf_dir: str):
    """Quarantine audit trail for one generation (rejected rows + reason),
    over the oracle's fixed-template frontier."""
    from pixcrawler_ray.pipelines.crawl import _quarantine_permanent

    fr = apply_robots(dedup_frontier(_frontier(sf_dir)))
    fetched = fetch_dataset(fr, pages_index_ref(sf_dir))
    failed = fetched.map_batches(_quarantine_permanent,
                                 batch_format="pyarrow")
    return failed.select_columns(["url", "seq", "status", "reason"])


def q_crawl_frontier(sf_dir: str):
    """Candidate frontier after within-run URL dedup (min-seq wins), with
    the robots verdict attached (``keep_blocked=True`` — blocked rows stay,
    flagged). One registry row covers both the dedup shuffle and the robots
    gate (driver 50-row cap, VERDICT r4 #1)."""
    fr = dedup_frontier(_frontier(sf_dir))
    ds = apply_robots(fr, keep_blocked=True)
    return ds.select_columns(["url", "host", "doc_id", "seq", "keyword",
                              "priority", "robots_allowed"])


def q_crawl_schedule(sf_dir: str):
    """Politeness admission schedule over the allowed frontier — MERGED,
    section-tagged (r5):

    - 'budget': the plain budget round AND the robots-Crawl-delay-aware
      round (``round_delay``: effective budget = max(1, budget // delay)),
      from one rank pass and one host-hash shuffle;
    - 'authority' (r5): the IMPORTANCE-DRIVEN schedule the north star
      describes ("link-graph authority feeds frontier priority") — the
      frontier re-prioritized by the target doc's damped integer PageRank
      mass (one doc-keyed bucketed join against ``pagerank_mass``), then
      the same politeness rank pass; round_delay = -1 for this section.
    """
    import pyarrow as _pa

    from pixcrawler_ray.stages.graph import pagerank_mass
    from pixcrawler_ray.stages.shuffle import bucketed_join

    fr = apply_robots(dedup_frontier(_frontier(sf_dir)))
    base = assign_rounds(fr, budget_per_round=ORACLE_BUDGET_PER_ROUND,
                         emit_delay_round=True)

    def tag_budget(t: _pa.Table) -> _pa.Table:
        return _pa.table({
            "section": _pa.array(["budget"] * t.num_rows,
                                 type=_pa.string()),
            "url": t.column("url"), "host": t.column("host"),
            "seq": t.column("seq").cast(_pa.int64()),
            "host_rank": t.column("host_rank").cast(_pa.int64()),
            "round": t.column("round").cast(_pa.int64()),
            "round_delay": t.column("round_delay").cast(_pa.int64())})

    pr = pagerank_mass(sf_dir, rounds=3)
    joined = bucketed_join(fr, pr, on="doc_id", num_buckets=16)

    def repri(t: _pa.Table) -> _pa.Table:
        cols = {n: t.column(n) for n in t.column_names
                if n not in ("priority", "mass")}
        cols["priority"] = t.column("mass").cast(_pa.int64())
        return _pa.table(cols)

    auth = assign_rounds(joined.map_batches(repri, batch_format="pyarrow"),
                         budget_per_round=ORACLE_BUDGET_PER_ROUND)

    def tag_auth(t: _pa.Table) -> _pa.Table:
        neg = _pa.array([-1] * t.num_rows, type=_pa.int64())
        return _pa.table({
            "section": _pa.array(["authority"] * t.num_rows,
                                 type=_pa.string()),
            "url": t.column("url"), "host": t.column("host"),
            "seq": t.column("seq").cast(_pa.int64()),
            "host_rank": t.column("host_rank").cast(_pa.int64()),
            "round": t.column("round").cast(_pa.int64()),
            "round_delay": neg})

    return (base.map_batches(tag_budget, batch_format="pyarrow")
            .union(auth.map_batches(tag_auth, batch_format="pyarrow")))


def q_crawl_fetch_status(sf_dir: str):
    """Fetch statuses for the scheduled frontier (200/415/503)."""
    fr = apply_robots(dedup_frontier(_frontier(sf_dir)))
    fetched = fetch_dataset(fr, pages_index_ref(sf_dir))
    return fetched.select_columns(["url", "seq", "status"])


def q_crawl_budget(sf_dir: str):
    """Per-keyword budget survivors among fetch-OK rows (first N by seq)."""
    fr = apply_robots(dedup_frontier(_frontier(sf_dir)))
    fetched = fetch_dataset(fr, pages_index_ref(sf_dir))
    ok = fetched.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), STATUS_OK)),
        batch_format="pyarrow")
    kept = keep_first_n(ok, ["keyword"], "seq", ORACLE_MAX_IMAGES)
    return kept.select_columns(["url", "keyword", "seq"])


def q_crawl_delta(sf_dir: str):
    """Incremental-crawl delta (SQL-oracled): the epoch-2 budget doubles,
    and the delta is epoch-2 admissions anti-joined against the epoch-1
    URL-seen set — the resume/top-up shape (`seen` anti-join) expressed
    through the same distributed bucketed join the checkpoint resume path
    uses, now under the value-hash gate instead of pytest only.
    """
    from pixcrawler_ray.stages.shuffle import bucketed_join

    fr = apply_robots(dedup_frontier(_frontier(sf_dir)))
    fetched = fetch_dataset(fr, pages_index_ref(sf_dir))
    ok = fetched.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), STATUS_OK)),
        batch_format="pyarrow")
    e1 = (keep_first_n(ok, ["keyword"], "seq", ORACLE_MAX_IMAGES)
          .select_columns(["url"]))
    e2 = keep_first_n(ok, ["keyword"], "seq", 2 * ORACLE_MAX_IMAGES)
    delta = bucketed_join(e2.select_columns(["url", "keyword", "seq"]),
                          e1, on="url", how="anti")
    return delta.select_columns(["url", "keyword", "seq"])


def q_crawl_delta_recrawl(sf_dir: str):
    """MERGED registry row (one driver-capture slot): the incremental-crawl
    delta ('delta' section) unioned with the recrawl schedule derived from
    snapshot change history ('recrawl' section, r5 — stages/recrawl.py)
    and the host-level webgraph rollup ('hostgraph' section, r5 —
    stages/graph.py: a = out-edges, b = distinct out-hosts, c = in-edges).
    All are crawl-maintenance/planning outputs answering "what should the
    next crawl round visit"; section-tagged on (section, url, k, a, b, c)."""
    import pyarrow as _pa

    from pixcrawler_ray.stages.graph import host_graph
    from pixcrawler_ray.stages.recrawl import recrawl_schedule

    def delta_tag(t: _pa.Table) -> _pa.Table:
        neg = _pa.array([-1] * t.num_rows, type=_pa.int64())
        return _pa.table({
            "section": _pa.array(["delta"] * t.num_rows, type=_pa.string()),
            "url": t.column("url"),
            "k": t.column("keyword"),
            "a": t.column("seq").cast(_pa.int64()),
            "b": neg, "c": neg})

    def rec_tag(t: _pa.Table) -> _pa.Table:
        return _pa.table({
            "section": _pa.array(["recrawl"] * t.num_rows,
                                 type=_pa.string()),
            "url": t.column("url"),
            "k": _pa.array([""] * t.num_rows, type=_pa.string()),
            "a": t.column("changes").cast(_pa.int64()),
            "b": t.column("n_snaps").cast(_pa.int64()),
            "c": t.column("next_epoch").cast(_pa.int64())})

    def hg_tag(t: _pa.Table) -> _pa.Table:
        return _pa.table({
            "section": _pa.array(["hostgraph"] * t.num_rows,
                                 type=_pa.string()),
            "url": t.column("host"),
            "k": _pa.array([""] * t.num_rows, type=_pa.string()),
            "a": t.column("n_out_edges").cast(_pa.int64()),
            "b": t.column("n_out_hosts").cast(_pa.int64()),
            "c": t.column("n_in_edges").cast(_pa.int64())})

    a = q_crawl_delta(sf_dir).map_batches(delta_tag, batch_format="pyarrow")
    b = recrawl_schedule(sf_dir).map_batches(rec_tag, batch_format="pyarrow")
    c = host_graph(sf_dir).map_batches(hg_tag, batch_format="pyarrow")
    return a.union(b).union(c)


def q_crawl_extract(sf_dir: str):
    """END-TO-END invariant: md5 of the extracted text per budget survivor.

    The driver's DuckDB oracle computes the same md5 from the documents table
    directly — equality proves byte-identical extraction through the whole
    distributed chain (the BASELINE.json per-row invariant).
    """
    import hashlib

    import pyarrow as pa

    from pixcrawler_ray.extract import extract_batch

    fr = apply_robots(dedup_frontier(_frontier(sf_dir)))
    fetched = fetch_dataset(fr, pages_index_ref(sf_dir))
    ok = fetched.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), STATUS_OK)),
        batch_format="pyarrow")
    kept = keep_first_n(ok, ["keyword"], "seq", ORACLE_MAX_IMAGES)
    extracted = kept.map_batches(extract_batch, batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        md5 = [hashlib.md5((x or "").encode()).hexdigest()
               for x in t.column("text").to_pylist()]
        return pa.table({
            "url": t.column("url"),
            "seq": t.column("seq"),
            "text_md5": pa.array(md5, type=pa.string()),
            "valid": t.column("valid"),
        })

    return extracted.map_batches(project, batch_format="pyarrow")


def q_pages_per_host(sf_dir: str):
    """Corpus host distribution (exhibits the hot-host skew)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from pixcrawler_ray import corpus

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def hostify(t):
        import pyarrow as pa
        d = t.column("doc_id").to_numpy()
        return pa.table({"host": pa.array(corpus.hosts_for(d))})

    return (docs.map_batches(hostify, batch_format="pyarrow")
                .groupby("host").aggregate(Count(alias_name="n_pages")))


def q_extract_all_pages(sf_dir: str):
    """Every corpus page: url, md5(extracted text), valid — the invariant
    over the whole corpus (not just crawled urls)."""
    import hashlib

    import pyarrow as pa

    from pixcrawler_ray import corpus
    from pixcrawler_ray.extract import extracted_dataset

    pages = corpus.pages_dataset(sf_dir)
    ex = extracted_dataset(pages)

    def project(t: pa.Table) -> pa.Table:
        md5 = [hashlib.md5((x or "").encode()).hexdigest()
               for x in t.column("text").to_pylist()]
        return pa.table({
            "url": t.column("url"),
            "text_md5": pa.array(md5, type=pa.string()),
            "valid": t.column("valid"),
            "lang": t.column("lang"),
        })

    return ex.map_batches(project, batch_format="pyarrow")


def image_caption_stats(sf_dir: str, num_buckets: int = 16):
    """LAION-style per-image caption/inlink aggregation: every valid-ext
    image link extracted from the page corpus is keyed by its full URL and
    aggregated to (n_refs, n_distinct_hosts, first_doc, first_caplen,
    top_lang) — the alt-text-aggregation step of an image-text-pair
    pipeline (many pages embed the same image; pick the first-seen caption,
    record the majority language and referrer diversity for filtering).
    Reference analog: the validator's per-image dedup + keep-first
    (``validator/integrity.py:130-148``) lifted to the caption domain.

    Scale shape: links explode inside ``map_batches`` with a LOCAL
    (img, host, lang) combine (partials bounded by batch rows), then ONE
    img-keyed bucket exchange resolves distinct-host counts, the majority
    language (ties -> lexicographically smallest), and the min-doc caption
    stats. caplen uses the EXTRACTED text (byte-identical invariant), so
    the oracle replays it as ``len(documents.text)``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from pixcrawler_ray import corpus
    from pixcrawler_ray.extract import extracted_dataset
    from pixcrawler_ray.stages.shuffle import per_bucket

    ex = extracted_dataset(corpus.pages_dataset(sf_dir))

    def partial(t: pa.Table) -> pa.Table:
        links = t.column("image_links")
        if isinstance(links, pa.ChunkedArray):
            links = links.combine_chunks()
        idx = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
        if len(idx) == 0:
            return pa.table({
                "img": pa.array([], type=pa.string()),
                "host": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "min_doc": pa.array([], type=pa.int64()),
                "caplen": pa.array([], type=pa.int64())})
        caplen = pc.utf8_length(t.column("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "img": pc.list_flatten(links).to_pandas().to_numpy(),
            "host": t.column("host").take(pa.array(idx)).to_pandas()
                     .to_numpy(),
            "lang": t.column("lang").take(pa.array(idx)).to_pandas()
                     .to_numpy(),
            "doc_id": t.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)[idx],
            "caplen": caplen[idx]})
        df = df.sort_values("doc_id", kind="mergesort")
        g = df.groupby(["img", "host", "lang"], sort=False).agg(
            n=("doc_id", "size"), min_doc=("doc_id", "min"),
            caplen=("caplen", "first")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # all-vectorized per-bucket resolve (the img domain is corpus-sized
        # — a per-img Python loop here would be a row loop in disguise)
        base = g.groupby("img", sort=False).agg(
            n_refs=("n", "sum"), n_hosts=("host", "nunique"),
            first_doc=("min_doc", "min")).reset_index()
        pl = (g.groupby(["img", "lang"], sort=False, as_index=False)["n"]
              .sum()
              .sort_values(["img", "n", "lang"],
                           ascending=[True, False, True], kind="mergesort")
              .drop_duplicates("img")[["img", "lang"]]
              .rename(columns={"lang": "top_lang"}))
        fd = (g.sort_values(["img", "min_doc"], kind="mergesort")
              .drop_duplicates("img")[["img", "caplen"]]
              .rename(columns={"caplen": "first_caplen"}))
        out = base.merge(pl, on="img").merge(fd, on="img")
        return out[["img", "n_refs", "n_hosts", "first_doc",
                    "first_caplen", "top_lang"]].astype(
            {"n_refs": "int64", "n_hosts": "int64",
             "first_doc": "int64", "first_caplen": "int64"})

    return per_bucket(ex.map_batches(partial, batch_format="pyarrow"),
                      ["img"], merge, num_buckets=num_buckets)


# caption-aggregation replay: same valid-ext link derivation as
# extract_image_links, resolved per image URL (first-seen caption = min
# doc, majority lang with lexical tie-break, distinct referrer hosts)
_SQL_CAPTIONS = """
WITH exts AS (
  SELECT * FROM (VALUES (0,'.jpg'),(1,'.jpeg'),(2,'.png'),(3,'.gif'),
                        (4,'.webp')) AS e(i, ext)
), lk AS (
  SELECT d.doc_id, d.lang, len(d.text) AS caplen,
         'h' || CAST(CASE WHEN d.doc_id % 3 = 0 THEN 0
                          ELSE 1 + (d.doc_id * 2654435761) % 499 END
                     AS VARCHAR) || '.example.com' AS host,
         'http://img.example.com/i/' ||
           CAST((d.doc_id * 31 + j.j * 17) % 1000 AS VARCHAR) || e.ext
           AS img
  FROM documents d
  JOIN generate_series(0, 2) AS j(j) ON j.j < d.doc_id % 4
  JOIN exts e ON e.i = (d.doc_id + j.j) % 8
  WHERE d.doc_id % 97 <> 13
), fdoc AS (
  SELECT img, doc_id, caplen FROM lk
  QUALIFY ROW_NUMBER() OVER (PARTITION BY img ORDER BY doc_id) = 1
), plang AS (
  SELECT img, lang, count(*) AS n FROM lk GROUP BY img, lang
), toplang AS (
  SELECT img, lang FROM plang
  QUALIFY ROW_NUMBER() OVER (PARTITION BY img ORDER BY n DESC, lang) = 1
)
SELECT lk.img, CAST(count(*) AS BIGINT) AS n_refs,
       CAST(count(DISTINCT lk.host) AS BIGINT) AS n_hosts,
       CAST(min(lk.doc_id) AS BIGINT) AS first_doc,
       CAST(min(fdoc.caplen) AS BIGINT) AS first_caplen,
       min(tl.lang) AS top_lang
FROM lk JOIN fdoc ON fdoc.img = lk.img JOIN toplang tl ON tl.img = lk.img
GROUP BY lk.img"""


# ------------------------------------------------------------ oracle SQL --

def _engines_values() -> str:
    rows = []
    for eng_i, (name, start, stop, step) in enumerate(ENGINES):
        for off_i, off in enumerate(range(start, stop, step)):
            rows.append(f"({eng_i}, '{name}', {off_i}, {off}, {9 - eng_i})")
    return ("(VALUES " + ", ".join(rows)
            + ") AS e(eng_i, engine, off_i, off_val, priority)")


def _templates_values() -> str:
    rows = [f"({i}, '{t}')" for i, t in enumerate(ORACLE_TEMPLATES)]
    return "(VALUES " + ", ".join(rows) + ") AS v(var_i, template)"


SQL_KW = """
kw AS (
  SELECT r.r_name AS category,
         n.n_name AS keyword,
         DENSE_RANK() OVER (ORDER BY r.r_regionkey) - 1 AS cat_i,
         ROW_NUMBER() OVER (ORDER BY r.r_regionkey, n.n_nationkey) - 1 AS kw_i
  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
)
"""


def _kwgen_templates_values() -> str:
    from pixcrawler_ray.functions.variations import GENERATED_KEYWORD_TEMPLATES
    rows = [f"({i}, '{t}')"
            for i, t in enumerate(GENERATED_KEYWORD_TEMPLATES)]
    return "(VALUES " + ", ".join(rows) + ") AS g(g_i, tmpl)"


# kw CTE under keyword_generation=enabled over the kwgen_config seeds:
# regions 0-1 carry user keywords (origin 0, nationkey order), every region
# gets generated keywords (origin 1, template order); order-preserving dedup
# by (origin, seq) then global kw_i numbering — the D1 union pin.
def _sql_kw_gen() -> str:
    return f"""
kw AS (
  SELECT category, keyword, DENSE_RANK() OVER (ORDER BY cat_seq) - 1 AS cat_i,
         ROW_NUMBER() OVER (ORDER BY cat_seq, origin, kseq) - 1 AS kw_i
  FROM (
    SELECT * FROM (
      SELECT r.r_name AS category, r.r_regionkey AS cat_seq,
             n.n_name AS keyword, 0 AS origin,
             CAST(n.n_nationkey AS BIGINT) AS kseq
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_regionkey < 2
      UNION ALL
      SELECT r.r_name, r.r_regionkey,
             replace(g.tmpl, '{{cat}}', r.r_name), 1,
             CAST(g.g_i AS BIGINT)
      FROM region r CROSS JOIN {_kwgen_templates_values()}
    ) u
    QUALIFY ROW_NUMBER() OVER (PARTITION BY category, keyword
                               ORDER BY origin, kseq) = 1
  ) d
)
"""


def _sql_units(kw_cte: str | None = None) -> str:
    return f"""
WITH {kw_cte if kw_cte is not None else SQL_KW},
units AS (
  SELECT k.category, k.keyword, e.engine,
         replace(v.template, '{{kw}}', k.keyword) AS variation,
         e.off_val AS "offset", e.priority,
         k.cat_i, k.kw_i, e.eng_i, v.var_i, e.off_i,
         ROW_NUMBER() OVER (ORDER BY k.kw_i, e.eng_i, v.var_i, e.off_i) - 1
           AS unit_seq
  FROM kw k CROSS JOIN {_engines_values()} CROSS JOIN {_templates_values()}
)
"""


def _selected_var_values(dims_dir: str = "/root/testdata/sf0.001") -> str:
    """Inline VALUES of the SEEDED variation selection (M2) per keyword.

    The hash64-seeded permutation in ``select_variations`` is not
    SQL-expressible, but it is a pure function of the FIXED dimension
    tables (region/nation are scale-invariant: byte-identical at
    sf0.001/0.01/0.1), so the selected lists are computed once here and
    inlined; the SQL joins them back on keyword name. This is what lets
    the flagship — which runs the DEFAULT seeded-selection expansion, not
    the fixed-template oracle mode — replay end-to-end in DuckDB."""
    from pixcrawler_ray.functions.variations import select_variations

    cfg = seeds_config(dims_dir)
    rows = []
    for cat, kw in cfg.prepared_keywords():
        for var_i, v in enumerate(select_variations(
                cfg.dataset_name, cat, kw, cfg.max_images)):
            kq = kw.replace("'", "''")
            vq = v.replace("'", "''")
            rows.append(f"('{kq}', {var_i}, '{vq}')")
    return ("(VALUES " + ", ".join(rows)
            + ") AS v(keyword, var_i, variation)")


def _sql_units_selected() -> str:
    """units CTE for the DEFAULT expansion mode (seeded variation
    selection) — same shape as ``_sql_units`` with the template cross
    join replaced by the inlined per-keyword selection."""
    return f"""
WITH {SQL_KW.strip()},
units AS (
  SELECT k.category, k.keyword, e.engine, v.variation,
         e.off_val AS "offset", e.priority,
         k.cat_i, k.kw_i, e.eng_i, v.var_i, e.off_i,
         ROW_NUMBER() OVER (ORDER BY k.kw_i, e.eng_i, v.var_i, e.off_i) - 1
           AS unit_seq
  FROM kw k JOIN {_selected_var_values()} ON v.keyword = k.keyword
  CROSS JOIN {_engines_values()}
)
"""


def _sql_cand(page_size: int = PAGE_SIZE,
              units_sql: str | None = None) -> str:
    """CTE chain: units -> candidates with url/host arithmetic -> dedup."""
    return (units_sql if units_sql is not None else _sql_units()) + f""",
nd AS (SELECT count(*) AS n FROM documents),
cand AS (
  SELECT u.*, s.slot,
         (u.cat_i*131071 + u.kw_i*8191 + u.eng_i*524287 + u.var_i*127
          + (u."offset" + s.slot)*2654435761) % nd.n AS doc_id,
         u.unit_seq*{page_size} + s.slot AS seq
  FROM units u CROSS JOIN generate_series(0, {page_size - 1}) s(slot)
  CROSS JOIN nd
),
cand2 AS (
  SELECT c.*,
         CASE WHEN c.doc_id % 3 = 0 THEN 0
              ELSE 1 + (c.doc_id * 2654435761) % 499 END AS host_id
  FROM cand c
),
cand3 AS (
  SELECT c.*,
         'h' || CAST(c.host_id AS VARCHAR) || '.example.com' AS host,
         CASE WHEN c.doc_id % 50 = 7
              THEN '/private/doc/' || CAST(c.doc_id AS VARCHAR)
              ELSE '/doc/' || CAST(c.doc_id AS VARCHAR) END AS path
  FROM cand2 c
),
frontier AS (
  SELECT c.*, 'http://' || c.host || c.path AS url
  FROM cand3 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY ('http://' || c.host || c.path)
                             ORDER BY c.seq) = 1
),
allowed AS (
  SELECT f.* FROM frontier f
  WHERE NOT (f.host_id % 20 = 1 AND f.host_id <> 0
             AND f.path LIKE '/private/%')
),
statused AS (
  -- transient (503) wins over the content filter (415), matching the
  -- fetch stage's check order (Fetcher.__call__ / oracle.run_oracle)
  SELECT a.*,
         CASE WHEN a.doc_id % 89 = 3 THEN 503
              WHEN a.doc_id % 97 = 13 THEN 415
              ELSE 200 END AS status
  FROM allowed a
)
"""


def oracle_sql_crawl() -> dict[str, str]:
    page_size = PAGE_SIZE
    out = {}
    out["crawl_units"] = _sql_units() + """
SELECT category, keyword, engine, variation, "offset", priority, unit_seq
FROM units"""
    out["crawl_units_kwgen"] = _sql_units(kw_cte=_sql_kw_gen().strip()) + """
SELECT category, keyword, engine, variation, "offset", priority, unit_seq
FROM units"""
    out["extract_image_links"] = """
WITH exts AS (
  SELECT * FROM (VALUES (0, TRUE), (1, TRUE), (2, TRUE), (3, TRUE),
                        (4, TRUE), (5, FALSE), (6, FALSE), (7, FALSE))
         AS e(i, ok)
),
l AS (
  SELECT d.doc_id, e.ok
  FROM documents d
  JOIN generate_series(0, 2) AS j(j) ON j.j < d.doc_id % 4
  JOIN exts e ON e.i = (d.doc_id + j.j) % 8
  WHERE d.doc_id % 97 <> 13          -- malformed pages extract no links
),
agg AS (
  SELECT doc_id, COUNT(*) AS c_raw,
         SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS c_img
  FROM l GROUP BY doc_id
)
SELECT 'links' AS section,
       'http://h' || CAST(CASE WHEN d.doc_id % 3 = 0 THEN 0
                               ELSE 1 + (d.doc_id * 2654435761) % 499 END
                          AS VARCHAR)
       || '.example.com'
       || CASE WHEN d.doc_id % 50 = 7
               THEN '/private/doc/' || CAST(d.doc_id AS VARCHAR)
               ELSE '/doc/' || CAST(d.doc_id AS VARCHAR) END AS url,
       CAST(COALESCE(a.c_raw, 0) AS BIGINT) AS a,
       CAST(COALESCE(a.c_img, 0) AS BIGINT) AS b,
       CAST(-1 AS BIGINT) AS c, CAST(-1 AS BIGINT) AS d,
       '' AS lang
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
UNION ALL
SELECT 'captions', img, n_refs, n_hosts, first_doc, first_caplen, top_lang
FROM (""" + _SQL_CAPTIONS + ")"
    out["crawl_frontier"] = _sql_cand() + """
SELECT f.url, f.host, f.doc_id, f.seq, f.keyword, f.priority,
       NOT (f.host_id % 20 = 1 AND f.host_id <> 0
            AND f.path LIKE '/private/%') AS robots_allowed
FROM frontier f"""
    # (r5) 'authority' section: damped conserving integer PageRank at
    # rounds=3 (the same unrolled CTE chain as the link_mass oracle,
    # sp-prefixed) re-prioritizes the allowed frontier — the
    # importance-driven schedule of the north star.
    _sp_sends = " UNION ALL ".join(
        f"SELECT (m.doc_id * {mu} + {ad}) % nd.n AS doc_id, "
        f"(m.mass * 85 // 100) // (1 + m.doc_id % 3) AS mass "
        f"FROM sp{{r}} m, nd WHERE 1 + m.doc_id % 3 > {j}"
        for j, (mu, ad) in enumerate(zip((7, 9, 11), (13, 14, 15)))
    ) + (" UNION ALL SELECT doc_id, CAST(0 AS BIGINT) FROM documents")
    _sp = (",\nsp0 AS (SELECT doc_id, CAST(1000 AS BIGINT) AS mass "
           "FROM documents)")
    for _r in range(3):
        _sp += (
            f",\nsps{_r} AS ({_sp_sends.format(r=_r)}),\n"
            f"spr{_r + 1} AS (SELECT doc_id, CAST(SUM(mass) AS BIGINT) "
            f"AS mass FROM sps{_r} GROUP BY doc_id),\n"
            f"spt{_r + 1} AS (SELECT CAST(1000 AS BIGINT) * nd.n "
            f"- (SELECT SUM(mass) FROM spr{_r + 1}) AS rr, nd.n AS n "
            f"FROM nd),\n"
            f"sp{_r + 1} AS (SELECT r.doc_id, CAST(r.mass + t.rr // t.n "
            f"+ CASE WHEN r.doc_id < t.rr % t.n THEN 1 ELSE 0 END "
            f"AS BIGINT) AS mass FROM spr{_r + 1} r, spt{_r + 1} t)")
    out["crawl_schedule"] = _sql_cand() + _sp + f"""
SELECT 'budget' AS section, url, host, seq,
       ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, seq) - 1
         AS host_rank,
       (ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, seq) - 1)
         // {ORACLE_BUDGET_PER_ROUND} AS round,
       (ROW_NUMBER() OVER (PARTITION BY host ORDER BY priority DESC, seq) - 1)
         // GREATEST({ORACLE_BUDGET_PER_ROUND} // (1 + host_id % 3), 1)
         AS round_delay
FROM allowed
UNION ALL
SELECT 'authority', a.url, a.host, a.seq,
       ROW_NUMBER() OVER (PARTITION BY a.host
                          ORDER BY p.mass DESC, a.seq) - 1,
       (ROW_NUMBER() OVER (PARTITION BY a.host
                           ORDER BY p.mass DESC, a.seq) - 1)
         // {ORACLE_BUDGET_PER_ROUND},
       CAST(-1 AS BIGINT)
FROM allowed a JOIN sp3 p ON p.doc_id = a.doc_id"""
    out["crawl_fetch_status"] = _sql_cand() + """
SELECT url, seq, status FROM statused"""
    out["crawl_quarantine"] = _sql_cand() + """
SELECT url, seq, status,
       CASE status WHEN 404 THEN 'not_found'
                   WHEN 415 THEN 'content_rejected'
                   WHEN 403 THEN 'robots_blocked' END AS reason
FROM statused WHERE status IN (403, 404, 415)"""
    out["crawl_budget"] = _sql_cand() + f"""
SELECT url, keyword, seq FROM statused
WHERE status = 200
QUALIFY ROW_NUMBER() OVER (PARTITION BY keyword ORDER BY seq)
        <= {ORACLE_MAX_IMAGES}"""
    # MERGED row: incremental-crawl delta ('delta') + recrawl schedule from
    # snapshot change history ('recrawl', r5) — both are "what to crawl
    # next" maintenance outputs, section-tagged on (section, url, k, a, b, c)
    from pixcrawler_ray.stages.recrawl import (
        CHANGE_MOD, CHANGE_THRESHOLD, EPOCHS, _MULT_D, _MULT_E)
    out["crawl_delta"] = _sql_cand() + f""",
ok AS (SELECT url, keyword, seq FROM statused WHERE status = 200),
e1 AS (SELECT url FROM ok
       QUALIFY ROW_NUMBER() OVER (PARTITION BY keyword ORDER BY seq)
               <= {ORACLE_MAX_IMAGES}),
e2 AS (SELECT url, keyword, seq FROM ok
       QUALIFY ROW_NUMBER() OVER (PARTITION BY keyword ORDER BY seq)
               <= {2 * ORACLE_MAX_IMAGES}),
eps AS (SELECT UNNEST(range(0, {EPOCHS})) AS epoch),
snap AS (
  SELECT d.doc_id, d.text, e.epoch,
         SUM(CASE WHEN e.epoch >= 1 AND
                       (d.doc_id * {_MULT_D} + e.epoch * {_MULT_E})
                       % {CHANGE_MOD} < {CHANGE_THRESHOLD}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY d.doc_id ORDER BY e.epoch) AS version
  FROM documents d CROSS JOIN eps e
),
surl AS (
  SELECT 'http://h' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                                 ELSE 1 + (doc_id * 2654435761) % 499 END
                            AS VARCHAR)
         || '.example.com'
         || CASE WHEN doc_id % 50 = 7
                 THEN '/private/doc/' || CAST(doc_id AS VARCHAR)
                 ELSE '/doc/' || CAST(doc_id AS VARCHAR) END AS url,
         epoch, md5(text || '|' || CAST(version AS VARCHAR)) AS content_md5
  FROM snap
),
chg AS (
  SELECT url,
         CASE WHEN LAG(content_md5) OVER w IS NOT NULL
                   AND content_md5 <> LAG(content_md5) OVER w
              THEN 1 ELSE 0 END AS c
  FROM surl WINDOW w AS (PARTITION BY url ORDER BY epoch)
),
rec AS (
  SELECT url, SUM(c) AS changes, COUNT(*) AS n_snaps,
         (COUNT(*) - 1)
           + GREATEST(1, (COUNT(*) - 1) // (SUM(c) + 1)) AS next_epoch
  FROM chg GROUP BY url
),
nd2 AS (SELECT COUNT(*) AS n FROM documents),
hge AS (
  SELECT doc_id AS s, (doc_id * 7 + 13) % nd2.n AS t
  FROM documents, nd2 WHERE 1 + doc_id % 3 > 0
  UNION ALL SELECT doc_id, (doc_id * 9 + 14) % nd2.n
  FROM documents, nd2 WHERE 1 + doc_id % 3 > 1
  UNION ALL SELECT doc_id, (doc_id * 11 + 15) % nd2.n
  FROM documents, nd2 WHERE 1 + doc_id % 3 > 2
),
hgh AS (
  SELECT CASE WHEN s % 3 = 0 THEN 0
              ELSE 1 + (s * 2654435761) % 499 END AS h_src,
         CASE WHEN t % 3 = 0 THEN 0
              ELSE 1 + (t * 2654435761) % 499 END AS h_tgt
  FROM hge
),
hgo AS (SELECT h_src AS h, COUNT(*) AS oe, COUNT(DISTINCT h_tgt) AS oh
        FROM hgh GROUP BY h_src),
hgi AS (SELECT h_tgt AS h, COUNT(*) AS ie FROM hgh GROUP BY h_tgt)
SELECT 'delta' AS section, e2.url, e2.keyword AS k,
       e2.seq AS a, CAST(-1 AS BIGINT) AS b, CAST(-1 AS BIGINT) AS c
FROM e2 ANTI JOIN e1 USING (url)
UNION ALL
SELECT 'recrawl', url, '', CAST(changes AS BIGINT),
       CAST(n_snaps AS BIGINT), CAST(next_epoch AS BIGINT)
FROM rec
UNION ALL
SELECT 'hostgraph', 'h' || CAST(hgo.h AS VARCHAR) || '.example.com', '',
       CAST(hgo.oe AS BIGINT), CAST(hgo.oh AS BIGINT),
       CAST(COALESCE(hgi.ie, 0) AS BIGINT)
FROM hgo LEFT JOIN hgi ON hgi.h = hgo.h"""
    out["crawl_extract"] = _sql_cand() + f"""
SELECT s.url, s.seq,
       md5(CASE WHEN s.doc_id % 97 = 13 THEN '' ELSE d.text END) AS text_md5,
       (s.doc_id % 97 <> 13) AS valid
FROM statused s JOIN documents d ON s.doc_id = d.doc_id
WHERE s.status = 200
QUALIFY ROW_NUMBER() OVER (PARTITION BY s.keyword ORDER BY s.seq)
        <= {ORACLE_MAX_IMAGES}"""
    # crawl_e2e — the FLAGSHIP composed across retry generations (VERDICT
    # r4 #3). run_crawl's multi-generation dataflow is pure arithmetic:
    # gen 0 fetches the admitted frontier (503 iff doc%89==3 at depth 0,
    # 415 iff malformed doc%97==13, else 200), budgets per keyword, then
    # dedups extracted content; gen 1 re-fetches ONLY the 503 rows at
    # depth 1 where the transient clause no longer applies (fetch.Fetcher
    # gates transient on depth==0), so they resolve to 200/415 by the same
    # corpus arithmetic — and gen 2+ are empty (no 503 source at depth>0).
    # content_md5/phash dedup groups are replayed as distinct-text groups:
    # both signatures are pure functions of the extracted text ==
    # documents.text for valid pages (simhash verified collision-free on
    # this corpus — same pin as dedup_simhash_kept). The final global
    # dedup + cumulative keyword budget replay run_crawl's merge step.
    def _gen_cte(status_pred: str) -> str:
        return f"""(
  SELECT s.url, s.keyword, s.seq, d.text
  FROM (SELECT * FROM statused WHERE {status_pred}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY keyword ORDER BY seq)
                <= {ORACLE_MAX_IMAGES}) s
  JOIN documents d ON s.doc_id = d.doc_id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY d.text ORDER BY s.seq) = 1
)"""
    out["crawl_e2e"] = _sql_cand(units_sql=_sql_units_selected()) + f""",
g0 AS {_gen_cte("status = 200")},
g1 AS {_gen_cte("status = 503 AND doc_id % 97 <> 13")},
uni AS (SELECT * FROM g0 UNION ALL SELECT * FROM g1),
dd AS (SELECT * FROM uni
       QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY seq) = 1)
SELECT url, keyword, seq, TRUE AS valid FROM dd
QUALIFY ROW_NUMBER() OVER (PARTITION BY keyword ORDER BY seq)
        <= {ORACLE_MAX_IMAGES}"""
    out["pages_per_host"] = """
SELECT 'h' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                        ELSE 1 + (doc_id * 2654435761) % 499 END AS VARCHAR)
       || '.example.com' AS host,
       count(*) AS n_pages
FROM documents GROUP BY 1"""
    out["extract_all_pages"] = """
SELECT 'http://h' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                               ELSE 1 + (doc_id * 2654435761) % 499 END
                          AS VARCHAR)
       || '.example.com'
       || CASE WHEN doc_id % 50 = 7
               THEN '/private/doc/' || CAST(doc_id AS VARCHAR)
               ELSE '/doc/' || CAST(doc_id AS VARCHAR) END AS url,
       md5(CASE WHEN doc_id % 97 = 13 THEN '' ELSE text END) AS text_md5,
       (doc_id % 97 <> 13) AS valid,
       lang
FROM documents"""
    return out
