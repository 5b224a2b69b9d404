"""Frontier expansion: crawl config -> work-unit grid -> candidate-URL frontier.

Reference semantics being reproduced (SURVEY §3.1 "canonical ordering"):
categories in config order -> keywords in list order -> engines in
``get_engines()`` order -> variations in (seeded) selection order -> results
in engine-offset order. The reference walks this nesting with sequential
loops (``builder/_generator.py:1205-1280``, ``builder/_engine.py:197-254``);
here the ordering is *carried as data* — a dense ``seq`` rank — never as
execution order.

Two tiers:
- the WORK-UNIT grid (category x keyword x engine x variation x offset) is
  config-sized (thousands of rows) and is built driver-side into one Arrow
  table, exactly like the reference builds it in-process;
- the CANDIDATE frontier (one row per candidate URL; the 10^10-scale part) is
  produced by a distributed ``map_batches`` flat-map over the grid. Candidate
  doc-ids are pure integer arithmetic in the unit indices (SQL-replayable —
  see ``candidate_doc_ids``), standing in for the engine result pages the
  reference parses (``builder/_search_engines.py:282-298``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from pixcrawler_ray import corpus
from pixcrawler_ray.functions.variations import (
    generate_keywords,
    sanitize_keyword,
    select_variations,
    validate_keyword,
)

# Engine grid — same shape as the reference's ENGINE_CONFIGS
# (builder/_config.py:97-120): (name, offset_start, offset_stop, offset_step).
ENGINES: list[tuple[str, int, int, int]] = [
    ("google", 0, 20, 20),   # offsets [0]
    ("bing", 0, 30, 10),     # offsets [0, 10, 20]
    ("baidu", 10, 50, 15),   # offsets [10, 25, 40]
    ("ddgs", 0, 10, 10),     # offsets [0] — the fallback engine (_search_engines.py:282-298)
]

PAGE_SIZE = 10          # candidate urls per (unit, offset) "result page"
CAND_STRIDE = 2654435761  # candidate doc spacing (Knuth constant, SQL-safe)
MAX_KEYWORDS_PER_CATEGORY = 64  # D4 post-union cap (builder/_config.py bound)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("category", pa.string()),
        ("keyword", pa.string()),
        ("variation", pa.string()),
        ("engine", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int64()),
        ("seq", pa.int64()),
        ("doc_id", pa.int64()),
        ("host_id", pa.int64()),
    ]
)


@dataclass
class CrawlConfig:
    """S1 — validated crawl config (builder/_config.py:31-94 CONFIG_SCHEMA)."""

    dataset_name: str
    categories: dict[str, list[str]]
    max_images: int = 1000
    max_retries: int = 3
    keyword_generation: str = "disabled"
    generate_labels: bool = True
    options: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, cfg: dict) -> "CrawlConfig":
        if "dataset_name" not in cfg or "categories" not in cfg:
            raise ValueError("config requires dataset_name and categories")
        opts = cfg.get("options", {})
        mi = int(opts.get("max_images", 1000))
        if not 1 <= mi <= 50000:
            raise ValueError("max_images out of range 1..50000")
        return cls(
            dataset_name=cfg["dataset_name"],
            categories={k: list(v) for k, v in cfg["categories"].items()},
            max_images=mi,
            max_retries=int(opts.get("max_retries", 3)),
            keyword_generation=opts.get("keyword_generation", "disabled"),
            generate_labels=bool(opts.get("generate_labels", True)),
            options=opts,
        )

    def keyword_plan(self) -> dict[str, dict]:
        """M6/D1 — per-category keyword resolution under ``keyword_generation``
        (builder/_keywords.py:36-89 ``prepare_keywords``):

        - no keywords, mode auto/enabled -> generated keywords
        - no keywords, mode disabled     -> [category]
        - keywords,    mode enabled      -> user keywords UNION generated ones
          (order pinned: user keywords in config order first, then generated
          keywords not already present, in generator order — SURVEY D1; the
          reference's ``list(set(...))`` order is irreproducible by design)
        - keywords,    mode auto/disabled -> user keywords unchanged
        - mode "ai" (ST5, r5): same union rules as enabled/auto but the
          generator is the :class:`~pixcrawler_ray.functions.aikeywords.
          LocalLMKeywordClient` — retries/backoff/fallback in virtual time
          (pytest-verified; not SQL-oracled, the LM output has no SQL
          analog — the client falls back to these templates on exhaustion)

        Returns per category: keywords, original_keywords, generated_keywords,
        generation_occurred (the reference's prepare_keywords dict).
        """
        mode = self.keyword_generation
        if mode == "ai":
            from pixcrawler_ray.functions.aikeywords import (
                LocalLMKeywordClient)
            client = LocalLMKeywordClient()
            gen = lambda cat: client.generate(cat, 8)  # noqa: E731
        else:
            gen = generate_keywords
        plan: dict[str, dict] = {}
        for cat, kws in self.categories.items():
            original = [k.strip() for k in (kws or []) if k and k.strip()]
            generated: list[str] = []
            occurred = False
            if not original and mode in ("auto", "enabled", "ai"):
                generated = gen(cat)
                final = list(generated)
                occurred = True
            elif not original:
                final = [cat]
            elif mode in ("enabled", "ai"):
                generated = gen(cat)
                have = set(original)
                final = original + [g for g in generated if g not in have]
                occurred = True
            else:
                final = list(original)
            plan[cat] = {
                "keywords": final,
                "original_keywords": original,
                "generated_keywords": generated,
                "generation_occurred": occurred,
            }
        return plan

    def prepared_keywords(self) -> list[tuple[str, str]]:
        """(category, keyword) pairs in canonical order.

        Keyword-generation modes applied per :meth:`keyword_plan` (M6/D1);
        invalid keywords filtered (M4); order preserved (D2); capped at
        ``MAX_KEYWORDS_PER_CATEGORY`` post-union (D4).
        """
        out: list[tuple[str, str]] = []
        for cat, plan in self.keyword_plan().items():
            seen: set[str] = set()
            kept = 0
            for kw in plan["keywords"]:
                kw = kw.strip()
                if kept >= MAX_KEYWORDS_PER_CATEGORY:
                    break
                if validate_keyword(kw) and kw not in seen:
                    seen.add(kw)
                    out.append((cat, sanitize_keyword(kw)))
                    kept += 1
        return out


def keyword_generation_stats(config: CrawlConfig) -> dict:
    """A5 — keyword-generation statistics (builder/_keywords.py:259-290)."""
    plan = config.keyword_plan()
    stats = {
        "total_categories": len(plan),
        "categories_with_generation":
            sum(1 for p in plan.values() if p["generation_occurred"]),
        "total_original_keywords":
            sum(len(p["original_keywords"]) for p in plan.values()),
        "total_generated_keywords":
            sum(len(p["generated_keywords"]) for p in plan.values()),
        "total_final_keywords":
            sum(len(p["keywords"]) for p in plan.values()),
        "generation_rate": 0.0,
    }
    if stats["total_categories"]:
        stats["generation_rate"] = (stats["categories_with_generation"]
                                    / stats["total_categories"])
    return stats


def work_unit_grid(config: CrawlConfig, depth: int = 0,
                   fixed_templates: list[str] | None = None) -> pa.Table:
    """Driver-side grid: one row per (category, keyword, engine, variation,
    offset), dense ``unit_seq`` in canonical nesting order.

    ``priority`` mirrors the reference's queue priority 0-9 (default 5,
    ``celery_core/config.py:281-294``): earlier engines get higher priority,
    retries (depth>0) demoted one level per round.
    """
    rows: dict[str, list] = {
        "category": [], "keyword": [], "engine": [], "variation": [],
        "offset": [], "cat_i": [], "kw_i": [], "eng_i": [], "var_i": [],
        "off_i": [], "priority": [], "unit_seq": [], "depth": [],
    }
    seq = 0
    cat_index: dict[str, int] = {}
    for kw_i, (cat, kw) in enumerate(config.prepared_keywords()):
        cat_i = cat_index.setdefault(cat, len(cat_index))
        if fixed_templates is not None:
            # SQL-replayable mode: an explicit template list (the oracle
            # inlines the same list as VALUES + replace()).
            variations = [t.format(kw=kw) for t in fixed_templates]
        else:
            variations = select_variations(config.dataset_name, cat, kw,
                                           config.max_images)
        for eng_i, (eng, start, stop, step) in enumerate(ENGINES):
            for var_i, var in enumerate(variations):
                for off_i, off in enumerate(range(start, stop, step)):
                    rows["category"].append(cat)
                    rows["keyword"].append(kw)
                    rows["engine"].append(eng)
                    rows["variation"].append(var)
                    rows["offset"].append(off)
                    rows["cat_i"].append(cat_i)
                    rows["kw_i"].append(kw_i)
                    rows["eng_i"].append(eng_i)
                    rows["var_i"].append(var_i)
                    rows["off_i"].append(off_i)
                    rows["priority"].append(9 - eng_i - depth)
                    rows["unit_seq"].append(seq)
                    rows["depth"].append(depth)
                    seq += 1
    t = pa.table(rows)
    return t.cast(pa.schema([
        ("category", pa.string()), ("keyword", pa.string()),
        ("engine", pa.string()), ("variation", pa.string()),
        ("offset", pa.int64()), ("cat_i", pa.int64()), ("kw_i", pa.int64()),
        ("eng_i", pa.int64()), ("var_i", pa.int64()), ("off_i", pa.int64()),
        ("priority", pa.int64()), ("unit_seq", pa.int64()),
        ("depth", pa.int32()),
    ]))


def candidate_doc_ids(cat_i, kw_i, eng_i, var_i, offset, slot, n_docs: int):
    """Simulated search-result doc-id — pure int64 arithmetic, SQL-replayable.

    ``(cat_i*131071 + kw_i*8191 + eng_i*524287 + var_i*127
       + (offset + slot) * 2654435761) % n_docs``

    Stands in for the engine's parsed result page at (variation, offset)
    (``builder/_search_engines.py:294-298`` over-fetch + offset pagination).
    All operands stay < 2^63 for any realistic grid.
    """
    return (
        cat_i * 131071 + kw_i * 8191 + eng_i * 524287 + var_i * 127
        + (offset + slot) * CAND_STRIDE
    ) % n_docs


def expand_units_batch(batch: pa.Table, n_docs: int,
                       page_size: int = PAGE_SIZE) -> pa.Table:
    """Work-unit batch -> candidate-frontier batch (distributed flat-map).

    Emits ``page_size`` candidate urls per unit with
    ``seq = unit_seq * page_size + slot`` (dense, order-preserving).
    """
    n = batch.num_rows
    if n == 0:
        return pa.table({f.name: pa.array([], type=f.type)
                         for f in FRONTIER_SCHEMA})
    cols = {c: batch.column(c).to_numpy() for c in
            ("cat_i", "kw_i", "eng_i", "var_i", "offset", "priority",
             "unit_seq")}
    depth = batch.column("depth").to_numpy()
    slots = np.arange(page_size, dtype=np.int64)
    rep = np.repeat(np.arange(n), page_size)          # unit row index per output
    slot = np.tile(slots, n)
    doc = candidate_doc_ids(
        cols["cat_i"][rep], cols["kw_i"][rep], cols["eng_i"][rep],
        cols["var_i"][rep], cols["offset"][rep], slot, n_docs,
    )
    url, host = corpus.urls_hosts_arrow(doc)
    host_id = corpus.host_ids(doc)
    take = lambda name: batch.column(name).take(pa.array(rep))
    return pa.table(
        {
            "url": url,
            "host": host,
            "category": take("category"),
            "keyword": take("keyword"),
            "variation": take("variation"),
            "engine": take("engine"),
            "depth": pa.array(depth[rep], type=pa.int32()),
            "priority": pa.array(cols["priority"][rep], type=pa.int64()),
            "seq": pa.array(cols["unit_seq"][rep] * page_size + slot,
                            type=pa.int64()),
            "doc_id": pa.array(doc, type=pa.int64()),
            "host_id": pa.array(host_id, type=pa.int64()),
        }
    )


def expand_units_lean_batch(batch: pa.Table, n_docs: int,
                            page_size: int = PAGE_SIZE) -> pa.Table:
    """Integer-only frontier expansion (late materialization).

    Emits ONLY the 5 int64/int32 columns the admission shuffles consume
    (depth, priority, seq, doc_id, host_id); the 6 string columns of the
    full frontier schema (url, host, category, keyword, variation, engine)
    are pure functions of (doc_id, seq) and are re-attached AFTER admission
    by :func:`hydrate_frontier_batch`. At the bench scale this cuts the
    two admission exchanges from ~300 to ~40 bytes/row and removes the
    per-candidate url/host string rendering from the pre-shuffle hot path.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table({
            "depth": pa.array([], type=pa.int32()),
            "priority": pa.array([], type=pa.int64()),
            "seq": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "host_id": pa.array([], type=pa.int64()),
        })
    cols = {c: batch.column(c).to_numpy() for c in
            ("cat_i", "kw_i", "eng_i", "var_i", "offset", "priority",
             "unit_seq")}
    depth = batch.column("depth").to_numpy()
    slots = np.arange(page_size, dtype=np.int64)
    rep = np.repeat(np.arange(n), page_size)
    slot = np.tile(slots, n)
    doc = candidate_doc_ids(
        cols["cat_i"][rep], cols["kw_i"][rep], cols["eng_i"][rep],
        cols["var_i"][rep], cols["offset"][rep], slot, n_docs,
    )
    return pa.table({
        "depth": pa.array(depth[rep], type=pa.int32()),
        "priority": pa.array(cols["priority"][rep], type=pa.int64()),
        "seq": pa.array(cols["unit_seq"][rep] * page_size + slot,
                        type=pa.int64()),
        "doc_id": pa.array(doc, type=pa.int64()),
        "host_id": pa.array(corpus.host_ids(doc), type=pa.int64()),
    })


def expand_split_task(grid_slice: pa.Table, n_docs: int, page_size: int,
                      num_buckets: int, p: int):
    """Folded expansion->stamp->split wave (VERDICT r4 #4): one task expands
    its grid slice to lean frontier rows, stamps hash(doc_id) buckets, and
    returns the ``p`` exchange slices directly — the admission exchange's
    first split is FREE (no 20M-row materialize barrier, no second read of
    the expansion output, one task wave instead of two). Invoked as a
    ``num_returns=p`` remote task by ``admit_salted_fused``."""
    from pixcrawler_ray.stages.shuffle import _exchange_split, stamp_bucket

    t = expand_units_lean_batch(grid_slice, n_docs=n_docs,
                                page_size=page_size)
    t = stamp_bucket(t, ["doc_id"], num_buckets)
    return _exchange_split(t, p)


# per-worker grid cache for hydration (same pattern as fetch._VF_CACHE)
_GRID_CACHE: dict = {}


def hydrate_frontier_batch(t: pa.Table, grid_ref=None,
                           page_size: int = PAGE_SIZE) -> pa.Table:
    """Re-attach the derivable string columns to a lean (admitted) frontier.

    url/host come from ``doc_id`` (corpus derivation); category / keyword /
    variation / engine come from the broadcast work-unit grid row at
    ``seq // page_size``. Output column order matches the full frontier
    schema, with any admission columns (host_rank, round) appended after.
    Runs fused with the downstream fetch stage — no extra pass.
    """
    import ray as _ray

    key = grid_ref.hex() if hasattr(grid_ref, "hex") else id(grid_ref)
    grid = _GRID_CACHE.get(key)
    if grid is None:
        if len(_GRID_CACHE) > 4:
            _GRID_CACHE.clear()
        g = _ray.get(grid_ref) if hasattr(grid_ref, "hex") else grid_ref
        grid = g.combine_chunks()
        _GRID_CACHE[key] = grid
    if t.num_rows == 0 or "seq" not in t.column_names:
        out = {name: pa.array([], type=pa.string())
               for name in ("url", "host", "category", "keyword",
                            "variation", "engine")}
        for name in t.column_names:
            out[name] = t.column(name)
        return pa.table(out)
    doc = t.column("doc_id").to_numpy()
    unit = pa.array(t.column("seq").to_numpy() // page_size)
    url, host = corpus.urls_hosts_arrow(doc)
    cols = {"url": url, "host": host}
    for name in ("category", "keyword", "variation", "engine"):
        cols[name] = grid.column(name).take(unit)
    order = ["url", "host", "category", "keyword", "variation", "engine",
             "depth", "priority", "seq", "doc_id", "host_id"]
    extras = [c for c in t.column_names if c not in order]
    for name in ("depth", "priority", "seq", "doc_id", "host_id"):
        cols[name] = t.column(name)
    for name in extras:
        cols[name] = t.column(name)
    return pa.table({name: cols[name] for name in order + extras})


def frontier_dataset(config: CrawlConfig, n_docs: int, depth: int = 0,
                     page_size: int = PAGE_SIZE,
                     fixed_templates: list[str] | None = None,
                     lean: bool = False):
    """Config -> lazy candidate-frontier Dataset (the distributed expansion).

    ``lean=True`` emits only the integer columns (late materialization);
    callers re-attach strings post-shuffle via :func:`hydrate_frontier_batch`
    with the grid broadcast by ref."""
    import ray.data as rd

    grid = work_unit_grid(config, depth=depth, fixed_templates=fixed_templates)
    ds = rd.from_arrow(grid)
    # Spread the grid so the flat-map parallelizes, sized to the OUTPUT
    # (grid rows x page_size candidates), ~32k candidate rows per block.
    # Block size is fixed by ROWS, never by cluster CPUs: capping block count
    # at ~cpus makes each task's working set grow as 1/cpus, and on this
    # host's slow-demand-paging hypervisor a 4x bigger fresh working set
    # costs far more than 4x (measured: the same expansion ran 12x slower at
    # 2 cpus than 8 under a 2*cpus cap). Many small blocks also work-steal.
    import math

    out_rows = grid.num_rows * page_size
    nblocks = max(1, min(math.ceil(out_rows / 32768), 512, grid.num_rows))
    if nblocks > 1:
        ds = ds.repartition(nblocks)
    fn = expand_units_lean_batch if lean else expand_units_batch
    return ds.map_batches(
        lambda b: fn(b, n_docs=n_docs, page_size=page_size),
        batch_format="pyarrow",
    )
