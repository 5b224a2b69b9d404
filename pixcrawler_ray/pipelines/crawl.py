"""The flagship pipeline: config -> frontier -> fetch -> extract -> dedup.

Ray-Data re-expression of the reference's two execution paths — the
sequential ``Builder.generate()`` loop (``builder/_generator.py:1101-1280``)
and the Celery fan-out (``backend/simple_flow.py:129-197``) — as ONE lazy
Dataset chain per generation:

    frontier_dataset            (M1-M5, S2/S3: expansion, distributed flat-map)
      -> dedup_frontier         (ST3 within-gen URL-seen: hash-partitioned keep-first)
      -> SeenAntiJoin           (J3 resume anti-join vs prior epochs; optional)
      -> apply_robots           (north-rule robots gate)
      -> assign_rounds          (O4 + politeness: host-hash shuffle, virtual time)
      -> fetch_dataset          (J5/S4: broadcast-index actor pool join)
      -> keep_first_n(keyword)  (ST2/O3 budget cap)
      -> extracted_dataset      (M12/M10/M11: the invariant transform)
      -> keep_first_by(md5)     (A3 exact dedup)
      -> keep_first_by(phash)   (A4 near dedup)

Retry semantics (``builder/_generator.py:282-341``): transient (503) rows are
re-queued as generation k+1 at ``depth+1`` — an iterative dataflow driven from
the driver (SURVEY §7.5.7), each generation a pure Dataset pipeline.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pixcrawler_ray import corpus
from pixcrawler_ray.extract import extracted_dataset
from pixcrawler_ray.stages.expand import (
    CrawlConfig,
    PAGE_SIZE,
    frontier_dataset,
)
from pixcrawler_ray.stages.fetch import (
    STATUS_OK,
    STATUS_TRANSIENT,
    build_pages_index,
    fetch_dataset,
)
from pixcrawler_ray.stages.politeness import assign_rounds
from pixcrawler_ray.stages.robots import apply_robots
from pixcrawler_ray.stages.seen import SeenAntiJoin, dedup_frontier
from pixcrawler_ray.stages.shuffle import (
    keep_first_by,
    keep_first_caps,
    keep_first_n,
)


# past this compressed-corpus size the broadcast fetch index no longer fits
# comfortably in a node's object store; fetch switches to the bucketed
# url-hash shuffle join (env-tunable for tests)
BROADCAST_INDEX_MAX_BYTES = int(os.environ.get(
    "GRAFT_BROADCAST_INDEX_MAX_BYTES", str(4 << 30)))


def n_documents(sf_dir: str) -> int:
    """Row count from parquet metadata only — no data read."""
    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def pages_index_ref(sf_dir: str, corpus_factor: int = 1):
    """Materialize the corpus index for the broadcast fetch path.

    Fine while the corpus fits a node (tests/bench); the 100 TB path swaps
    this for ``stages.shuffle.bucketed_join(frontier, pages, on="url")`` —
    same downstream schema. ``corpus_factor`` amplifies the corpus
    deterministically (bench scale; see corpus.amplified_documents).
    """
    if corpus_factor > 1:
        # render the amplified corpus DISTRIBUTED (html assembly is the
        # expensive part), then assemble the sorted index from the
        # object-store block refs — the driver only concatenates + sorts.
        pages_ds, _ = corpus.amplified_pages_dataset(sf_dir, corpus_factor)
        import ray as _ray
        refs = pages_ds.to_arrow_refs()
        pages = pa.concat_tables(_ray.get(refs)).combine_chunks()
    else:
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text", "lang"])
        pages = corpus.pages_batch(docs.combine_chunks())
    return build_pages_index(pages)


def admit_frontier(frontier_ds, budget_per_round: int = 8,
                   num_buckets: int = 64):
    """FUSED admission stage: url-dedup + robots gate + politeness ranks in
    ONE host-hash shuffle.

    Legal because all three are per-host decisions once urls carry their host:
    a url always maps to one host, so min-seq-per-url, the robots verdict and
    the per-host (priority DESC, seq) ranking can all run inside the same
    host-keyed bucket kernel — 1 all-to-all instead of 3 (the separate
    stages remain available for the per-stage oracle queries).
    """
    import pandas as pd

    from pixcrawler_ray import corpus as _corpus
    from pixcrawler_ray.stages.shuffle import per_bucket_take

    def kernel(df: pd.DataFrame):
        # pure-integer kernel: doc_id is bijective with url, host_id with
        # host, and path privacy is doc_id % 50 == 7 (corpus derivation) —
        # no string ops anywhere in the hot path.
        df = df.sort_values("seq", kind="mergesort")
        df = df[~df.duplicated("doc_id", keep="first")]
        hid = df["host_id"].to_numpy()
        disallow = _corpus.robots_disallowed_host(hid)
        private = (df["doc_id"].to_numpy() % _corpus.PRIVATE_MOD
                   == _corpus.PRIVATE_REM)
        df = df[~(disallow & private)]
        s = df.sort_values(["priority", "seq"], ascending=[False, True],
                           kind="mergesort")
        ranks = s.groupby("host_id", sort=False).cumcount().to_numpy()
        return s.index.to_numpy(), {
            "host_rank": ranks.astype(np.int64),
            "round": (ranks // budget_per_round).astype(np.int64),
        }

    return per_bucket_take(frontier_ds, ["host_id"],
                           ["doc_id", "host_id", "priority", "seq"], kernel,
                           num_buckets=num_buckets, fuse_slices=8)


def admit_frontier_salted(frontier_ds, budget_per_round: int = 8,
                          num_buckets: int = 64, num_salts: int = 16,
                          max_seq: int | None = None, stats: dict | None = None,
                          expansion: tuple | None = None):
    """Hot-host-safe admission: same output as :func:`admit_frontier`, but no
    single host ever lands in one bucket kernel.

    Pass A shuffles on ``doc_id`` (uniform regardless of host skew — h0 owns
    ~1/3 of the corpus but its doc ids hash evenly) for the per-doc decisions:
    min-seq URL dedup and the robots/privacy gate. Pass B/C are the
    range-salted rank shuffle (:func:`assign_rounds_salted`). Equality with
    the fused kernel is pytest-asserted (tests/test_crawl_e2e.py)."""
    import pandas as pd

    from pixcrawler_ray import corpus as _corpus
    from pixcrawler_ray.stages.politeness import (
        admit_salted_fused,
        assign_rounds_salted,
    )
    from pixcrawler_ray.stages.shuffle import per_bucket_take

    def dedup_robots_kernel(df: pd.DataFrame):
        df = df.sort_values("seq", kind="mergesort")
        df = df[~df.duplicated("doc_id", keep="first")]
        hid = df["host_id"].to_numpy()
        disallow = _corpus.robots_disallowed_host(hid)
        private = (df["doc_id"].to_numpy() % _corpus.PRIVATE_MOD
                   == _corpus.PRIVATE_REM)
        return df[~(disallow & private)].index.to_numpy()

    fused = admit_salted_fused(frontier_ds, dedup_robots_kernel,
                               budget_per_round=budget_per_round,
                               num_buckets=num_buckets,
                               num_salts=num_salts, max_seq=max_seq,
                               stats=stats, expansion=expansion)
    if fused is not None:
        return fused
    admitted = per_bucket_take(frontier_ds, ["doc_id"],
                               ["doc_id", "host_id", "seq"],
                               dedup_robots_kernel, num_buckets=num_buckets)
    # no materialize: the salted ranker now reads the admitted set exactly
    # once (group counts ride the rank exchange as a side aggregation)
    return assign_rounds_salted(admitted, budget_per_round=budget_per_round,
                                num_buckets=num_buckets, num_salts=num_salts,
                                max_seq=max_seq, stats=stats)


def build_frontier(config: CrawlConfig, sf_dir: str, depth: int = 0,
                   page_size: int = PAGE_SIZE, seen_shards=None,
                   budget_per_round: int = 8, seen_concurrency: int = 4,
                   fused: bool = True, corpus_factor: int = 1,
                   salted: bool = False, stats: dict | None = None,
                   lean: bool = False, politeness_shards=None):
    """Expansion -> url-dedup -> (resume anti-join) -> robots -> politeness.

    ``salted=True`` uses the hot-host-safe admission (doc-keyed dedup shuffle
    + range-salted rank shuffle) — identical output, no per-host straggler
    kernel; the default fused single-shuffle path wins at low skew/scale.

    ``lean=True`` (salted path only) runs the admission shuffles over the
    integer-only frontier and hydrates the string columns AFTER admission
    (fused with the next map stage) — identical output schema/rows, ~7x
    fewer exchange bytes.

    ``politeness_shards`` (STREAMING mode): admission goes through the
    stateful :class:`~pixcrawler_ray.stages.politeness.PolitenessShard`
    actors instead of the batch rank exchange — single-generation output is
    identical (pytest-asserted), and the shard counters persist so later
    generations continue in later rounds (the continuous-crawl semantic).
    """
    if lean:
        if not salted or seen_shards:
            raise ValueError("lean admission requires salted=True and no "
                             "seen filter (seen anti-join keys on url)")
        import ray as _ray

        from pixcrawler_ray.stages.expand import (
            hydrate_frontier_batch,
            work_unit_grid,
        )
        nd = n_documents(sf_dir) * corpus_factor
        grid = work_unit_grid(config, depth=depth)
        fr = frontier_dataset(config, nd, depth=depth, page_size=page_size,
                              lean=True)
        max_seq = grid.num_rows * page_size
        # expansion spec folds the first exchange split into the expansion
        # tasks themselves (admit_salted_fused); fr stays the fallback plan
        adm = admit_frontier_salted(fr, budget_per_round=budget_per_round,
                                    max_seq=max_seq, stats=stats,
                                    expansion=(grid, nd, page_size))
        grid_ref = _ray.put(grid.select(
            ["category", "keyword", "variation", "engine"]))
        return adm.map_batches(
            hydrate_frontier_batch,
            fn_kwargs={"grid_ref": grid_ref, "page_size": page_size},
            batch_format="pyarrow")
    nd = n_documents(sf_dir) * corpus_factor
    fr = frontier_dataset(config, nd, depth=depth, page_size=page_size)
    if seen_shards:
        fr = fr.map_batches(
            SeenAntiJoin,
            fn_constructor_kwargs={"shard_handles": seen_shards},
            batch_format="pyarrow",
            concurrency=(1, max(1, seen_concurrency)),
            num_cpus=0.5,
        )
    if politeness_shards is not None:
        from pixcrawler_ray.stages.politeness import streaming_admission
        fr = dedup_frontier(fr)
        fr = apply_robots(fr)
        return streaming_admission(fr, politeness_shards)
    if salted:
        # upper bound on seq from the (driver-sized) grid — avoids an
        # aggregate pass; any consistent bound yields a valid salt shift
        from pixcrawler_ray.stages.expand import work_unit_grid
        max_seq = work_unit_grid(config, depth=depth).num_rows * page_size
        return admit_frontier_salted(fr, budget_per_round=budget_per_round,
                                     max_seq=max_seq, stats=stats)
    if fused:
        return admit_frontier(fr, budget_per_round=budget_per_round)
    fr = dedup_frontier(fr)
    fr = apply_robots(fr)
    return assign_rounds(fr, budget_per_round=budget_per_round)


def crawl_generation(config: CrawlConfig, sf_dir: str, index_ref,
                     depth: int = 0, page_size: int = PAGE_SIZE,
                     budget_per_round: int = 8, seen_shards=None,
                     fetch_concurrency: int | None = None,
                     transient_frontier=None, materialize_fork: bool = False,
                     corpus_factor: int = 1, with_failed: bool = False):
    """One generation. Returns (extracted_ds, transient_frontier_ds), plus a
    ``failed`` quarantine Dataset (permanent statuses + invalid extracts, with
    audit ``reason``) when ``with_failed`` — the validator-quarantine analog
    (``validator/validation.py:129-149``).

    ``transient_frontier``: when given (generation > 0), it IS the frontier
    (re-queued 503 rows at depth+1) and no expansion happens.

    ``materialize_fork``: pin the fetched dataset in the object store before
    forking into the (extracted, transient) branches — otherwise BOTH
    consumers re-execute the whole expand+admit+fetch graph (Ray Data has no
    cross-consumer subexpression caching). The multi-generation driver sets
    this; single-branch callers keep pure streaming. At cluster scale the
    equivalent fork point is the checkpointed fetched parquet.
    """
    if transient_frontier is not None:
        fr = transient_frontier
    else:
        fr = build_frontier(config, sf_dir, depth=depth, page_size=page_size,
                            seen_shards=seen_shards,
                            budget_per_round=budget_per_round,
                            corpus_factor=corpus_factor)
    if callable(index_ref):
        fetched = index_ref(fr)          # custom fetcher (virtual / join)
    else:
        fetched = fetch_dataset(fr, index_ref, concurrency=fetch_concurrency)
    if materialize_fork:
        fetched = fetched.materialize()
    ok = fetched.map_batches(
        lambda t: t.filter(pc.equal(t.column("status"), STATUS_OK)),
        batch_format="pyarrow")
    transient = fetched.map_batches(
        lambda t: _requeue(t), batch_format="pyarrow")
    budgeted = keep_first_n(ok, ["keyword"], "seq", config.max_images)
    extracted_all = extracted_dataset(budgeted)
    extracted = extracted_all.map_batches(
        lambda t: t.filter(t.column("valid")), batch_format="pyarrow")
    extracted = keep_first_by(extracted, ["content_md5"], "seq")
    extracted = keep_first_by(extracted, ["phash"], "seq")
    if with_failed:
        failed = fetched.map_batches(_quarantine_permanent,
                                     batch_format="pyarrow")
        invalid = extracted_all.map_batches(_quarantine_invalid,
                                            batch_format="pyarrow")
        return extracted, transient, failed.union(invalid)
    return extracted, transient


QUARANTINE_COLS = ["url", "host", "category", "keyword", "seq", "doc_id",
                   "depth", "status"]

_REASON_BY_STATUS = {403: "robots_blocked", 404: "not_found",
                     415: "content_rejected", 422: "invalid_extract",
                     503: "retry_exhausted"}


def _with_reason(t: pa.Table) -> pa.Table:
    """Append the audit ``reason`` string derived from ``status``."""
    s = t.column("status").to_numpy()
    conds = [s == code for code in _REASON_BY_STATUS]
    reason = np.select(conds, list(_REASON_BY_STATUS.values()),
                       default="unknown")
    return t.append_column("reason", pa.array(reason.tolist(),
                                              type=pa.string()))


def _quarantine_permanent(t: pa.Table) -> pa.Table:
    """Fetched rows with a permanent failure status -> quarantine rows."""
    from pixcrawler_ray.stages.fetch import PERMANENT_STATUSES
    t = t.filter(pc.is_in(t.column("status"),
                          value_set=pa.array(PERMANENT_STATUSES,
                                             type=pa.int32())))
    return _with_reason(t.select(QUARANTINE_COLS))


def _quarantine_invalid(t: pa.Table) -> pa.Table:
    """Extracted rows failing the validity check -> quarantine rows (422)."""
    t = t.filter(pc.invert(t.column("valid")))
    t = t.drop_columns([c for c in t.column_names
                        if c not in QUARANTINE_COLS])
    t = t.set_column(t.schema.get_field_index("status"), "status",
                     pa.array(np.full(t.num_rows, 422, dtype=np.int32)))
    return _with_reason(t.select(QUARANTINE_COLS))


def _requeue(t: pa.Table) -> pa.Table:
    """503 rows -> next-generation frontier rows (depth+1, priority-1)."""
    t = t.filter(pc.equal(t.column("status"), STATUS_TRANSIENT))
    t = t.drop_columns([c for c in ("status", "warc_ts", "html")
                        if c in t.column_names])
    depth = pc.add(t.column("depth"), pa.scalar(1, pa.int32())).cast(pa.int32())
    prio = pc.subtract(t.column("priority"), pa.scalar(1, pa.int64()))
    t = t.set_column(t.schema.get_field_index("depth"), "depth", depth)
    return t.set_column(t.schema.get_field_index("priority"), "priority", prio)


def select_fetcher(sf_dir: str, corpus_factor: int = 1,
                   fetch_concurrency: int | None = None):
    """Pick the fetch implementation by corpus size/shape (round-1 scale
    finding #6). Returns either a broadcast index ref (small corpora) or a
    callable ``fr -> fetched_ds`` (virtual render / bucketed join).

    - amplified corpora are a pure function of the base documents table:
      fetch renders the page server-side from the broadcast BASE texts
      (O(base) memory) instead of materializing + broadcasting the factor-x
      corpus through the driver.
    - past ``BROADCAST_INDEX_MAX_BYTES`` (compressed size, metadata-only —
      conservative) the broadcast index no longer fits every node's object
      store and fetch becomes the bucketed doc-id shuffle join (same output
      schema — the 100 TB join shape).
    """
    if corpus_factor > 1:
        from pixcrawler_ray.stages.fetch import virtual_fetch_dataset
        return lambda fr: virtual_fetch_dataset(
            fr, sf_dir, concurrency=fetch_concurrency)
    if (os.path.getsize(f"{sf_dir}/documents.parquet")
            > BROADCAST_INDEX_MAX_BYTES):
        from pixcrawler_ray.stages.fetch import fetch_via_join
        pages_ds, _ = corpus.amplified_pages_dataset(sf_dir, 1)
        return lambda fr: fetch_via_join(fr, pages_ds)
    return pages_index_ref(sf_dir)


def run_crawl(config: CrawlConfig, sf_dir: str, page_size: int = PAGE_SIZE,
              budget_per_round: int = 8, max_generations: int | None = None,
              fetch_concurrency: int | None = None, seen_shards=None,
              corpus_factor: int = 1, with_failed: bool = False):
    """Full multi-generation crawl; returns the union of extracted datasets
    (plus the quarantine Dataset when ``with_failed``).

    Generations after the first re-fetch only the transient rows — the
    iterative retry dataflow (Retry.retry_download,
    ``builder/_generator.py:282-341``) with generation index == retry count.
    """
    gens = (config.max_retries if max_generations is None else max_generations)
    index_ref = select_fetcher(sf_dir, corpus_factor=corpus_factor,
                               fetch_concurrency=fetch_concurrency)
    res = crawl_generation(
        config, sf_dir, index_ref, depth=0, page_size=page_size,
        budget_per_round=budget_per_round, seen_shards=seen_shards,
        fetch_concurrency=fetch_concurrency, materialize_fork=True,
        corpus_factor=corpus_factor, with_failed=with_failed)
    extracted, transient = res[0], res[1]
    faileds = [res[2]] if with_failed else []
    outputs = [extracted]
    current = transient
    for _ in range(gens):
        # materialize the (small) retry frontier to decide termination
        current = current.materialize()
        if current.count() == 0:
            current = None
            break
        res = crawl_generation(
            config, sf_dir, index_ref, budget_per_round=budget_per_round,
            fetch_concurrency=fetch_concurrency,
            transient_frontier=current, materialize_fork=True,
            with_failed=with_failed)
        outputs.append(res[0])
        current = res[1]
        if with_failed:
            faileds.append(res[2])
    out = outputs[0]
    if len(outputs) > 1:
        for ds in outputs[1:]:
            out = out.union(ds)
        # cross-generation dedup: a retried row may duplicate a gen-0 row's
        # content even though urls are disjoint (url-dedup is global via seq).
        out = keep_first_by(out, ["content_md5"], "seq")
        out = keep_first_by(out, ["phash"], "seq")
        # budget is CUMULATIVE per keyword across generations (the reference's
        # shared counter spans retries, builder/_engine.py:580-644)
        out = keep_first_n(out, ["keyword"], "seq", config.max_images)
    if with_failed:
        failed = faileds[0]
        for ds in faileds[1:]:
            failed = failed.union(ds)
        if current is not None:
            # transients that never resolved within the retry budget
            exhausted = current.map_batches(
                lambda t: _with_reason(t.select(QUARANTINE_COLS[:-1])
                                       .append_column(
                    "status", pa.array(np.full(t.num_rows, 503,
                                               dtype=np.int32)))),
                batch_format="pyarrow")
            failed = failed.union(exhausted)
        return out, failed
    return out


def _shortfall(extracted_counts: dict[str, int], config: CrawlConfig) -> dict[str, int]:
    """Keywords still under budget (and by how much)."""
    out = {}
    for cat, kw in config.prepared_keywords():
        have = extracted_counts.get(kw, 0)
        if have < config.max_images:
            out[kw] = config.max_images - have
    return out


def run_crawl_with_retries(config: CrawlConfig, sf_dir: str,
                           page_size: int = PAGE_SIZE,
                           budget_per_round: int = 8,
                           corpus_factor: int = 1,
                           fetch_concurrency: int | None = None):
    """Full reference retry semantics (Retry.retry_download,
    ``builder/_generator.py:282-341`` + M3 alternative terms,
    ``builder/_keywords.py:293-697``).

    Round 0 is the normal crawl (with its transient re-queue generations).
    Rounds 1..max_retries expand ALTERNATIVE search terms for every keyword
    still under its ``max_images`` budget; new rows keep the ORIGINAL keyword
    for attribution (budget + dedup are cumulative per original keyword) and
    their ``seq`` is offset by ``round * SEQ_STRIDE`` so the reference's
    ordering — initial results first, retries in ascending retry index — is
    carried in data.

    Driver-side loop: each round's shortfall depends on the previous round's
    outcome (the iterative dataflow of SURVEY §7.5.7).
    """
    SEQ_STRIDE = 1 << 40
    from pixcrawler_ray.functions.variations import alternative_term

    base = run_crawl(config, sf_dir, page_size=page_size,
                     budget_per_round=budget_per_round,
                     corpus_factor=corpus_factor,
                     fetch_concurrency=fetch_concurrency).materialize()
    # retry rounds fetch exactly like run_crawl — virtual render for
    # amplified corpora, bucketed join past the broadcast cap (round-2
    # finding #1: the old pages_index_ref(corpus_factor) pinned the
    # factor-x corpus in driver RAM)
    index_ref = select_fetcher(sf_dir, corpus_factor=corpus_factor,
                               fetch_concurrency=fetch_concurrency)
    kw_cat = {kw: cat for cat, kw in config.prepared_keywords()}
    outputs = [base]

    def counts_of(ds) -> dict[str, int]:
        # distributed per-keyword count; result is one small row per keyword
        t = ds.select_columns(["keyword"]).groupby("keyword").count() \
            .to_pandas()
        if "keyword" not in t.columns:   # empty round -> schemaless frame
            return {}
        return dict(zip(t["keyword"], t["count()"].astype(int)))

    counts = counts_of(base)
    for retry in range(1, config.max_retries + 1):
        need = _shortfall(counts, config)
        if not need:
            break
        # alternative-term expansion for the under-budget keywords only
        alt_map = {alternative_term(kw, retry): kw for kw in need}
        retry_cfg = CrawlConfig(
            dataset_name=config.dataset_name,
            categories={}, max_images=config.max_images,
            max_retries=config.max_retries)
        cats: dict[str, list[str]] = {}
        for alt, orig in alt_map.items():
            cats.setdefault(kw_cat[orig], []).append(alt)
        retry_cfg.categories = cats
        fr = build_frontier(retry_cfg, sf_dir, depth=retry,
                            page_size=page_size,
                            budget_per_round=budget_per_round,
                            corpus_factor=corpus_factor)

        _alt_keys = pa.array(list(alt_map.keys()), type=pa.string())
        _alt_vals = pa.array(list(alt_map.values()), type=pa.string())

        def reattribute(t: pa.Table, r=retry) -> pa.Table:
            # dict-encoded remap: index_in + take, null -> keep original
            idx = pc.index_in(t.column("keyword"), _alt_keys)
            kws = pc.coalesce(pc.take(_alt_vals, idx), t.column("keyword"))
            seq = pc.add(t.column("seq"),
                         pa.scalar(r * SEQ_STRIDE, pa.int64()))
            t = t.set_column(t.schema.get_field_index("keyword"), "keyword",
                             pc.cast(kws, pa.string()))
            return t.set_column(t.schema.get_field_index("seq"), "seq", seq)

        fr = fr.map_batches(reattribute, batch_format="pyarrow")
        if callable(index_ref):
            fetched = index_ref(fr)      # virtual / join fetcher
        else:
            fetched = fetch_dataset(fr, index_ref,
                                    concurrency=fetch_concurrency)
        ok = fetched.map_batches(
            lambda t: t.filter(pc.equal(t.column("status"), STATUS_OK)),
            batch_format="pyarrow")
        ex = extracted_dataset(ok)
        ex = ex.map_batches(lambda t: t.filter(t.column("valid")),
                            batch_format="pyarrow")
        # INCREMENTAL cumulative dedup + budget (round-1 finding #8: the old
        # path re-unioned and re-shuffled ALL survivors every round —
        # O(rounds × full shuffle)). Equivalent because survivors are
        # dedup-closed and always sort before retry rows (seq offsets grow
        # with round): keep-first over (S ∪ E) = S ∪ (E deduped within
        # itself, anti-joined against S's keys, capped at each keyword's
        # REMAINING budget). Only the new rows shuffle.
        ex = keep_first_by(ex, ["content_md5"], "seq")
        ex = keep_first_by(ex, ["phash"], "seq")
        # cumulative anti-join against every prior round's dedup keys —
        # dataset-native (no iter_batches-into-set driver loop; VERDICT r4
        # #6): the survivor key columns stay distributed and the retry rows
        # drop via two keyed anti shuffles (md5 OR phash seen => drop).
        # Survivor sets are post-budget (keywords × max_images) so the
        # exchanges are small; the primitive itself holds at any scale.
        prev_keys = outputs[0].select_columns(["content_md5", "phash"])
        for prev in outputs[1:]:
            prev_keys = prev_keys.union(
                prev.select_columns(["content_md5", "phash"]))
        from pixcrawler_ray.stages.shuffle import anti_by_key
        ex = anti_by_key(ex, prev_keys.select_columns(["content_md5"]),
                         "content_md5", num_buckets=8)
        ex = anti_by_key(ex, prev_keys.select_columns(["phash"]),
                         "phash", num_buckets=8)
        ex = keep_first_caps(ex, "keyword", "seq", dict(need)).materialize()
        outputs.append(ex)
        for kw, c in counts_of(ex).items():
            counts[kw] = counts.get(kw, 0) + c
    merged = outputs[0]
    for ds in outputs[1:]:
        merged = merged.union(ds)
    return merged
