"""Per-host politeness + priority scheduling in deterministic virtual time.

Reference politeness is wall-clock sleeps and Celery rate limits: 0.2 s
between downloads (``builder/_search_engines.py:99, 248-249``), 0.5 s between
variations/keywords (``builder/_downloader.py:60``,
``builder/_generator.py:1280``), ``rate_limit="10/m"`` per engine task
(``builder/tasks.py:178``) and queue priority 0-9
(``celery_core/config.py:281-294``). Wall-clock sleeps are not reproducible
and must not throttle a benchmark, so politeness is re-specified as a
VIRTUAL-TIME budget (SURVEY §7.5.4): each host may admit at most
``budget_per_round`` URLs per scheduling round, and within a host URLs are
admitted by ``(priority DESC, seq ASC)``. The admission schedule
``(round, host, host_rank)`` is a pure function of the frontier — tests and
the DuckDB oracle replay it with a window function.

Implementation is the host-hash keyed shuffle the north rule mandates:
``bucket = hash(host) % B`` -> per-bucket vectorized rank kernel. Hot-host
skew: h0 holds ~1/3 of the corpus by construction; ranking cost within a
bucket is O(n log n) vectorized, and the hot host is isolated in its own
bucket by the same hash (documented skew split: a bucket count histogram is
emitted in metrics; see ``pipelines/crawl.py``).

:class:`PolitenessShard` is the streaming-mode stateful variant — a token
bucket per host in virtual rounds, holding the robots cache, for the
actor-pool scheduler path (north-star architecture); the batch path above is
what the correctness gate replays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from pixcrawler_ray.stages.shuffle import per_bucket_take

DEFAULT_BUDGET_PER_ROUND = 8


def assign_rounds(frontier_ds, budget_per_round: int = DEFAULT_BUDGET_PER_ROUND,
                  num_buckets: int = 64, respect_crawl_delay: bool = False,
                  emit_delay_round: bool = False):
    """Append ``host_rank`` and ``round`` columns.

    host_rank = ROW_NUMBER() OVER (PARTITION BY host
                                   ORDER BY priority DESC, seq ASC) - 1
    round     = host_rank // budget_per_round

    With ``respect_crawl_delay=True`` each host's per-round budget shrinks
    by its parsed robots Crawl-delay (``stages.robots.crawl_delay_for``):
    effective budget = max(1, budget_per_round // delay) — a delay-3 host
    admits a third as many URLs per virtual round. Off by default so the
    baseline schedule (and its oracles) is unchanged.

    ``emit_delay_round=True`` additionally emits the delay-aware round as a
    ``round_delay`` column next to the plain ``round`` — both schedules from
    ONE rank pass and one shuffle (the registry's merged schedule query).
    """

    def kernel(df: pd.DataFrame):
        s = df.sort_values(["priority", "seq"], ascending=[False, True],
                           kind="mergesort")
        ranks = s.groupby("host", sort=False).cumcount().to_numpy()
        if respect_crawl_delay or emit_delay_round:
            from pixcrawler_ray.stages.robots import crawl_delay_for
            # non-synthetic hosts (no h<N>. prefix) get delay 1, mirroring
            # PolitenessShard._host_budget — the batch and streaming paths
            # share one fallback rule (ADVICE r3)
            ext = s["host"].str.extract(r"h(\d+)\.", expand=False)
            matched = ext.notna().to_numpy()
            hid = ext.fillna("0").astype(np.int64).to_numpy()
            delay = np.where(matched, crawl_delay_for(hid), 1)
            eff_delay = np.maximum(budget_per_round // delay, 1)
        eff = eff_delay if respect_crawl_delay else budget_per_round
        cols = {
            "host_rank": ranks.astype(np.int64),
            "round": (ranks // eff).astype(np.int64),
        }
        if emit_delay_round:
            cols["round_delay"] = (ranks // eff_delay).astype(np.int64)
        return s.index.to_numpy(), cols

    return per_bucket_take(frontier_ds, ["host"], ["host", "priority", "seq"],
                           kernel, num_buckets=num_buckets)


def assign_rounds_salted(frontier_ds, budget_per_round: int = DEFAULT_BUDGET_PER_ROUND,
                         num_buckets: int = 64, num_salts: int = 16,
                         max_seq: int | None = None,
                         stats: dict | None = None):
    """Hot-host-safe ranking: identical (host_rank, round) to
    :func:`assign_rounds` computed WITHOUT any single host landing in one
    bucket kernel (SURVEY §4 skew split; h0 holds ~1/3 of the corpus).

    Split key is ``(host_id, priority, salt)`` with ``salt = seq >> shift`` —
    RANGE-based in the per-host sort order, because within a host rows order
    by (priority DESC, seq ASC) and salt is monotone in seq: every split
    group is a CONTIGUOUS run of the host's admission order, so global ranks
    are ``per-group local rank + a prefix offset``.

    Two passes over the frontier:
      1. count rows per (host_id, priority, salt) — per-batch partial
        aggregation; only tiny count rows reach the driver, which prefix-sums
        them into offsets (broadcast to the rank kernels);
      2. shuffle on the 3-int split key (the hot host now spreads over
        |priorities| x |salts| buckets) and rank locally by seq.

    ``stats`` (optional dict) receives the admission histogram the docstring
    above promises: rows per shuffle bucket with and without salting.
    """
    import pandas as pd

    from pixcrawler_ray.functions.hashing import fnv1a64_ints
    from pixcrawler_ray.stages.shuffle import (
        _add_bucket,
        _hash_shuffle_on,
        _partition_by_bucket,
        BUCKET_COL,
        per_bucket_take,
    )

    if max_seq is None:
        import ray.data.aggregate as agg
        frontier_ds = frontier_ds.materialize()
        max_seq = int(frontier_ds.aggregate(agg.Max("seq"))["max(seq)"])
    shift = max(0, int(max_seq).bit_length() - int(num_salts - 1).bit_length())

    def partial_counts(t: pa.Table) -> pa.Table:
        h = t.column("host_id").to_numpy()
        p = t.column("priority").to_numpy()
        s = t.column("seq").to_numpy() >> shift
        df = pd.DataFrame({"host_id": h, "priority": p, "salt": s})
        g = (df.groupby(["host_id", "priority", "salt"], sort=False)
               .size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    import ray as _ray

    def add_salt(t: pa.Table) -> pa.Table:
        s = t.column("seq").to_numpy() >> shift
        return t.append_column("salt", pa.array(s, type=pa.int64()))

    key_cols = ["host_id", "priority", "salt"]
    parts_ds = None
    if _hash_shuffle_on():
        # ONE pass: the group counts ride along as a side aggregation of the
        # rank exchange's split tasks — no separate counts pass, no
        # materialize barrier between counting and shuffling.
        salted = frontier_ds.map_batches(add_salt, batch_format="pyarrow")
        stamped = _add_bucket(salted, key_cols, num_buckets)
        parts_ds, agg_refs = _partition_by_bucket(
            stamped, num_buckets, side_agg=partial_counts, fuse_slices=8)
        agg_tables = [t for t in _ray.get(agg_refs)
                      if t is not None and t.num_rows]
        if agg_tables:
            counts = pa.concat_tables(
                agg_tables, promote_options="default").to_pandas()
        else:
            counts = pd.DataFrame({"host_id": [], "priority": [],
                                   "salt": [], "n": []})
    else:
        parts = frontier_ds.map_batches(partial_counts,
                                        batch_format="pyarrow")
        counts = pa.concat_tables(
            [t for t in _ray.get(parts.to_arrow_refs()) if t.num_rows],
            promote_options="default").to_pandas()
    offsets = _count_offsets(counts, stats, num_buckets, num_salts, shift)

    def kernel(df: pd.DataFrame):
        s = df.sort_values(["host_id", "priority", "salt", "seq"],
                           ascending=[True, False, True, True],
                           kind="mergesort")
        local = s.groupby(["host_id", "priority", "salt"],
                          sort=False).cumcount().to_numpy()
        m = s.merge(offsets, on=["host_id", "priority", "salt"], how="left")
        ranks = m["offset"].to_numpy() + local
        return s.index.to_numpy(), {
            "host_rank": ranks.astype(np.int64),
            "round": (ranks // budget_per_round).astype(np.int64),
        }

    if parts_ds is not None:
        # the exchange already ran (side-agg path): apply the rank kernel to
        # the bucket-complete partitions directly
        helpers = ["host_id", "priority", "salt", "seq"]

        def run(g: pa.Table) -> pa.Table:
            if isinstance(g, pd.DataFrame):     # empty passthrough block
                g = pa.Table.from_pandas(g, preserve_index=False)
            if BUCKET_COL not in g.column_names:
                return g
            proj = g.select(helpers).to_pandas()
            keep, extra = kernel(proj)
            out = g.take(pa.array(np.asarray(keep, dtype=np.int64)))
            for name, values in extra.items():
                out = out.append_column(name, pa.array(values))
            return out.drop_columns([BUCKET_COL, "salt"])

        return parts_ds.map_batches(run, batch_format="pyarrow",
                                    batch_size=None)
    salted = frontier_ds.map_batches(add_salt, batch_format="pyarrow")
    out = per_bucket_take(salted, ["host_id", "priority", "salt"],
                          ["host_id", "priority", "salt", "seq"], kernel,
                          num_buckets=num_buckets, fuse_slices=8)
    return out.map_batches(lambda t: t.drop_columns(["salt"]),
                           batch_format="pyarrow")


def _count_offsets(counts: pd.DataFrame, stats: dict | None,
                   num_buckets: int, num_salts: int,
                   shift: int) -> pd.DataFrame:
    """(host_id, priority, salt) group counts -> per-group global rank
    offsets in per-host admission order; also fills the ``stats`` histogram
    (shared by the fused and two-exchange admission paths)."""
    from pixcrawler_ray.functions.hashing import fnv1a64_ints

    counts = (counts.groupby(["host_id", "priority", "salt"], sort=False)
              ["n"].sum().reset_index())
    counts = counts.sort_values(["host_id", "priority", "salt"],
                                ascending=[True, False, True],
                                kind="mergesort")
    counts["offset"] = (counts.groupby("host_id", sort=False)["n"]
                        .cumsum() - counts["n"])
    if stats is not None:
        h_unsalted = fnv1a64_ints(
            counts["host_id"].to_numpy().astype(np.uint64))
        key = counts["host_id"].to_numpy().astype(np.uint64)
        for extra in ("priority", "salt"):
            key = fnv1a64_ints(
                counts[extra].to_numpy().astype(np.uint64) ^ key)
        df_h = pd.DataFrame({
            "b_unsalted": h_unsalted % num_buckets,
            "b_salted": key % num_buckets,
            "n": counts["n"].to_numpy()})
        stats["bucket_rows_unsalted"] = (
            df_h.groupby("b_unsalted")["n"].sum().to_dict())
        stats["bucket_rows_salted"] = (
            df_h.groupby("b_salted")["n"].sum().to_dict())
        stats["max_bucket_unsalted"] = int(
            max(stats["bucket_rows_unsalted"].values()) if len(df_h) else 0)
        stats["max_bucket_salted"] = int(
            max(stats["bucket_rows_salted"].values()) if len(df_h) else 0)
        stats["num_salts"] = num_salts
        stats["seq_shift"] = shift
    return counts[["host_id", "priority", "salt", "offset"]]


def admit_salted_fused(frontier_ds, dedup_kernel,
                       budget_per_round: int = DEFAULT_BUDGET_PER_ROUND,
                       num_buckets: int = 64, num_salts: int = 16,
                       max_seq: int | None = None,
                       stats: dict | None = None,
                       expansion: tuple | None = None):
    """Fused two-hop admission exchange: split(doc-hash) → ONE mid task per
    partition doing fuse + dedup/robots kernel + salt + re-split(host-hash)
    → fuse + rank. Row-identical to ``per_bucket_take(dedup)`` followed by
    :func:`assign_rounds_salted`, but the intermediate admitted set never
    round-trips through the object store as a Dataset: 3 object-store passes
    instead of 6, no inter-exchange barrier. Group counts ride the mid tasks
    (side aggregation) exactly as in the unfused path.

    ``expansion=(grid, n_docs, page_size)`` folds the FIRST split into the
    expansion itself (VERDICT r4 #4): each producer task expands a grid
    slice, stamps doc-hash buckets, and emits the p split slices directly —
    no 20M-row materialize barrier before the exchange and one task wave
    fewer; ``frontier_ds`` is then only the fallback plan. Row-identical
    (pytest: test_lean_folded_admission_equals_unfolded).

    Returns None when inapplicable (hash-shuffle off, unknown max_seq, or
    object-count cap exceeded) — the caller falls back to the two-exchange
    path.
    """
    import math as _math
    import os as _os

    import ray as _ray
    import ray.data as rd

    from pixcrawler_ray.functions.hashing import fnv1a64_ints
    from pixcrawler_ray.stages.shuffle import (
        BUCKET_COL,
        _add_bucket,
        _exchange_fuse,
        _exchange_split,
        _EXCHANGE_MAX_OBJECTS,
        _hash_shuffle_on,
        _nonempty_block_refs,
    )

    if max_seq is None or not _hash_shuffle_on():
        return None
    shift = max(0, int(max_seq).bit_length()
                - int(num_salts - 1).bit_length())
    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    ppc = int(_os.environ.get("GRAFT_EXCHANGE_PARTS_PER_CPU", "2"))
    rpp = int(_os.environ.get("GRAFT_EXCHANGE_ROWS_PER_PART", "4096"))
    blocks = None
    if expansion is not None and int(_os.environ.get(
            "GRAFT_FOLD_EXPANSION_SPLIT", "1")):
        # folded producer wave: row count is known EXACTLY from the grid
        # (each unit emits page_size rows) — no materialize, no metadata scan
        grid, n_docs, page_size = expansion
        if grid.num_rows == 0:
            # empty grid: the producer-slice math below degenerates (zero
            # srefs -> _exchange_fuse on no parts raises) — fall back
            return None
        total_rows = grid.num_rows * page_size
        n_src = max(1, min(_math.ceil(total_rows / 32768), 512,
                           grid.num_rows))
    else:
        expansion = None
        stamped = _add_bucket(frontier_ds, ["doc_id"], num_buckets)
        blocks, total_rows = _nonempty_block_refs(stamped)
        if not blocks:
            return None
        n_src = len(blocks)
    # same size caps as _partition_by_bucket: tiny frontiers must not pay a
    # 64-partition exchange's task overhead
    rows_cap = (num_buckets if total_rows is None
                else max(1, -(-total_rows // rpp)))
    p = max(2, min(num_buckets, cpus * ppc, 2 * n_src, rows_cap))
    if n_src * p > _EXCHANGE_MAX_OBJECTS:
        return None

    def mid_fn(*parts):
        t = _exchange_fuse(*parts)
        if t.num_rows == 0 or BUCKET_COL not in t.column_names:
            empty = t.slice(0, 0)
            return tuple([empty] * p) + (None,)
        proj = t.select(["doc_id", "host_id", "seq"]).to_pandas()
        keep = dedup_kernel(proj)
        t = t.take(pa.array(np.asarray(keep, dtype=np.int64)))
        salt = (t.column("seq").to_numpy() >> shift).astype(np.int64)
        t = t.drop_columns([BUCKET_COL]).append_column(
            "salt", pa.array(salt, type=pa.int64()))
        h = t.column("host_id").to_numpy().astype(np.uint64)
        for arr in (t.column("priority").to_numpy().astype(np.uint64),
                    salt.astype(np.uint64)):
            h = fnv1a64_ints(arr ^ h)
        b2 = (h % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column(BUCKET_COL, pa.array(b2, type=pa.int64()))
        g = (pd.DataFrame({"host_id": t.column("host_id").to_numpy(),
                           "priority": t.column("priority").to_numpy(),
                           "salt": salt})
             .groupby(["host_id", "priority", "salt"], sort=False)
             .size().reset_index(name="n"))
        return _exchange_split(t, p) \
            + (pa.Table.from_pandas(g, preserve_index=False),)

    if expansion is not None:
        from pixcrawler_ray.stages.expand import expand_split_task
        grid, n_docs, page_size = expansion
        cuts = np.linspace(0, grid.num_rows, n_src + 1).astype(int)
        prod = _ray.remote(num_returns=p)(expand_split_task)
        srefs = [prod.remote(grid.slice(int(a), int(b - a)), n_docs,
                             page_size, num_buckets, p)
                 for a, b in zip(cuts[:-1], cuts[1:]) if b > a]
    else:
        split = _ray.remote(num_returns=p)(_exchange_split)
        srefs = [split.remote(b, p) for b in blocks]
    if p == 1:
        srefs = [[r] for r in srefs]
    mid = _ray.remote(num_returns=p + 1)(mid_fn)
    midres = [mid.remote(*[s[i] for s in srefs]) for i in range(p)]
    count_refs = [m[p] for m in midres]
    agg_tables = [t for t in _ray.get(count_refs)
                  if t is not None and t.num_rows]
    if agg_tables:
        counts = pa.concat_tables(
            agg_tables, promote_options="default").to_pandas()
    else:
        counts = pd.DataFrame({"host_id": [], "priority": [], "salt": [],
                               "n": []})
    offsets = _count_offsets(counts, stats, num_buckets, num_salts, shift)
    offsets_ref = _ray.put(offsets)

    k = max(1, min(int(_os.environ.get("GRAFT_EXCHANGE_FUSE_SLICES", "8")),
                   8))

    def rank_fn(offs, *parts):
        t = _exchange_fuse(*parts)
        empty_pad = None
        if BUCKET_COL in t.column_names:
            proj = t.select(["host_id", "priority", "salt",
                             "seq"]).to_pandas()
            s = proj.sort_values(["host_id", "priority", "salt", "seq"],
                                 ascending=[True, False, True, True],
                                 kind="mergesort")
            local = s.groupby(["host_id", "priority", "salt"],
                              sort=False).cumcount().to_numpy()
            m = s.merge(offs, on=["host_id", "priority", "salt"],
                        how="left")
            ranks = (m["offset"].to_numpy() + local).astype(np.int64)
            t = t.take(pa.array(s.index.to_numpy().astype(np.int64)))
            t = t.append_column("host_rank", pa.array(ranks))
            t = t.append_column("round",
                                pa.array(ranks // budget_per_round))
            t = t.drop_columns([BUCKET_COL, "salt"])
        if k == 1:
            return t
        n = t.num_rows
        cuts = [int(i * n / k) for i in range(k + 1)]
        out = [t.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(k)]
        return tuple(out)

    fuse = _ray.remote(num_returns=k)(rank_fn) if k > 1 \
        else _ray.remote(rank_fn)
    orefs = []
    for i in range(p):
        r = fuse.remote(offsets_ref, *[m[i] for m in midres])
        orefs.extend(r if k > 1 else [r])
    return rd.from_arrow_refs(orefs)


def admission_order_key(table: pa.Table) -> np.ndarray:
    """Global admission order = sort by (round, host, host_rank)."""
    import pyarrow.compute as pc
    idx = pc.sort_indices(
        table,
        sort_keys=[("round", "ascending"), ("host", "ascending"),
                   ("host_rank", "ascending")],
    )
    return idx.to_numpy()


@ray.remote(num_cpus=0.25)
class PolitenessShard:
    """Streaming token-bucket scheduler for one host-hash shard — the
    CLUSTER-STREAMING mode, reachable via ``build_frontier(...,
    politeness_shards=make_politeness_shards(...))`` /
    :func:`streaming_admission`; the batch gate below stays the default.

    The batch pipelines schedule with :func:`assign_rounds` /
    ``admit_salted_fused`` (one bounded host-keyed exchange per generation —
    strictly cheaper when the generation's frontier is already materialized
    as a Dataset). This actor is the shape a CONTINUOUS crawler needs — an
    unbounded url stream where rounds must be assigned as rows arrive, with
    no generation barrier to exchange over. Equivalence with the batch rule
    at budget boundaries is pytest-asserted (tests/test_stages.py
    ``test_politeness_shard_actor_matches_batch_rule``): fed per-host rows in seq
    order (guaranteed by a host-hash shuffle upstream), ``admit`` reproduces
    the exact :func:`assign_rounds` schedule.

    Holds per-host virtual-time admission counters and the robots verdict
    cache; ``admit(hosts)`` returns each URL's round number.
    """

    def __init__(self, budget_per_round: int = DEFAULT_BUDGET_PER_ROUND,
                 respect_crawl_delay: bool = False):
        self.budget = budget_per_round
        self.respect_crawl_delay = respect_crawl_delay
        self.admitted: dict[str, int] = {}
        self.robots_cache: dict[str, bool] = {}
        self._budget_cache: dict[str, int] = {}

    def _host_budget(self, h: str) -> int:
        """Effective per-round budget — shrunk by the parsed robots
        Crawl-delay when enabled, mirroring assign_rounds(respect_crawl_
        delay=True). Cached per host (a real crawler caches the robots
        fetch the same way)."""
        if not self.respect_crawl_delay:
            return self.budget
        b = self._budget_cache.get(h)
        if b is None:
            import re

            import numpy as np_

            from pixcrawler_ray.stages.robots import crawl_delay_for
            m = re.match(r"h(\d+)\.", h)
            delay = int(crawl_delay_for(
                np_.array([int(m.group(1))]))[0]) if m else 1
            b = max(self.budget // delay, 1)
            self._budget_cache[h] = b
        return b

    def admit(self, hosts: list[str]) -> np.ndarray:
        out = np.empty(len(hosts), dtype=np.int64)
        for i, h in enumerate(hosts):
            k = self.admitted.get(h, 0)
            out[i] = k // self._host_budget(h)
            self.admitted[h] = k + 1
        return out

    def stats(self) -> dict:
        if not self.admitted:
            return {"hosts": 0, "max_admitted": 0, "total": 0}
        vals = list(self.admitted.values())
        return {"hosts": len(vals), "max_admitted": max(vals),
                "total": sum(vals)}

    def state(self) -> tuple[list[str], list[int]]:
        """Portable counter state (hosts, admitted-counts) — the robots /
        budget caches are derived and rebuilt lazily after a restore."""
        return list(self.admitted.keys()), list(self.admitted.values())

    def load_state(self, hosts: list[str], counts: list[int]) -> int:
        """Restore counters exported by :meth:`state` (additive: counts
        for hosts already present are summed, so replaying two partial
        snapshots composes)."""
        for h, c in zip(hosts, counts):
            self.admitted[h] = self.admitted.get(h, 0) + int(c)
        return len(self.admitted)


def make_politeness_shards(n_shards: int = 4,
                           budget_per_round: int = DEFAULT_BUDGET_PER_ROUND,
                           respect_crawl_delay: bool = False):
    """Spawn the host-hash-sharded streaming schedulers (kill after use)."""
    return [PolitenessShard.remote(budget_per_round=budget_per_round,
                                   respect_crawl_delay=respect_crawl_delay)
            for _ in range(n_shards)]


def streaming_admission(frontier_ds, shards, num_buckets: int = 64):
    """STREAMING-mode politeness gate: rounds assigned by the stateful
    :class:`PolitenessShard` actors instead of the batch rank exchange.

    Same host-keyed exchange as :func:`assign_rounds` guarantees each host's
    rows reach exactly ONE kernel task (so the per-host admit stream is
    ordered); inside the kernel rows are sorted (priority DESC, seq ASC) —
    the batch rule's order — and each host routes to ``shards[hash64(host)
    % n]``. Actor calls from different tasks serialize per shard, and no two
    tasks share a host, so per-host ordering is total.

    Equivalent to :func:`assign_rounds` for a single generation
    (pytest-asserted); DIFFERENT across generations by design — the shard
    counters persist, so a later generation's rows continue in later rounds
    (the continuous-crawl semantic the batch rule cannot express without
    re-ranking the full history). ``host_rank`` stays generation-local.
    """
    import ray as _ray

    from pixcrawler_ray.functions.hashing import hash64
    from pixcrawler_ray.stages.shuffle import per_bucket

    handles = list(shards)
    n = len(handles)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(host_rank=np.array([], dtype=np.int64),
                             round=np.array([], dtype=np.int64))
        s = df.sort_values(["priority", "seq"], ascending=[False, True],
                           kind="mergesort")
        hosts = s["host"].to_numpy()
        uniq = pd.unique(hosts)
        shard_of = {h: hash64(h) % n for h in uniq}
        sid = np.fromiter((shard_of[h] for h in hosts), dtype=np.int64,
                          count=len(hosts))
        rounds = np.empty(len(hosts), dtype=np.int64)
        pending = []
        for k in range(n):
            mask = sid == k
            if mask.any():
                pending.append(
                    (mask, handles[k].admit.remote(list(hosts[mask]))))
        for mask, ref in pending:
            rounds[mask] = _ray.get(ref)
        s = s.assign(
            host_rank=s.groupby("host", sort=False).cumcount()
                       .to_numpy().astype(np.int64),
            round=rounds)
        return s

    return per_bucket(frontier_ds, ["host"], kernel,
                      num_buckets=num_buckets)
