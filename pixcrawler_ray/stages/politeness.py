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
                  num_buckets: int = 64):
    """Append ``host_rank`` and ``round`` columns.

    host_rank = ROW_NUMBER() OVER (PARTITION BY host
                                   ORDER BY priority DESC, seq ASC) - 1
    round     = host_rank // budget_per_round
    """

    def kernel(df: pd.DataFrame):
        s = df.sort_values(["priority", "seq"], ascending=[False, True],
                           kind="mergesort")
        ranks = s.groupby("host", sort=False).cumcount().to_numpy()
        return s.index.to_numpy(), {
            "host_rank": ranks.astype(np.int64),
            "round": (ranks // budget_per_round).astype(np.int64),
        }

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
    from pixcrawler_ray.stages.shuffle import per_bucket_take

    if max_seq is None:
        import ray.data.aggregate as agg
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
    parts = frontier_ds.map_batches(partial_counts, batch_format="pyarrow")
    counts = pa.concat_tables(
        [t for t in _ray.get(parts.to_arrow_refs()) if t.num_rows],
        promote_options="default").to_pandas()
    counts = (counts.groupby(["host_id", "priority", "salt"], sort=False)
              ["n"].sum().reset_index())
    # prefix offsets in per-host admission order: (priority DESC, salt ASC)
    counts = counts.sort_values(["host_id", "priority", "salt"],
                                ascending=[True, False, True],
                                kind="mergesort")
    counts["offset"] = (counts.groupby("host_id", sort=False)["n"]
                        .cumsum() - counts["n"])
    offsets = counts[["host_id", "priority", "salt", "offset"]]

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
            max(stats["bucket_rows_unsalted"].values()))
        stats["max_bucket_salted"] = int(
            max(stats["bucket_rows_salted"].values()))
        stats["num_salts"] = num_salts
        stats["seq_shift"] = shift

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

    def add_salt(t: pa.Table) -> pa.Table:
        s = t.column("seq").to_numpy() >> shift
        return t.append_column("salt", pa.array(s, type=pa.int64()))

    salted = frontier_ds.map_batches(add_salt, batch_format="pyarrow")
    out = per_bucket_take(salted, ["host_id", "priority", "salt"],
                          ["host_id", "priority", "salt", "seq"], kernel,
                          num_buckets=num_buckets)
    return out.map_batches(lambda t: t.drop_columns(["salt"]),
                           batch_format="pyarrow")


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
    """Streaming token-bucket scheduler for one host-hash shard.

    Holds per-host virtual-time token buckets and the robots verdict cache.
    ``admit(hosts, priorities, seqs)`` returns the round number assigned to
    each URL — same schedule as :func:`assign_rounds` when fed in seq order
    per host (the streaming executor feeds a host's rows through one shard,
    guaranteed by the host-hash shuffle upstream).
    """

    def __init__(self, budget_per_round: int = DEFAULT_BUDGET_PER_ROUND):
        self.budget = budget_per_round
        self.admitted: dict[str, int] = {}
        self.robots_cache: dict[str, bool] = {}

    def admit(self, hosts: list[str]) -> np.ndarray:
        out = np.empty(len(hosts), dtype=np.int64)
        for i, h in enumerate(hosts):
            k = self.admitted.get(h, 0)
            out[i] = k // self.budget
            self.admitted[h] = k + 1
        return out

    def stats(self) -> dict:
        if not self.admitted:
            return {"hosts": 0, "max_admitted": 0, "total": 0}
        vals = list(self.admitted.values())
        return {"hosts": len(vals), "max_admitted": max(vals),
                "total": sum(vals)}
