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
