"""Benchmark harness — one JSON line on stdout.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)``.

``--scaling``: runs the same bench twice in FRESH processes at num_cpus=8 and
num_cpus=32 (the sandbox stand-in for N vs 4N nodes) and reports both
throughputs plus scaling efficiency (>= 0.8 target per BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def consume(result) -> int:
    """Execute a lazy result; return row count without driver materialization."""
    import pandas as pd
    if isinstance(result, pd.DataFrame):
        return len(result)
    if hasattr(result, "iter_batches"):          # ray Dataset — stream it
        n = 0
        for b in result.iter_batches(batch_size=16384, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if hasattr(result, "num_rows"):
        return result.num_rows
    return len(result)


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pixcrawler_ray.pipelines import crawl, crawl_queries as cq
    from pixcrawler_ray.pipelines import relational as rel
    from pixcrawler_ray.stages import dedup as dd
    from pixcrawler_ray.stages import simsearch as ss
    from pixcrawler_ray.stages import textstats as ts

    # warm the OS page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq
    for t in ("documents", "lineitem", "orders", "events", "embeddings"):
        pq.read_table(f"{sf_dir}/{t}.parquet")

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def bench(name: str, fn):
        t0 = time.perf_counter()
        counts[name] = consume(fn())
        timings[name] = round(time.perf_counter() - t0, 3)

    bench("crawl_e2e", lambda: crawl.run_crawl(
        cq.seeds_config(sf_dir), sf_dir, budget_per_round=8,
        fetch_concurrency=max(2, num_cpus // 4)))
    bench("extract_all_pages", lambda: cq.q_extract_all_pages(sf_dir))
    bench("dedup_exact", lambda: dd.dedup_exact(sf_dir))
    bench("dedup_minhash_pairs",
          lambda: dd.minhash_candidate_pairs(sf_dir))
    bench("token_counts", lambda: ts.token_counts(sf_dir))
    bench("q1_pricing_summary", lambda: rel.q1_pricing_summary(sf_dir))
    bench("events_sessionize", lambda: rel.q_events_sessionize(sf_dir))
    bench("simsearch_topk",
          lambda: ss.topk_bruteforce(sf_dir, [0, 1, 2], k=10))

    total = round(sum(timings.values()), 3)
    n_pages = counts.get("extract_all_pages", 0)
    extract_rows_per_s = (round(n_pages / timings["extract_all_pages"], 1)
                          if timings.get("extract_all_pages") else 0.0)
    out = {
        "metric": "headline pipeline wall time (crawl+extract+dedup+text+ann)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": counts,
        "extract_rows_per_s": extract_rows_per_s,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str) -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    # throughput scaling efficiency: thr = work/t; eff = (thr_hi/thr_lo)/(hi/lo)
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (num_cpus 8 -> 32, fresh processes)",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "scaling_efficiency": round(eff, 3),
        "sf": sf_dir,
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        print(json.dumps(run_bench(sf_dir, ncpu)))
