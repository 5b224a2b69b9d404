"""Iterative graph propagation over a deterministic link graph — the
PageRank computational shape (Page et al. 1999) expressed as repeated
map_batches explosion + keyed aggregation rounds.

The reference has no graph stage; a web-scale crawler needs one (link-graph
authority feeds frontier priority). The corpus pages carry no inter-host
links, so the graph is synthesized deterministically from doc_id arithmetic
(k=3 out-links per node, replayable in SQL), and the propagation uses
INTEGER mass — each node ships floor(mass/k) along each edge and keeps the
remainder — so every round is order-insensitive integer summation and the
whole fixed-point prefix is value-hash oracleable (float PageRank sums are
accumulation-order-sensitive; integer mass is not).

Distributed shape per round: one stateless ``map_batches`` explodes each
(node, mass) row into k send rows + 1 keep row (edges are ARITHMETIC, never
materialized as a table), then ONE hash-bucketed groupby-sum re-keys mass
by node. rounds are chained lazily here; a 100 TB run would checkpoint the
mass table between rounds (one small fixed-width table per round) exactly
like the crawl epochs in ``state/checkpoint.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pixcrawler_ray.sources.readers import read_table

K_LINKS = 3
INIT_MASS = 1000
# target_j(d) = (d * MULT[j] + ADD[j]) % n_docs
MULTS = (7, 9, 11)
ADDS = (13, 14, 15)


def link_mass(sf_dir: str, rounds: int = 3):
    """Integer mass after ``rounds`` propagation steps (SQL-oracled)."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n_docs = docs.count()

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "mass": pa.array(
                np.full(t.num_rows, INIT_MASS, dtype=np.int64)),
        })

    mass = docs.map_batches(init, batch_format="pyarrow")

    def send(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = t.column("mass").to_numpy(zero_copy_only=False)
        share = m // K_LINKS
        nodes = [(d * mu + ad) % n_docs for mu, ad in zip(MULTS, ADDS)]
        nodes.append(d)
        masses = [share] * K_LINKS + [m - K_LINKS * share]
        return pa.table({"doc_id": pa.array(np.concatenate(nodes)),
                         "mass": pa.array(np.concatenate(masses))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("doc_id", sort=False)["mass"].sum().reset_index())

    for _ in range(rounds):
        sends = mass.map_batches(send, batch_format="pyarrow")
        mass = per_bucket(sends, ["doc_id"], merge, num_buckets=8)

    return mass
