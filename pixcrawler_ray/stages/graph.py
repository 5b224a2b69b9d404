"""Iterative graph propagation over a deterministic link graph — the
PageRank computational shape (Page et al. 1999) expressed as repeated
map_batches explosion + keyed aggregation rounds.

The reference has no graph stage; a web-scale crawler needs one (link-graph
authority feeds frontier priority). The corpus pages carry no inter-host
links, so the graph is synthesized deterministically from doc_id arithmetic
(out-degree k(d) = 1 + d % 3, replayable in SQL), and the propagation uses
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

INIT_MASS = 1000
# out-degree k(d) = 1 + d % 3 (VARYING — uniform k with coprime multipliers
# makes every map a bijection mod n and uniform mass a trivial fixed point);
# target_j(d) = (d * MULT[j] + ADD[j]) % n_docs for j < k(d)
MULTS = (7, 9, 11)
ADDS = (13, 14, 15)


def _out_degree(d: np.ndarray) -> np.ndarray:
    return 1 + d % 3


def _initial_mass(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "mass": pa.array(
                np.full(t.num_rows, INIT_MASS, dtype=np.int64)),
        })

    return docs.map_batches(init, batch_format="pyarrow"), docs.count()


def _propagate_round(mass_ds, n_docs: int):
    """One round: explode k arithmetic sends + 1 keep, groupby-sum."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    def send(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = t.column("mass").to_numpy(zero_copy_only=False)
        k = _out_degree(d)
        share = m // k
        nodes, masses = [d], [m - k * share]
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            sel = k > j
            nodes.append((d[sel] * mu + ad) % n_docs)
            masses.append(share[sel])
        return pa.table({"doc_id": pa.array(np.concatenate(nodes)),
                         "mass": pa.array(np.concatenate(masses))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("doc_id", sort=False)["mass"].sum().reset_index())

    sends = mass_ds.map_batches(send, batch_format="pyarrow")
    return per_bucket(sends, ["doc_id"], merge, num_buckets=8)


def link_mass(sf_dir: str, rounds: int = 3):
    """Integer mass after ``rounds`` propagation steps (SQL-oracled)."""
    mass, n_docs = _initial_mass(sf_dir)
    for _ in range(rounds):
        mass = _propagate_round(mass, n_docs)
    return mass


def _pagerank_round(mass_ds, n_docs: int, total: int, damp_pct: int):
    """One damped round: sends ship floor(floor(m*d%)/k) per edge; the
    whole residue pool (the (1-d) share + every rounding remainder) is
    redistributed as a uniform teleport floor(R/n) with the R%n leftover
    going to the R%n lowest node ids — mass-conserving, order-insensitive
    integer arithmetic, so the fixed-round prefix value-hashes.

    Distributed shape: explode sends (+ one zero 'ground' row per source so
    every node survives the groupby even with no in-edges), ONE keyed
    exchange to sum received mass, ONE O(nodes) streaming ``sum`` for the
    global residue scalar (a single int64 to the driver), then a stateless
    teleport map. The received table is materialized once per round — the
    same O(nodes) fixed-width granule ``link_mass_resumable`` checkpoints.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    def send(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = t.column("mass").to_numpy(zero_copy_only=False)
        k = _out_degree(d)
        share = (m * damp_pct) // 100 // k
        nodes, masses = [d], [np.zeros(len(d), dtype=np.int64)]  # ground
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            sel = k > j
            nodes.append((d[sel] * mu + ad) % n_docs)
            masses.append(share[sel])
        return pa.table({"doc_id": pa.array(np.concatenate(nodes)),
                         "mass": pa.array(np.concatenate(masses))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("doc_id", sort=False)["mass"].sum().reset_index())

    received = per_bucket(mass_ds.map_batches(send, batch_format="pyarrow"),
                          ["doc_id"], merge, num_buckets=8).materialize()
    resid = total - int(received.sum("mass"))
    base, rem = divmod(resid, n_docs)

    def teleport(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = t.column("mass").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "mass": pa.array(m + base + (d < rem).astype(np.int64))})

    return received.map_batches(teleport, batch_format="pyarrow")


TRUST_SEED_MOD = 31     # trusted seed set: doc_id % 31 == 0 (closed form)


def trustrank_mass(sf_dir: str, rounds: int = 3, damp_pct: int = 85):
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) — the
    web-spam countermeasure every production crawler runs beside
    PageRank: identical damped propagation, but the teleport residue is
    redistributed ONLY over a trusted seed set, so trust flows outward
    from seeds and link-spam farms that PageRank's uniform teleport
    subsidizes get nothing. Seeds here are the closed-form set
    doc_id % 31 == 0 (the oracle replays it); the integer-conserving
    arithmetic is the same as ``pagerank_mass`` — sends
    floor(floor(m·d%)/k) per edge, pooled residue R teleports as
    floor(R/n_seeds) per seed with the R % n_seeds leftover going to the
    lowest seed ids. Total mass invariant every round (pytest-pinned).

    Distributed shape per round: one keyed exchange for the receive sum
    + one O(nodes) streaming ``sum`` for the residue scalar + a
    stateless seed-teleport map — exactly ``_pagerank_round``'s plan with
    a different teleport mask; state is the same fixed-width
    checkpoint granule as ``link_mass_resumable``.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    mass, n_docs = _initial_mass(sf_dir)
    total = INIT_MASS * n_docs
    n_seeds = (n_docs + TRUST_SEED_MOD - 1) // TRUST_SEED_MOD

    def send(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = t.column("mass").to_numpy(zero_copy_only=False)
        k = _out_degree(d)
        share = (m * damp_pct) // 100 // k
        nodes, masses = [d], [np.zeros(len(d), dtype=np.int64)]  # ground
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            sel = k > j
            nodes.append((d[sel] * mu + ad) % n_docs)
            masses.append(share[sel])
        return pa.table({"doc_id": pa.array(np.concatenate(nodes)),
                         "mass": pa.array(np.concatenate(masses))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("doc_id", sort=False)["mass"].sum().reset_index())

    for _ in range(rounds):
        received = per_bucket(
            mass.map_batches(send, batch_format="pyarrow"),
            ["doc_id"], merge, num_buckets=8).materialize()
        resid = total - int(received.sum("mass"))
        per_seed, rem = divmod(resid, n_seeds)

        def teleport(t: pa.Table, _ps=per_seed, _rem=rem) -> pa.Table:
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = t.column("mass").to_numpy(zero_copy_only=False)
            is_seed = d % TRUST_SEED_MOD == 0
            seed_rank = d // TRUST_SEED_MOD   # seed index among seeds
            add = np.where(is_seed, _ps + (seed_rank < _rem), 0)
            return pa.table({"doc_id": t.column("doc_id"),
                             "mass": pa.array(m + add)})

        mass = received.map_batches(teleport, batch_format="pyarrow")

    return mass


def pagerank_mass(sf_dir: str, rounds: int = 3, damp_pct: int = 85):
    """Damped PageRank (Page et al. 1999) over the same arithmetic link
    graph as ``link_mass``, in conserving integer fixed-point: damping
    d = damp_pct/100, uniform teleport of the pooled residue. Total mass
    is invariant (== 1000 * n_docs) every round (pytest-pinned), and the
    whole prefix is SQL-oracled by unrolled per-round CTEs."""
    mass, n_docs = _initial_mass(sf_dir)
    total = INIT_MASS * n_docs
    for _ in range(rounds):
        mass = _pagerank_round(mass, n_docs, total, damp_pct)
    return mass


def link_mass_resumable(sf_dir: str, out_dir: str, rounds: int = 3,
                        fail_after_round: int | None = None):
    """Round-granular checkpointed propagation: each completed round's mass
    table commits as an atomically-renamed ``round={r}`` parquet dir with a
    ``_DONE`` marker; resume scans for the highest complete round and
    continues from its committed table — the iterative-algorithm analog of
    the crawl's epoch checkpoints (state/checkpoint.py). On a 100 TB graph
    the per-round table is O(nodes) fixed-width, the natural recovery
    granule for a multi-hour power-iteration job.

    ``fail_after_round``: test hook — raise before computing round r+1.
    """
    import os
    import shutil

    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    _, n_docs = _initial_mass(sf_dir)

    start, mass = 0, None
    for r in range(rounds, 0, -1):
        p = os.path.join(out_dir, f"round-{r}")
        if os.path.exists(os.path.join(p, "_DONE")):
            start = r
            mass = rd.read_parquet(p, file_extensions=["parquet"])
            break
    if mass is None:
        mass, _ = _initial_mass(sf_dir)

    for r in range(start + 1, rounds + 1):
        if fail_after_round is not None and r > fail_after_round:
            raise RuntimeError(f"simulated crash before round {r}")
        mass = _propagate_round(mass, n_docs)
        tmp = os.path.join(out_dir, f"_tmp-round-{r}")
        final = os.path.join(out_dir, f"round-{r}")
        shutil.rmtree(tmp, ignore_errors=True)
        mass.write_parquet(tmp)
        open(os.path.join(tmp, "_DONE"), "w").close()
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        mass = rd.read_parquet(final, file_extensions=["parquet"])

    return mass


# ------------------------------------------------- connected components --

CC_MODULUS = 97


def connected_components(sf_dir: str, modulus: int = CC_MODULUS,
                         num_buckets: int = 8, max_rounds: int = 32,
                         stats: dict | None = None):
    """Distributed connected components by min-label propagation with
    POINTER DOUBLING (the hash-to-min shape, Rastogi et al. 2012; the
    MapReduce CC family of Kiveris et al. 2014) — the link-graph clustering
    step of a web corpus (mirror groups, site families), here over a
    deterministic undirected graph whose TRUE components are known in
    closed form so the fixpoint is SQL-oracleable: intra-class path +
    chord edges (d, d+m), (d, d+3m) and (d, d+9m) with class g = d % m
    over contiguous doc ids, so each component is exactly one residue
    class and its min label is g (the chord ladder only shrinks the
    diameter — the component set, and hence the oracle, is chord-free). The Ray side must EARN that answer by
    propagating over the edges — a missed edge direction, a wrong min, or
    a premature stop all diverge from the oracle.

    Per round, two keyed exchanges and one scalar to the driver:
      1. neighbor-min: each (node, lbl) row emits itself + its <=6
         arithmetic neighbors (edges are ARITHMETIC, never a table),
         groupby-min over node;
      2. pointer doubling: lbl <- min(lbl, labels[lbl]) via one bucketed
         hash join — chains of depth D collapse in O(log D) rounds
         instead of D (a residue-class path at 10^10 nodes is ~10^8 hops;
         doubling makes that ~27 rounds);
      3. convergence: labels only decrease, so the fixpoint test is a
         single int64 (SUM of labels) per round — nothing corpus-sized
         ever reaches the driver, same discipline as pagerank's residue
         scalar.
    State is one fixed-width (node, lbl) table per round — the same
    O(nodes) checkpoint granule as ``link_mass_resumable``.

    Output (doc_id, component): component == doc_id % modulus at the
    fixpoint (pytest + SQL oracle). ``stats`` (test hook) records the
    rounds actually run.
    """
    import pyarrow.compute as pc

    from pixcrawler_ray.stages.shuffle import bucketed_join, per_bucket

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    labels = docs.map_batches(
        lambda t: pa.table({"node": t.column("doc_id").cast(pa.int64()),
                            "lbl": t.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    prev_sum = int(labels.sum("lbl"))
    rounds_run = 0
    converged = False

    def send(t: pa.Table) -> pa.Table:
        d = t.column("node").to_numpy(zero_copy_only=False)
        l = t.column("lbl").to_numpy(zero_copy_only=False)
        nodes, lbls = [d], [l]
        for step in (modulus, 3 * modulus, 9 * modulus):
            for sgn in (1, -1):
                nb = d + sgn * step
                sel = (nb >= 0) & (nb < n)
                nodes.append(nb[sel])
                lbls.append(l[sel])
        return pa.table({"node": pa.array(np.concatenate(nodes)),
                         "lbl": pa.array(np.concatenate(lbls))})

    def nmin(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False)["lbl"].min().reset_index()

    for _ in range(max_rounds):
        rounds_run += 1
        after_send = per_bucket(
            labels.map_batches(send, batch_format="pyarrow"),
            ["node"], nmin, num_buckets=num_buckets)
        # pointer doubling: look up labels[lbl] with one bucketed join
        req = after_send.map_batches(
            lambda t: pa.table({"lkey": t.column("lbl"),
                                "node": t.column("node"),
                                "lbl": t.column("lbl")}),
            batch_format="pyarrow")
        mp = labels.map_batches(
            lambda t: pa.table({"lkey": t.column("node"),
                                "lbl2": t.column("lbl")}),
            batch_format="pyarrow")
        labels = bucketed_join(req, mp, on="lkey",
                               num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "lbl": pc.min_element_wise(t.column("lbl"),
                                           t.column("lbl2"))}),
            batch_format="pyarrow").materialize()
        cur_sum = int(labels.sum("lbl"))
        if cur_sum == prev_sum:      # labels only decrease: sum-stable
            converged = True         # means every label is stable
            break
        prev_sum = cur_sum

    if stats is not None:
        stats["rounds"] = rounds_run
        stats["converged"] = converged
    if not converged:
        # a silent non-fixpoint would emit labels that are NOT component
        # minima — fail loudly instead (the docstring's oracle contract)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds; raise max_rounds (doubling needs O(log diameter))")

    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "component": t.column("lbl")}),
        batch_format="pyarrow")


# ------------------------------------------------------ HITS hubs/auths --

def hits_scores(sf_dir: str, rounds: int = 2, num_buckets: int = 8):
    """HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in
    a hyperlinked environment") over the same arithmetic link graph as
    ``link_mass`` — the other classic frontier-priority signal next to
    PageRank (a crawler seeds from high-hub pages; an LLM-corpus builder
    weights high-authority ones). Run UNNORMALIZED in integer arithmetic:
    h0 = 1, then per round a(v) = Σ_{u→v} h(u) and h'(u) = Σ_{u→v} a(v).
    Forward edges only — the SQL replay is a plain unrolled self-join
    with no modular inverses — and every update is order-insensitive
    integer summation, so the fixed-round prefix value-hashes exactly
    (the float power-iteration norm would not). Growth per round is
    bounded by (max_indeg · max_outdeg) ≤ ~100; at rounds ≤ 4 scores sit
    far inside int64.

    Distributed shape per round, TWO keyed exchanges and nothing to the
    driver: one map explodes each (u, h) row into its ≤3 arithmetic edge
    rows (tgt, src, h) plus one ground row (u, -1, 0) so zero-in-degree
    nodes keep an authority row; exchange 1 (keyed on tgt) runs a kernel
    that groupby-sums a(tgt) and emits BOTH the authority rows
    (kind='a') and the per-edge replies (kind='r': src, a(tgt)) — the
    authority table and the hub scatter ride the SAME exchange; exchange
    2 (keyed on src over the replies) groupby-sums h'(src). Per-round
    state is one fixed-width table — the ``link_mass_resumable``
    checkpoint granule. Reference has no graph stage; frontier priority
    analog: ``backend/services/crawl_job.py`` tier scheduling.

    Returns one section-tagged Dataset: (section ∈ {hub, auth}, doc_id,
    score) at round ``rounds``.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    if rounds < 1:
        raise ValueError("hits_scores needs rounds >= 1")
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    hubs = docs.map_batches(
        lambda t: pa.table({"node": t.column("doc_id").cast(pa.int64()),
                            "h": pa.array(np.ones(t.num_rows,
                                                  dtype=np.int64))}),
        batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        d = t.column("node").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        k = _out_degree(d)
        tgts, srcs, hs = [d], [np.full(len(d), -1, dtype=np.int64)], \
            [np.zeros(len(d), dtype=np.int64)]          # ground rows
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            sel = k > j
            tgts.append((d[sel] * mu + ad) % n)
            srcs.append(d[sel])
            hs.append(h[sel])
        return pa.table({"tgt": pa.array(np.concatenate(tgts)),
                         "src": pa.array(np.concatenate(srcs)),
                         "h": pa.array(np.concatenate(hs))})

    def auth_and_reply(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("tgt", sort=False)["h"].sum()
        e = g[g["src"].to_numpy() >= 0]
        return pd.DataFrame({
            "kind": np.concatenate([np.full(len(a), "a", dtype=object),
                                    np.full(len(e), "r", dtype=object)]),
            "node": np.concatenate([a.index.to_numpy(dtype=np.int64),
                                    e["src"].to_numpy(dtype=np.int64)]),
            "val": np.concatenate([a.to_numpy(dtype=np.int64),
                                   a.loc[e["tgt"]].to_numpy(
                                       dtype=np.int64)])})

    def hsum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False)["val"].sum().reset_index()

    auth = None
    for _ in range(rounds):
        mixed = per_bucket(
            hubs.map_batches(explode, batch_format="pyarrow"),
            ["tgt"], auth_and_reply, num_buckets=num_buckets).materialize()
        auth = mixed.filter(expr="kind == 'a'")
        hubs = per_bucket(mixed.filter(expr="kind == 'r'"),
                          ["node"], hsum, num_buckets=num_buckets) \
            .map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "h": t.column("val")}),
            batch_format="pyarrow")

    tagged_h = hubs.map_batches(
        lambda t: pa.table({
            "section": pa.array(["hub"] * t.num_rows, type=pa.string()),
            "doc_id": t.column("node").cast(pa.int64()),
            "score": t.column("h").cast(pa.int64())}),
        batch_format="pyarrow")
    tagged_a = auth.map_batches(
        lambda t: pa.table({
            "section": pa.array(["auth"] * t.num_rows, type=pa.string()),
            "doc_id": t.column("node").cast(pa.int64()),
            "score": t.column("val").cast(pa.int64())}),
        batch_format="pyarrow")
    return tagged_h.union(tagged_a)


# ------------------------------------------------- OPIC crawl importance --

def opic_importance(sf_dir: str, rounds: int = 3, k_crawl: int = 50,
                    num_buckets: int = 8):
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobéna, WWW 2003) — the crawl-native importance estimator:
    every page holds CASH; each round the scheduler "crawls" the k pages
    with the most cash, which distribute their cash equally over their
    out-links and bank the distributed amount into their HISTORY (the
    importance estimate that converges to PageRank without ever running
    a full power iteration — exactly the frontier-priority signal an
    incremental crawler wants, because it is updated online as pages are
    fetched). Integer-conserving batch variant so the fixed-round prefix
    value-hashes: a crawled page with out-degree k ships floor(cash/k)
    per edge, keeps cash % k, and banks k·floor(cash/k); total cash is
    invariant (== 1000·n every round, pytest-pinned). Selection is total-
    ordered (cash DESC, doc_id ASC), so Ray and SQL pick identical sets.

    Distributed shape per round: a per-block partial top-k map (each
    block emits ≤ k rows) reduces the state to ≤ k·blocks rows, a global
    ``sort().limit(k)`` on that REDUCED set yields the crawl set (k rows
    — a legitimately broadcastable object, shipped once via ``ray.put``),
    then ONE stateless map emits per-edge cash sends + self rows and ONE
    keyed exchange groupby-sums (cash, hist) by node. Nothing
    corpus-sized reaches the driver; per-round state is one fixed-width
    table — the ``link_mass_resumable`` checkpoint granule. Reference
    analog: priority scheduling in ``backend/services/crawl_job.py``
    (tier queues), re-expressed as the public-literature OPIC rule.

    Returns (doc_id, cash, hist) after ``rounds`` rounds.
    """
    import ray as _ray

    from pixcrawler_ray.stages.shuffle import per_bucket

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    state = docs.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "cash": pa.array(np.full(t.num_rows, INIT_MASS,
                                     dtype=np.int64)),
            "hist": pa.array(np.zeros(t.num_rows, dtype=np.int64))}),
        batch_format="pyarrow")

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.select(["doc_id", "cash"]).to_pandas()
        top = df.sort_values(["cash", "doc_id"], ascending=[False, True],
                             kind="mergesort").head(k_crawl)
        return pa.Table.from_pandas(top, preserve_index=False)

    def merge_state(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("doc_id", sort=False)[["cash", "hist"]]
                 .sum().reset_index())

    for _ in range(rounds):
        reduced = state.map_batches(partial_topk, batch_format="pyarrow",
                                    batch_size=None)
        sel = (reduced.sort(["cash", "doc_id"], descending=[True, False])
               .limit(k_crawl).to_pandas())
        sel_ref = _ray.put(np.sort(sel["doc_id"].to_numpy(dtype=np.int64)))

        def step(t: pa.Table, _sel=sel_ref) -> pa.Table:
            ids = _ray.get(_sel)
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            c = t.column("cash").to_numpy(zero_copy_only=False)
            h = t.column("hist").to_numpy(zero_copy_only=False)
            k = _out_degree(d)
            crawled = np.isin(d, ids)
            share = np.where(crawled, c // k, 0)
            dist = k * share
            nodes = [d]
            cashes = [c - dist]
            hists = [h + dist]
            for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
                sel_j = crawled & (k > j)
                nodes.append((d[sel_j] * mu + ad) % n)
                cashes.append(share[sel_j])
                hists.append(np.zeros(int(sel_j.sum()), dtype=np.int64))
            return pa.table({
                "doc_id": pa.array(np.concatenate(nodes)),
                "cash": pa.array(np.concatenate(cashes)),
                "hist": pa.array(np.concatenate(hists))})

        state = per_bucket(state.map_batches(step, batch_format="pyarrow"),
                           ["doc_id"], merge_state,
                           num_buckets=num_buckets).materialize()

    return state


# ------------------------------------------------------ host-graph rollup --

HOST_MULT = 2654435761      # the repo-wide host rule (robots/sitemap/urls)
HOST_MOD = 499


def _host_of(d: np.ndarray) -> np.ndarray:
    return np.where(d % 3 == 0, 0, 1 + (d * HOST_MULT) % HOST_MOD)


def host_graph(sf_dir: str, num_buckets: int = 8):
    """Host-level webgraph rollup — the Common Crawl webgraph shape (CC
    publishes host- and domain-level graphs aggregated from the page
    graph; crawl schedulers budget per HOST, so the host rollup is the
    planning view): project every doc-level arithmetic edge through the
    repo-wide host rule and aggregate per host.

    Distributed shape: one stateless map explodes each doc into its ≤3
    edges ALREADY projected to (h_src, h_tgt) and mirrors each edge into
    two tagged rows — (key=h_src, other=h_tgt, out) and (key=h_tgt,
    other=h_src, in) — so out- and in-aggregation ride ONE host-keyed
    exchange; the per-bucket kernel groupby-counts edges, distinct
    counterpart hosts, and self-loops per side. Host cardinality is
    bounded (≤500 here; ~10⁸ real-web hosts), so the output is always a
    small table regardless of corpus size — the classic high-fan-in
    rollup where the exchange, not a driver collect, does the fan-in.

    Output: (host_id, host, n_out_edges, n_out_hosts, n_in_edges,
    n_in_hosts, n_self) — hosts with no in-edges keep zeros.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()

    def explode(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        k = _out_degree(d)
        hs, ht = [], []
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            sel = k > j
            hs.append(_host_of(d[sel]))
            ht.append(_host_of((d[sel] * mu + ad) % n))
        hs, ht = np.concatenate(hs), np.concatenate(ht)
        return pa.table({
            "host": pa.array(np.concatenate([hs, ht]), type=pa.int64()),
            "other": pa.array(np.concatenate([ht, hs]), type=pa.int64()),
            "is_out": pa.array(np.concatenate([
                np.ones(len(hs), dtype=np.int8),
                np.zeros(len(ht), dtype=np.int8)]))})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_out"].to_numpy() == 1]
        i = g[g["is_out"].to_numpy() == 0]
        oe = o.groupby("host", sort=False)["other"].agg(
            n_out_edges="size", n_out_hosts="nunique")
        ie = i.groupby("host", sort=False)["other"].agg(
            n_in_edges="size", n_in_hosts="nunique")
        ns = (o[o["host"].to_numpy() == o["other"].to_numpy()]
              .groupby("host", sort=False).size().rename("n_self"))
        res = oe.join([ie, ns], how="outer").fillna(0).reset_index()
        host = res["host"].astype(np.int64)
        return pd.DataFrame({
            "host_id": host,
            "host": "h" + host.astype(str) + ".example.com",
            "n_out_edges": res["n_out_edges"].astype(np.int64),
            "n_out_hosts": res["n_out_hosts"].astype(np.int64),
            "n_in_edges": res["n_in_edges"].astype(np.int64),
            "n_in_hosts": res["n_in_hosts"].astype(np.int64),
            "n_self": res["n_self"].astype(np.int64)})

    return per_bucket(docs.map_batches(explode, batch_format="pyarrow"),
                      ["host"], agg, num_buckets=num_buckets)


# ----------------------------------------------------- anchor-text index --

def anchor_text_index(sf_dir: str, num_buckets: int = 8):
    """Anchor-text aggregation — the classic web-corpus inverted view of
    the link graph (anchor text describes the TARGET page; search engines
    and LLM-corpus builders both index it, e.g. the anchor-text datasets
    of TREC / MS MARCO): for every page, the number of in-links and the
    sorted-distinct set of anchor strings pointing at it.

    Edges are the same arithmetic out-link rule as ``link_mass`` (k(d) =
    1 + d % 3 targets, never a materialized edge table); the anchor string
    of edge j from source d is derived from d's TEXT (its first
    whitespace token) + the edge index, so the operator must actually
    move per-source strings through the exchange — exactly the shape of a
    real anchor-text build, where anchor strings ride the (target-keyed)
    shuffle. One keyed exchange on target; the per-bucket kernel sorts
    (target, anchor) once, dedups, and joins per segment.

    Output (doc_id, n_inlinks, anchors): n_inlinks counts edges WITH
    multiplicity; anchors is '|'.join(sorted(set(anchor))) — both
    replayed verbatim in the SQL oracle (url_canonical_dedup row,
    'anchors' section).
    """
    import pyarrow.compute as pc

    from pixcrawler_ray.stages.shuffle import per_bucket

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n = docs.count()

    def explode(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # null text folds to '' on BOTH sides (SQL: coalesce(text, ''))
        # before the split, so a null doc emits '-j' anchors, never 'None-j'
        txt = pc.fill_null(t.column("text"), "")
        sp = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(txt))
        # first token, '' for empty docs (matches regexp_extract '^\S+')
        first = pc.binary_join(pc.list_slice(sp, 0, 1), "").to_pandas() \
            .to_numpy(dtype=object)
        k = _out_degree(d)
        tgts, ancs = [], []
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            sel = k > j
            tgts.append((d[sel] * mu + ad) % n)
            ancs.append(np.char.add(first[sel].astype(str), f"-{j}"))
        return pa.table({
            "tgt": pa.array(np.concatenate(tgts), type=pa.int64()),
            "anchor": pa.array(np.concatenate(ancs), type=pa.string())})

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("tgt", sort=False).size().rename("n_inlinks")
        d = (g.drop_duplicates()
             .sort_values(["tgt", "anchor"], kind="mergesort"))
        anc = d.groupby("tgt", sort=False)["anchor"].agg("|".join)
        out = pd.concat([cnt, anc], axis=1).reset_index()
        return pd.DataFrame({
            "doc_id": out["tgt"].astype(np.int64),
            "n_inlinks": out["n_inlinks"].astype(np.int64),
            "anchors": out["anchor"].astype(str)})

    return per_bucket(docs.map_batches(explode, batch_format="pyarrow"),
                      ["tgt"], agg, num_buckets=num_buckets)
