"""Relational engine queries over the TPC-H-ish test tables.

These exercise the generic operator inventory (SURVEY §2.2/2.4/2.5/2.6) on
the driver-provided tables so the DuckDB oracle can hash-compare results:
groupby aggregates (A1/A2/A6), broadcast dimension joins (J1/J2), top-k
(O3/O7), distinct (D1), windowed/sessionized aggregates and as-of joins
(§2.8 streaming analogs).

Float discipline: every aggregated money/quantity value is converted to an
exact integer representation (cents / e4 fixed-point) BEFORE summing, so sums
are order-independent bit-exact in both engines (integer-valued doubles sum
exactly below 2^53) and the driver's value-hash cannot be tripped by fp
associativity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from pixcrawler_ray.sources.readers import read_table
from pixcrawler_ray.stages.shuffle import per_bucket


def _cents(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """round(x*100) as int64 — exact, matches DuckDB CAST(ROUND(x*100) AS BIGINT)."""
    return pc.cast(pc.round(pc.multiply(arr, pa.scalar(100.0))), pa.int64())


def _combine_groupby(ds, keys: list[str], sums: dict[str, str],
                     count_alias: str | None = None, num_buckets: int = 8):
    """Map-side-combined groupby for LOW-cardinality keys: each batch
    pre-aggregates with the Arrow C++ hash aggregator (one tiny partial row
    per key per block), then ONE small bucket exchange merges the partials.
    Replaces Ray's corpus-scale ``groupby().aggregate()`` shuffle + its
    aggregator actor-pool spin-up (~1.5 s fixed cost measured — the
    token_counts regression class).

    ``sums``: {output_name: input_column} summed exactly (int64 inputs);
    ``count_alias``: optional COUNT(*) output name.
    """
    in_cols = list(sums.values())
    aggs = [(c, "sum") for c in in_cols]
    rename = {f"{c}_sum": out for out, c in sums.items()}
    if count_alias:
        aggs.append((in_cols[0], "count"))
        rename[f"{in_cols[0]}_count"] = count_alias
    out_names = list(rename.values())

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, keys).aggregate(aggs)
        return g.rename_columns(
            [rename.get(n, n) for n in g.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(keys, sort=False)
                .agg(**{n: (n, "sum") for n in out_names})
                .reset_index())

    return per_bucket(partials, keys, merge, num_buckets=num_buckets)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog (A1/A2 aggregate family).

    sum_qty / sum_base_cents / sum_disc_cents / count per
    (l_returnflag, l_linestatus) for l_shipdate < 1995-09-01.
    """
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1995-09-01", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"), cutoff))
        price_c = _cents(t.column("l_extendedprice"))
        disc_pct = _cents(t.column("l_discount"))  # 0..100
        disc_price_e4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            "base_cents": price_c,
            "disc_e4": disc_price_e4,
        })

    return _combine_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        sums={"sum_qty": "qty", "sum_base_cents": "base_cents",
              "sum_disc_e4": "disc_e4"},
        count_alias="count_order")


def q_revenue_by_nation(sf_dir: str):
    """Broadcast dimension join chain: lineitem ⨝ orders ⨝ customer ⨝ nation.

    The three dimension tables are small → ``ray.put`` once, merged per batch
    (SURVEY §2.4 J1/J2 broadcast pattern). Only the fact table streams.
    """
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey", "o_custkey"]).to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"]).to_pandas()
    dim = (orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
                 .merge(nation, left_on="c_nationkey",
                        right_on="n_nationkey"))[["o_orderkey", "n_name"]]
    dim_ref = ray.put(dim)

    class JoinRevenue:
        def __init__(self):
            self.dim = ray.get(dim_ref).set_index("o_orderkey")["n_name"]

        def __call__(self, t: pa.Table) -> pa.Table:
            price_c = _cents(t.column("l_extendedprice"))
            disc_pct = _cents(t.column("l_discount"))
            rev_e4 = pc.multiply(
                price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
            keys = t.column("l_orderkey").to_numpy()
            names = self.dim.reindex(keys).to_numpy(dtype=object)
            return pa.table({
                "n_name": pa.array(names, type=pa.string()),
                "rev_e4": rev_e4,
            })

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    joined = ds.map_batches(JoinRevenue, batch_format="pyarrow",
                            concurrency=(1, 4), num_cpus=0.5)
    return _combine_groupby(joined, ["n_name"],
                            sums={"revenue_e4": "rev_e4"},
                            count_alias="n_items")


def q_top_parts_by_qty(sf_dir: str, k: int = 10):
    """Top-k (O3): parts by total quantity; ties broken by p_partkey."""
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"]).to_pandas()
    part_ref = ray.put(part.set_index("p_partkey")["p_name"])
    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    agg = (ds.map_batches(
        lambda t: pa.table({
            "l_partkey": t.column("l_partkey"),
            "qty": pc.cast(t.column("l_quantity"), pa.int64())}),
        batch_format="pyarrow")
        .groupby("l_partkey").aggregate(Sum("qty", alias_name="sum_qty")))
    top = agg.sort(["sum_qty", "l_partkey"], descending=[True, False]).limit(k)
    names = ray.get(part_ref)

    def attach(t: pa.Table) -> pa.Table:
        nm = names.reindex(t.column("l_partkey").to_numpy()).to_numpy(object)
        return t.append_column("p_name", pa.array(nm, type=pa.string()))

    return top.map_batches(attach, batch_format="pyarrow")


def q_order_priority_count(sf_dir: str):
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority"])
    ones = ds.map_batches(
        lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    return _combine_groupby(ones, ["o_orderpriority"],
                            sums={"n_orders": "one"})


def q_distinct_mktsegment(sf_dir: str):
    """D1 distinct: unique customer market segments."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    ones = ds.map_batches(
        lambda t: t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow")
    return _combine_groupby(ones, ["c_mktsegment"], sums={"n": "one"})


def q_lineitem_topk_revenue(sf_dir: str, k: int = 20):
    """Global top-k rows by computed revenue (sort + limit)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        price_c = _cents(t.column("l_extendedprice"))
        disc_pct = _cents(t.column("l_discount"))
        rev_e4 = pc.multiply(
            price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "l_linenumber": t.column("l_linenumber"),
                         "revenue_e4": rev_e4})

    return (ds.map_batches(rev, batch_format="pyarrow")
              .sort(["revenue_e4", "l_orderkey", "l_linenumber"],
                    descending=[True, False, False])
              .limit(k))


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (§2.8): per (event_type, hour) count + sum.

    Window = event-time hour truncation; value summed in exact cents.
    """
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table({"event_type": t.column("event_type"),
                         "hour": hour,
                         "value_cents": _cents(t.column("value"))})

    return (ds.map_batches(prep, batch_format="pyarrow")
              .groupby(["event_type", "hour"])
              .aggregate(Count(alias_name="n_events"),
                         Sum("value_cents", alias_name="sum_value_cents")))


def q_events_sliding(sf_dir: str, window_hours: int = 2):
    """Sliding/hopping window (size 2h, hop 1h): each event contributes to
    ``window_hours`` windows. Flat-map inside map_batches -> groupby —
    the standard batch re-expression of a hop window (§2.8)."""
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        parts = []
        for o in range(window_hours):
            start = pc.subtract(
                hour.cast(pa.int64()),
                pa.scalar(o * 3_600_000_000, pa.int64())).cast(
                    pa.timestamp("us"))
            parts.append(pa.table({
                "event_type": t.column("event_type"),
                "window_start": start,
                "value_cents": _cents(t.column("value")),
            }))
        return pa.concat_tables(parts)

    return (ds.map_batches(explode, batch_format="pyarrow")
              .groupby(["event_type", "window_start"])
              .aggregate(Count(alias_name="n_events"),
                         Sum("value_cents", alias_name="sum_value_cents")))


def q_events_windows(sf_dir: str, window_hours: int = 2):
    """Tumbling (1 h) + sliding (``window_hours`` h, hop 1 h) window
    aggregates in ONE registry row (driver 50-row cap), tagged by ``kind``
    — both remain their own groupby plans; the union is schema-aligned
    (event_type, window_start, n_events, sum_value_cents). (r5) + the
    watermarked tumbling aggregate with its late side output
    (``q_events_watermarked``): kinds 'watermarked' and 'late'."""

    def tag(kind: str):
        def f(t: pa.Table) -> pa.Table:
            ws = (t.column("hour") if "hour" in t.column_names
                  else t.column("window_start"))
            return pa.table({
                "kind": pa.array([kind] * t.num_rows, type=pa.string()),
                "event_type": t.column("event_type"),
                "window_start": ws,
                "n_events": t.column("n_events"),
                "sum_value_cents": t.column("sum_value_cents"),
            })
        return f

    hourly = q_events_hourly(sf_dir).map_batches(
        tag("tumbling"), batch_format="pyarrow")
    sliding = q_events_sliding(sf_dir, window_hours).map_batches(
        tag("sliding"), batch_format="pyarrow")
    return hourly.union(sliding).union(q_events_watermarked(sf_dir))


# watermark arrival model: deterministic STRAGGLERS — every 10th event
# (event_id % 10 == 3) arrives WM_JIT positions late, everything else in
# append order (the events table is time-ordered, so this simulates the
# real failure mode: a minority of messages delayed in transit past the
# allowed lateness while the watermark advances on the in-order majority).
# Both sides replay the rule verbatim.
WM_STRAGGLER_MOD = 10
WM_STRAGGLER_RES = 3
WM_JIT = 40
_WM_RANGES = 64


def q_events_watermarked(sf_dir: str, delay_minutes: int = 60,
                         num_buckets: int = 8):
    """Watermarked tumbling-window aggregate with a LATE side output —
    the Dataflow/Beam allowed-lateness semantics (Akidau et al., VLDB
    2015) re-expressed as batch dataflow: events "arrive" in the
    deterministic straggler order ``a = event_id + (WM_JIT if straggler
    else 0)`` (ties by event_id); the low watermark at an event's arrival
    is the MAX event-time of all PRIOR arrivals minus the allowed delay;
    an event whose ts lies below that watermark is LATE and routed to the
    side output, everything else aggregates normally. Both partitions
    emit the same (event_type, hour) count + cents-sum schema, tagged.

    Distributed shape — the exclusive global prefix-MAX is the same
    two-step scan as ``scan_prefix_tokens`` (textprep): (1) per-range max
    partials (range = arrival-key interval) collapse to a 64-row table,
    exclusive-max-scanned on the driver and broadcast; (2) one
    range-keyed exchange, each kernel sorts its ranges by arrival key and
    takes a local exclusive cummax + its range base. Then the standard
    map-side-combine aggregation. Nothing corpus-sized on the driver; no
    sort of the full stream.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket, range_scan_totals

    delay_us = np.int64(delay_minutes) * 60 * 1_000_000
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "event_type", "value"])

    # range-partition the ARRIVAL-KEY DOMAIN [0, max_id + JIT]: the range
    # count stays <= _WM_RANGES whatever the id layout (sparse/offset ids
    # would blow a count()-based span up to one range per event)
    a_span = int(ds.max("event_id")) + WM_JIT + 1

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        a = ids + np.where(ids % WM_STRAGGLER_MOD == WM_STRAGGLER_RES,
                           WM_JIT, 0)
        rng = (a * _WM_RANGES) // a_span
        ts_us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "event_id": pa.array(ids), "akey": pa.array(a),
            "rng": pa.array(rng), "ts_us": ts_us,
            "event_type": t.column("event_type"),
            "value_cents": _cents(t.column("value"))})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # step 1: per-range max partials -> <=64-row exclusive max scan
    # (shared two-step-scan helper, reduce='max')
    totals = range_scan_totals(keyed_ds, "rng", "ts_us", reduce="max")
    run = np.maximum.accumulate(totals["ts_us"].to_numpy())
    base = dict(zip(totals["rng"].to_numpy()[1:], run[:-1].astype(np.int64)))

    # step 2: range-keyed exchange, local exclusive cummax + range base
    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rng", "akey", "event_id"], kind="mergesort")
        ts = df["ts_us"].to_numpy().astype(np.int64)
        rng = df["rng"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.concatenate(
            [[True], rng[1:] != rng[:-1]]))
        # exclusive cummax restarting at each range boundary: the kernel
        # holds <= 64 ranges, so a per-segment pandas accumulate is a
        # bounded loop over segments, not rows
        seg = np.repeat(starts, np.diff(np.append(starts, len(rng))))
        excl = pd.Series(ts).groupby(seg).apply(
            lambda s: s.cummax().shift(
                1, fill_value=np.iinfo(np.int64).min)).to_numpy()
        # one base lookup per SEGMENT (<= 64), repeated — not per row
        seg_bases = np.array([base.get(int(r), np.iinfo(np.int64).min)
                              for r in rng[starts]], dtype=np.int64)
        bases = np.repeat(seg_bases,
                          np.diff(np.append(starts, len(rng))))
        wm_src = np.maximum(excl, bases)
        late = (wm_src != np.iinfo(np.int64).min) & (wm_src - ts > delay_us)
        out = df[["event_type", "value_cents"]].copy()
        out["hour_us"] = (df["ts_us"].to_numpy() // 3_600_000_000
                          * 3_600_000_000)
        out["kind"] = np.where(late, "late", "watermarked")
        return out

    flagged = per_bucket(keyed_ds, ["rng"], flag, num_buckets=num_buckets)

    # map-side combine -> one small keyed exchange (token_counts shape)
    def agg_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.groupby(["kind", "event_type", "hour_us"], sort=False)
             .agg(n_events=("value_cents", "size"),
                  sum_value_cents=("value_cents", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def agg_merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["kind", "event_type", "hour_us"], sort=False)
                .agg(n_events=("n_events", "sum"),
                     sum_value_cents=("sum_value_cents", "sum"))
                .reset_index())

    merged = per_bucket(flagged.map_batches(agg_partial,
                                            batch_format="pyarrow"),
                        ["kind", "event_type", "hour_us"], agg_merge,
                        num_buckets=4)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "kind": t.column("kind"),
            "event_type": t.column("event_type"),
            "window_start": t.column("hour_us").cast(pa.timestamp("us")),
            "n_events": t.column("n_events").cast(pa.int64()),
            "sum_value_cents": t.column("sum_value_cents").cast(pa.int64())})

    return merged.map_batches(finish, batch_format="pyarrow")


def q_events_sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization per user (§2.8 streaming analog).

    session boundary when ts - prev_ts > gap; output = sessions per user +
    total events. Hash-partitioned on user_id, vectorized per bucket.
    """
    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["ts"].shift()
        new_sess = (g["ts"] - prev > gap) | prev.isna()
        g["_sess"] = new_sess.astype("int64")
        out = g.groupby("user_id", sort=False).agg(
            n_sessions=("_sess", "sum"), n_events=("ts", "size"))
        return out.reset_index()

    return per_bucket(ds, ["user_id"], kernel, num_buckets=32)


def q_events_funnel(sf_dir: str, window_s: int = 3600):
    """Conversion funnel (SQL-oracled): per user, the first ``signup``
    event and the purchases landing within ``window_s`` seconds of it —
    the A-then-B-within-T shape of event analytics. One column-pruned,
    type-filtered read, one user-hash bucket exchange, a vectorized
    per-bucket kernel; users without an in-window purchase drop (inner
    funnel). Output (user_id, signup_ts, first_purchase_ts, n_purchases).
    """
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type",
                                               "ts"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("event_type"),
                                    value_set=pa.array(
                                        ["signup", "purchase"]))),
        batch_format="pyarrow")
    win = np.timedelta64(window_s, "s")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        sign = (g[g["event_type"] == "signup"]
                .groupby("user_id", sort=False)["ts"].min()
                .rename("signup_ts"))
        p = g[g["event_type"] == "purchase"].merge(
            sign, left_on="user_id", right_index=True)
        p = p[(p["ts"] >= p["signup_ts"])
              & (p["ts"] <= p["signup_ts"] + win)]
        out = (p.groupby(["user_id", "signup_ts"], sort=False)
               .agg(first_purchase_ts=("ts", "min"),
                    n_purchases=("ts", "size"))
               .reset_index())
        out["n_purchases"] = out["n_purchases"].astype("int64")
        return out

    return per_bucket(ds, ["user_id"], kernel, num_buckets=32)


def q_events_asof_orders(sf_dir: str):
    """As-of join (custom operator): last order date <= event ts per user.

    events.user_id joins customer keyspace; implemented as merge_asof per
    user-hash bucket (ray_guide "As-of / range join"). Events with no prior
    order are dropped (inner as-of).
    """
    events = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    orders = orders.sort_values(["o_custkey", "o_orderdate"])
    orders_ref = ray.put(orders)

    class AsOf:
        def __init__(self):
            self.orders = ray.get(orders_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values("ts", kind="mergesort")
            merged = pd.merge_asof(
                df, self.orders.sort_values("o_orderdate"),
                left_on="ts", right_on="o_orderdate",
                left_by="user_id", right_by="o_custkey")
            merged = merged.dropna(subset=["o_orderdate"])
            return merged[["event_id", "user_id", "o_orderdate"]].rename(
                columns={"o_orderdate": "last_order_date"})

    return events.map_batches(AsOf, batch_format="pandas",
                              concurrency=(1, 4), num_cpus=0.5)


def q_sequential_rename(sf_dir: str):
    """M13 sequential rename as a window projection: per (lang, source)
    partition, docs ordered by doc_id get zero-padded names '0001'... —
    mirror of rename_images_sequentially (builder/_helpers.py:128-312)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        rank = g.groupby(["lang", "source"], sort=False).cumcount() + 1
        g["seq_name"] = rank.map("{:04d}".format)
        return g

    return per_bucket(ds, ["lang", "source"], kernel, num_buckets=16)


def q_events_range_attrib(sf_dir: str, window_minutes: int = 60,
                          num_buckets: int = 16):
    """Range (interval) join — purchase attribution: every event of the
    same user inside ``(purchase_ts, purchase_ts + window]`` — as a
    BUCKETED-INTERVAL join, the classic distributed range-join plan:

    time is tiled into window-width tiles; each PURCHASE anchor's interval
    is replicated to the exactly-2 consecutive tiles it can touch
    (interval length == tile width, so the replication factor is a
    constant 2 regardless of data); each candidate EVENT hashes to exactly
    one tile; one (user, tile)-keyed bucketed hash join co-locates
    candidates; the exact ``a.ts < b.ts <= a.ts + W`` filter runs
    vectorized inside the join kernel. No cross product, no broadcast, no
    driver state — exchange volume is |events| + 2|purchases| rows however
    large either side grows. A pair can only meet in the follow-event's
    own tile, so no post-join dedup is needed.

    Output (event_id, user_id, anchor_id, anchor_ts); SQL-oracled as the
    interval theta-join.
    """
    from pixcrawler_ray.stages.shuffle import bucketed_join

    W = np.int64(window_minutes) * np.int64(60_000_000)  # tile width, us
    events = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "ts", "event_type"])

    def ev_tile(t: pa.Table) -> pa.Table:
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t.column("event_id").cast(pa.int64()),
            "user_id": t.column("user_id").cast(pa.int64()),
            "ts_us": pa.array(us),
            "tb": pa.array(us // W)})

    def anchor_tile(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        aid = t.column("event_id").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        tb0 = us // W
        # (ts, ts+W] touches tiles ts//W and (ts+W)//W == ts//W + 1, always
        return pa.table({
            "anchor_id": pa.array(np.concatenate([aid, aid])),
            "user_id": pa.array(np.concatenate([uid, uid])),
            "anchor_us": pa.array(np.concatenate([us, us])),
            "tb": pa.array(np.concatenate([tb0, tb0 + 1]))})

    ev = events.map_batches(ev_tile, batch_format="pyarrow")
    an = events.map_batches(anchor_tile, batch_format="pyarrow")
    joined = bucketed_join(ev, an, on=["user_id", "tb"],
                           num_buckets=num_buckets)

    def in_range(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        st = t.column("anchor_us").to_numpy(zero_copy_only=False)
        keep = (st < ts) & (ts <= st + W)
        t = t.filter(pa.array(keep))
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "anchor_id": t.column("anchor_id"),
            "anchor_ts": t.column("anchor_us").cast(pa.timestamp("us"))})

    return joined.map_batches(in_range, batch_format="pyarrow")


def q_rollup_lang_source(sf_dir: str, num_buckets: int = 8):
    """GROUP BY ROLLUP(lang, cls) — grouping-sets aggregation: doc counts
    and token sums at (lang, cls), (lang) and grand-total levels, cls
    being the source class used by the pivot operator.

    Scale shape: the FINEST level is the only distributed aggregation
    (map-side partials -> one tiny keyed exchange, same plan as
    ``_combine_groupby``); the coarser levels re-aggregate the finest
    table, which is |langs| x |classes| rows — driver-side by design, the
    one place a driver loop is the right call. Output
    (section, grp, n) matching the group_counts union row: grp is
    'lang|cls' with '*' at rolled-up positions, one section per measure.
    """
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from pixcrawler_ray.stages.textprep import _nonempty_words
        _, nw = _nonempty_words(t.column("text"))
        cls = pc.cast(pc.replace_substring_regex(
            t.column("source"), r"^src", ""), pa.int64())
        df = pd.DataFrame({
            "lang": t.column("lang").to_pandas().to_numpy(),
            "cls": (cls.to_numpy(zero_copy_only=False) % 4),
            "nw": nw})
        g = (df.groupby(["lang", "cls"], sort=False)
               .agg(n_docs=("nw", "size"), n_tokens=("nw", "sum"))
               .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["lang", "cls"], sort=False)[["n_docs", "n_tokens"]]
                 .sum().reset_index())

    finest = per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                        ["lang", "cls"], merge,
                        num_buckets=num_buckets).to_pandas()

    levels = [finest.assign(grp=finest["lang"] + "|"
                            + finest["cls"].astype(str))]
    by_lang = (finest.groupby("lang", sort=False)[["n_docs", "n_tokens"]]
               .sum().reset_index())
    levels.append(by_lang.assign(grp=by_lang["lang"] + "|*"))
    total = finest[["n_docs", "n_tokens"]].sum()
    levels.append(pd.DataFrame({"grp": ["*|*"],
                                "n_docs": [total["n_docs"]],
                                "n_tokens": [total["n_tokens"]]}))
    lv = pd.concat(levels, ignore_index=True)
    out = pd.concat([
        pd.DataFrame({"section": "rollup_docs", "grp": lv["grp"],
                      "n": lv["n_docs"].astype(np.int64)}),
        pd.DataFrame({"section": "rollup_tokens", "grp": lv["grp"],
                      "n": lv["n_tokens"].astype(np.int64)}),
    ], ignore_index=True)
    return out


def q_events_running(sf_dir: str, num_buckets: int = 32):
    """Per-user running window aggregates — the cumulative-window operator
    family (SUM/COUNT ... OVER (PARTITION BY user ORDER BY ts)): for every
    event, the user's running event rank, running value total (integer
    cents — float sums don't value-hash), and the gap to the previous
    event in microseconds (-1 for the first; us so the lag arithmetic is
    integer-exact on both sides). One user-keyed exchange, then a
    vectorized per-user cumsum/shift — the partitioning assumption is the
    window's PARTITION BY key, so no cross-bucket state exists by
    construction. Ties on ts order by event_id (both sides).

    Output (event_id, user_id, rn, run_cents, mv3_cents, gap_s) —
    mv3_cents is the frame-bounded moving sum (ROWS BETWEEN 2 PRECEDING
    AND CURRENT ROW), the bounded-frame window-aggregate shape.
    """
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                               "value"])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        grp = g.groupby("user_id", sort=False)
        rn = grp.cumcount().to_numpy() + 1
        run = pd.Series(cents).groupby(
            g["user_id"].to_numpy()).cumsum().to_numpy()
        prev = grp["ts"].shift()
        delta = g["ts"] - prev
        gap = (delta.dt.days.astype("float64") * 86_400_000_000
               + delta.dt.seconds.astype("float64") * 1_000_000
               + delta.dt.microseconds.astype("float64"))
        gap = gap.fillna(-1).astype(np.int64)
        # frame-bounded moving sum (ROWS BETWEEN 2 PRECEDING AND CURRENT):
        # run minus the same user's run three rows back (rn > 3 guards the
        # group boundary — the frame is sorted by (user, ts, event_id))
        run_s3 = np.concatenate([[0, 0, 0], run[:-3]])
        mv3 = run - np.where(rn > 3, run_s3, 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy().astype(np.int64),
            "user_id": g["user_id"].to_numpy().astype(np.int64),
            "rn": rn.astype(np.int64),
            "run_cents": run.astype(np.int64),
            "mv3_cents": mv3.astype(np.int64),
            "gap_us": gap.to_numpy(),
        })

    return per_bucket(ds, ["user_id"], kernel, num_buckets=num_buckets)


def q_pivot_lang_source(sf_dir: str, num_buckets: int = 4):
    """Pivot / conditional-aggregation family: the lang x source doc-count
    matrix as one row per lang with a column per source (the reshape every
    corpus dashboard needs). Map-side combine collapses each batch to at
    most |langs| x |sources| cells, one lang-keyed exchange merges, and the
    pivot itself happens on the constant-sized merged cells — no row-level
    shuffle. Sources are the fixed src0..src3 domain; absent cells are 0.

    The pivot key is the source CLASS (source index mod 4 — the same
    4-class notion domain_mixture weights by), so the fixed column set
    covers the whole src0..srcN domain. Output (lang, c0, c1, c2, c3,
    total).
    """
    ds = read_table(sf_dir, "documents", columns=["lang", "source"])
    ccols = [f"c{i}" for i in range(4)]

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["cls"] = (df["source"].str.slice(3).astype(np.int64) % 4)
        g = (df.groupby(["lang", "cls"], sort=False)
             .size().rename("n").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cells = (g.groupby(["lang", "cls"], sort=False)["n"].sum()
                 .reset_index())
        out = []
        for lang, grp in cells.groupby("lang", sort=True):
            by_cls = dict(zip(grp["cls"], grp["n"]))
            row = {"lang": lang}
            for i, cname in enumerate(ccols):
                row[cname] = int(by_cls.get(i, 0))
            row["total"] = int(grp["n"].sum())
            out.append(row)
        return pd.DataFrame(out, columns=["lang"] + ccols + ["total"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return per_bucket(partials, ["lang"], merge, num_buckets=num_buckets)
