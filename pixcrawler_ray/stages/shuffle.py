"""Partitioned-shuffle building blocks: keep-first dedup, per-key head-N,
bucketed hash join, window ranks.

Why buckets instead of raw ``groupby(key)``: Ray Data's ``map_groups`` invokes
the UDF once per *group*; with millions of distinct keys (urls, md5s) that is
a per-row Python loop in disguise. Instead we shuffle on
``bucket = hash(key) % B`` (a few hundred groups regardless of key
cardinality) and run a *vectorized pandas kernel per bucket* — the classic
partitioned hash dedup/join, with B and the salt documented per call site
(SURVEY §7.4). Hot-key skew: callers pass a larger B or a salt column; the
politeness stage additionally splits hot hosts (SURVEY §4).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from pixcrawler_ray.functions.hashing import fnv1a64_ints, hash64_array

BUCKET_COL = "__bucket"
DEFAULT_BUCKETS = 64


def enable_hash_shuffle(cpus: int | None = None) -> None:
    """Switch Ray Data to the hash-shuffle strategy with aggregator counts
    bounded to the cluster (the unbounded default spawns an actor per
    partition — 60+ workers on a laptop-sized node).

    The sort-based default shuffle ANTI-scales for the bucket pattern on
    small-block datasets (measured: the salted admission took 3.3 s at 4
    cpus but 20-25 s at 16 on the round-2 bench host); hash partitioning by
    the bucket column is the semantically-right primitive and scales.
    """
    import ray as _ray
    from ray.data.context import DataContext, ShuffleStrategy

    if cpus is None:
        try:
            cpus = int(_ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
    ctx.default_hash_shuffle_parallelism = max(2, cpus)
    # aggregators are IO/accumulate actors, not compute: near-zero CPU
    # reservation so they can never starve map/fetch actor pools (the same
    # starvation class as the round-1 SeenShard deadlock — observed again
    # here as 6 aggregators pinning a 4-cpu test cluster)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01


def _hash_shuffle_on() -> bool:
    from ray.data.context import DataContext, ShuffleStrategy
    return (DataContext.get_current().shuffle_strategy
            == ShuffleStrategy.HASH_SHUFFLE)


# a split/fuse exchange creates (blocks x partitions) intermediate objects;
# beyond this cap fall back to Ray's built-in hash shuffle (which streams and
# spills — the 100 TB path)
_EXCHANGE_MAX_OBJECTS = 65536


def _exchange_split(t: pa.Table, p: int):
    """Map side of the exchange: sort one block by partition id, return the
    p contiguous slices (zero-copy views of the sorted block).

    ``union`` / empty-partition streams can carry zero-row blocks (sometimes
    with an EMPTY schema, sometimes still in pandas format) that BYPASS
    upstream map UDFs entirely (observed from Ray's UnionOperator and from
    empty exchange partitions flowing through pandas-format map stages) —
    coerce to Arrow here and pass through as empty slices, dropped by the
    fuse side."""
    import pyarrow.compute as pc

    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    if t.num_rows == 0 or BUCKET_COL not in t.column_names:
        return tuple(t.slice(0, 0) for _ in range(p))
    part = pa.array((t.column(BUCKET_COL).to_numpy() % p).astype(np.int64))
    order = pc.sort_indices(part)
    t2 = t.take(order)
    ps = part.take(order).to_numpy()
    bounds = np.searchsorted(ps, np.arange(p + 1))
    return tuple(t2.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                 for i in range(p))


def _exchange_fuse(*parts):
    ts = [x for x in parts if x.num_rows]
    if not ts:
        # keep the widest schema so an empty partition still carries the
        # bucket-stamped schema downstream kernels expect
        return max(parts, key=lambda x: x.num_columns)
    return pa.concat_tables(ts).combine_chunks()


def _exchange_fuse_sliced(k, *parts):
    """Fuse one partition, then emit up to ``k`` row-balanced slices cut at
    BUCKET boundaries (kernels are per-bucket, so any bucket-aligned slice is
    a correct kernel input).

    Why: the fused exchange partitions are the TASK units of the downstream
    (kernel+fetch+extract) fused map stage; hash partitioning leaves +-50%
    row skew across partitions, which surfaces as pure straggler wall time
    at high parallelism. Bucket-aligned sub-slices restore work stealing
    without breaking bucket completeness. Short partitions pad with empty
    slices (dropped downstream)."""
    import pyarrow.compute as pc

    t = _exchange_fuse(*parts)
    if k == 1:
        return t
    empty = t.slice(0, 0)
    if t.num_rows == 0 or BUCKET_COL not in t.column_names:
        return tuple([t] + [empty] * (k - 1))
    b = t.column(BUCKET_COL).to_numpy()
    order = pc.sort_indices(pa.array(b))
    t = t.take(order)
    bs = b[order.to_numpy()]
    # bucket boundary row indices (start of each bucket run), incl. 0 and n
    bounds = np.flatnonzero(np.diff(bs)) + 1
    bounds = np.concatenate([[0], bounds, [len(bs)]])
    # pick the boundary nearest each even cut target
    targets = (np.arange(1, k) * len(bs)) / k
    cuts = bounds[np.searchsorted(bounds, targets)]
    cuts = np.unique(np.concatenate([[0], cuts, [len(bs)]]))
    out = [t.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i]))
           for i in range(len(cuts) - 1)]
    out += [empty] * (k - len(out))
    return tuple(out)


def _exchange_split_agg(t, p: int, agg_fn):
    """Split variant with a SIDE AGGREGATION: returns the p partition slices
    plus ``agg_fn(block)`` (a tiny Arrow table) as return value p+1.

    Lets a caller piggyback a per-block partial aggregate (e.g. group counts
    for rank offsets) on the exchange scan instead of paying a separate full
    pass + barrier over the input."""
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    parts = _exchange_split(t, p)
    if t.num_rows == 0 or BUCKET_COL not in t.column_names:
        return tuple(parts) + (None,)
    return tuple(parts) + (agg_fn(t),)


def _nonempty_block_refs(ds):
    """Executed block refs whose metadata says rows > 0 — no ray.get.

    Exchange outputs and unions carry many zero-row padding blocks (fuse
    slices, empty partitions); feeding them to the next split multiplies
    task/object count by the EMPTY block count (measured: a 1k-row union
    with 768 mostly-empty blocks cost 18 s in a 64-partition split).

    Returns (refs, total_rows); total_rows is None when any block's
    metadata lacks a row count.

    MATERIALIZE first: iterating ref bundles of a LAZY dataset executes it
    under the iterator's read-ahead backpressure, which throttles a wide
    upstream (measured 5x slower on the 4.7M-row admission input);
    materialize() runs the plan at full parallelism and bundle iteration of
    the result is metadata-only."""
    try:
        mat = ds.materialize()
        refs, total = [], 0
        for rb in mat.iter_internal_ref_bundles():
            for ref, meta in rb.blocks:
                if meta.num_rows is None:
                    total = None
                    refs.append(ref)
                elif meta.num_rows > 0:
                    refs.append(ref)
                    if total is not None:
                        total += meta.num_rows
        return refs, total
    except Exception:
        return ds.to_arrow_refs(), None


def _partition_by_bucket(ds, num_buckets: int, side_agg=None,
                         fuse_slices: int = 1):
    """Hash-partition on the bucket column; every bucket lands wholly in one
    output block, so a whole-block map_batches sees complete buckets.

    Ray's built-in shuffle operators carry seconds of fixed overhead per
    exchange at moderate block counts (sort shuffle AND hash shuffle both
    measured 4-20 s for a 500k-row exchange on this host, anti-scaling with
    CPUs). For bounded block counts we instead run the classic two-stage
    exchange directly on the object store: per-block SPLIT tasks emit p
    per-partition slices, per-partition FUSE tasks concat their slices, and
    the result re-enters the Dataset API via ``from_arrow_refs`` — same
    all-to-all movement, ~10x lower constant (measured 0.3-0.4 s for the
    same exchange), no aggregator actor pool to spin up. Beyond
    ``_EXCHANGE_MAX_OBJECTS`` intermediates the built-in shuffle (which
    streams and spills) takes over.
    """
    import ray as _ray
    import ray.data as rd

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # partitions ~ 2x cpus, capped by buckets: kernels are multi-bucket-
    # correct, so partition count trades kernel fixed cost against downstream
    # task granularity — the exchange output blocks ARE the task units of the
    # next fused stage, and exactly-one-task-per-cpu leaves block-size skew
    # (~±20%) as pure straggler wall time with no work stealing
    import os as _os
    ppc = int(_os.environ.get("GRAFT_EXCHANGE_PARTS_PER_CPU", "2"))
    blocks, total_rows = _nonempty_block_refs(ds)
    if not blocks:
        return (ds, []) if side_agg is not None else ds
    # cap partitions by input size: a tiny exchange at p=64 pays ~2-3 s of
    # pure task/object overhead per hop (measured: a 23k-row generation
    # spent 13 s across 4 such exchanges at 32 cpus; a 255-row pair dedup
    # paid a 64-partition exchange). Rows-aware when block metadata knows
    # row counts; block-count bound otherwise (row-sized upstream blocks).
    rpp = int(_os.environ.get("GRAFT_EXCHANGE_ROWS_PER_PART", "4096"))
    rows_cap = (num_buckets if total_rows is None
                else max(1, -(-total_rows // rpp)))
    p = max(2, min(num_buckets, cpus * ppc, 2 * len(blocks), rows_cap))
    if len(blocks) * p > _EXCHANGE_MAX_OBJECTS:
        out = ds.repartition(p, keys=[BUCKET_COL])
        if side_agg is None:
            return out
        # fallback path has no split tasks to piggyback on: run the partial
        # aggregation as its own (streaming) pass over the input blocks
        agg_task = _ray.remote(lambda b: side_agg(
            pa.Table.from_pandas(b, preserve_index=False)
            if isinstance(b, pd.DataFrame) else b))
        return out, [agg_task.remote(b) for b in blocks]
    agg_refs = []
    if side_agg is not None:
        split = _ray.remote(num_returns=p + 1)(_exchange_split_agg)
        full = [split.remote(b, p, side_agg) for b in blocks]
        srefs = [f[:p] for f in full]
        agg_refs = [f[p] for f in full]
    else:
        split = _ray.remote(num_returns=p)(_exchange_split)
        srefs = [split.remote(b, p) for b in blocks]
        if p == 1:
            srefs = [[r] for r in srefs]
    # fuse_slices > 1: bucket-aligned sub-blocks of the fused partition, so
    # downstream kernel tasks stay small (fault-storm-safe working sets on
    # this host) and work-steal. Only worth it when the output feeds a HEAVY
    # fused map (fetch/extract); exchanges feeding another exchange keep 1 —
    # padding empties would multiply the next split's task count instead.
    k = int(_os.environ.get("GRAFT_EXCHANGE_FUSE_SLICES",
                            str(fuse_slices)))
    k = max(1, min(k, 8))
    if k == 1:
        fuse = _ray.remote(_exchange_fuse)
        orefs = [fuse.remote(*[s[i] for s in srefs]) for i in range(p)]
    else:
        fuse = _ray.remote(num_returns=k)(_exchange_fuse_sliced)
        orefs = [r for i in range(p)
                 for r in fuse.remote(k, *[s[i] for s in srefs])]
    out = rd.from_arrow_refs(orefs)
    return (out, agg_refs) if side_agg is not None else out


def _add_bucket(ds, key_cols: Sequence[str], num_buckets: int):
    keys = list(key_cols)

    def add(batch: pa.Table) -> pa.Table:
        return stamp_bucket(batch, keys, num_buckets)

    return ds.map_batches(add, batch_format="pyarrow")


def stamp_bucket(batch: pa.Table, key_cols: Sequence[str],
                 num_buckets: int) -> pa.Table:
    """Append ``BUCKET_COL`` = hash(key) % num_buckets to ONE table —
    the kernel behind :func:`_add_bucket`, exposed so producer tasks can
    stamp (and split) their own output without a separate Dataset pass
    (the folded expansion->split wave in ``admit_salted_fused``)."""
    keys = list(key_cols)
    if batch.num_rows == 0:
        return batch.append_column(BUCKET_COL,
                                   pa.array([], type=pa.int64()))
    key_types = [batch.schema.field(k).type for k in keys]
    if (len(keys) == 1 and pa.types.is_fixed_size_binary(key_types[0])
            and key_types[0].byte_width >= 8):
        # vectorized: first 8 bytes of the fixed-width digest are already
        # uniform (md5/sha) — view the raw buffer as uint64
        col = batch.column(keys[0]).combine_chunks()
        arr = col.chunks[0] if isinstance(col, pa.ChunkedArray) else col
        w = key_types[0].byte_width
        buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        off = arr.offset * w
        mat = buf[off:off + len(arr) * w].reshape(len(arr), w)
        h = mat[:, :8].copy().view(np.uint64).ravel()
    elif all(pa.types.is_integer(t) for t in key_types):
        h = batch.column(keys[0]).to_numpy().astype(np.uint64)
        for k in keys[1:]:   # vectorized integer key mixing
            h = fnv1a64_ints(
                batch.column(k).to_numpy().astype(np.uint64) ^ h)
    elif (len(keys) == 1 and (pa.types.is_string(key_types[0])
                              or pa.types.is_large_string(key_types[0]))):
        # hash each UNIQUE string once (dictionary-encode): bucketing
        # string keys (urls, keywords) must not pay per-row blake2b
        col = batch.column(keys[0]).combine_chunks()
        d = col.dictionary_encode()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        uniq_h = hash64_array(d.dictionary)
        h = uniq_h[d.indices.to_numpy(zero_copy_only=False)]
    else:
        parts = []
        for k in keys:
            col = batch.column(k)
            t = batch.schema.field(k).type
            if pa.types.is_binary(t) or pa.types.is_fixed_size_binary(t) \
                    or pa.types.is_large_binary(t):
                parts.append([b"" if v is None else v
                              for v in col.to_pylist()])
            elif pa.types.is_string(t) or pa.types.is_large_string(t):
                parts.append([b"" if v is None else v.encode("utf-8")
                              for v in col.to_pylist()])
            else:
                parts.append([str(v).encode("utf-8")
                              for v in col.to_pylist()])
        joined = [b"\x00".join(row) for row in zip(*parts)]
        h = hash64_array(joined)
    b = (h % np.uint64(num_buckets)).astype(np.int64)
    return batch.append_column(BUCKET_COL, pa.array(b, type=pa.int64()))


def per_bucket(ds, key_cols: Sequence[str], kernel: Callable[[pd.DataFrame], pd.DataFrame],
               num_buckets: int = DEFAULT_BUCKETS, fuse_slices: int = 1):
    """Shuffle on hash(key) % B, run a vectorized pandas kernel per bucket.

    Kernels must be correct over a UNION of buckets (they all group by their
    true key internally) — under hash shuffle a whole partition (several
    buckets) is handed to one kernel call, which is strictly less work than
    one call per bucket.
    """
    ds = _add_bucket(ds, key_cols, num_buckets)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        if BUCKET_COL not in g.columns:     # degenerate empty-stream block
            return g
        out = kernel(g)
        return out.drop(columns=[BUCKET_COL], errors="ignore")

    if _hash_shuffle_on():
        return _partition_by_bucket(
            ds, num_buckets, fuse_slices=fuse_slices).map_batches(
            run, batch_format="pandas", batch_size=None)
    return ds.groupby(BUCKET_COL).map_groups(run, batch_format="pandas")


def range_scan_totals(ds, rng_col: str, val_col: str,
                      reduce: str = "sum") -> pd.DataFrame:
    """Step 1 of the two-step distributed prefix scan (scan_prefix_tokens,
    q_events_watermarked): collapse ``ds`` to one row per range id via
    per-batch partials + one tiny keyed exchange, and return the merged
    (rng, val) table sorted by rng. ``reduce`` is 'sum' or 'max'. The
    result is bounded by the RANGE COUNT (callers use <=64), never the
    input size — the caller exclusive-scans it on the driver and
    broadcasts the per-range bases."""
    if reduce not in ("sum", "max"):
        raise ValueError(f"unsupported reduce {reduce!r}")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({rng_col: t.column(rng_col).to_numpy(),
                           val_col: t.column(val_col).to_numpy()})
        g = getattr(df.groupby(rng_col, sort=False)[val_col],
                    reduce)().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return getattr(g.groupby(rng_col, sort=False)[val_col],
                       reduce)().reset_index()

    totals = per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                        [rng_col], merge, num_buckets=2).to_pandas()
    return totals.sort_values(rng_col)


def per_bucket_take(ds, key_cols: Sequence[str], helper_cols: Sequence[str],
                    index_kernel, num_buckets: int = DEFAULT_BUCKETS,
                    fuse_slices: int = 1):
    """Arrow-native per-bucket filter: the kernel sees only a primitive-column
    pandas projection and returns row POSITIONS to keep (optionally plus new
    columns); rows are then ``take``-n from the Arrow group, so list/binary
    payload columns never round-trip through pandas.
    """
    ds = _add_bucket(ds, key_cols, num_buckets)
    helpers = list(helper_cols)

    def run(g: pa.Table) -> pa.Table:
        if BUCKET_COL not in g.column_names:  # degenerate empty-stream block
            return g
        proj = g.select(helpers).to_pandas()
        res = index_kernel(proj)
        if isinstance(res, tuple):
            keep, extra = res
        else:
            keep, extra = res, {}
        out = g.take(pa.array(np.asarray(keep, dtype=np.int64)))
        for name, values in extra.items():
            out = out.append_column(name, pa.array(values))
        return out.drop_columns([BUCKET_COL])

    if _hash_shuffle_on():
        return _partition_by_bucket(
            ds, num_buckets, fuse_slices=fuse_slices).map_batches(
            run, batch_format="pyarrow", batch_size=None)
    return ds.groupby(BUCKET_COL).map_groups(run, batch_format="pyarrow")


def keep_first_by(ds, key_cols: Sequence[str], order_col: str,
                  num_buckets: int = DEFAULT_BUCKETS):
    """Deterministic keep-first dedup: per key keep the row with min order_col.

    Mirrors the reference's keep-first-in-listdir-order duplicate grouping
    (``validator/integrity.py:348-370``) with ``seq`` replacing listdir order.
    """
    keys = list(key_cols)

    def kernel(df: pd.DataFrame) -> np.ndarray:
        kept = (df.sort_values(order_col, kind="mergesort")
                  .drop_duplicates(subset=keys, keep="first"))
        return kept.index.to_numpy()

    helpers = list(dict.fromkeys(keys + [order_col]))
    return per_bucket_take(ds, keys, helpers, kernel, num_buckets)


def keep_first_n(ds, key_cols: Sequence[str], order_col: str, n: int,
                 num_buckets: int = DEFAULT_BUCKETS):
    """Per-key head-N by order_col — the budget cap (builder/_engine.py:580-644).

    Replaces the reference's RLock-guarded shared download counter with a
    deterministic rule: the first ``n`` rows by ``seq`` per key survive
    (identical outcome, because reference order == seq order; SURVEY §7.5.2).
    """
    keys = list(key_cols)

    def kernel(df: pd.DataFrame) -> np.ndarray:
        kept = (df.sort_values(order_col, kind="mergesort")
                  .groupby(keys, sort=False).head(n))
        return kept.index.to_numpy()

    helpers = list(dict.fromkeys(keys + [order_col]))
    return per_bucket_take(ds, keys, helpers, kernel, num_buckets)


def keep_first_caps(ds, key_col: str, order_col: str, caps: dict,
                    num_buckets: int = DEFAULT_BUCKETS):
    """Per-key head-cap(key) by order_col — :func:`keep_first_n` with a
    PER-KEY budget (broadcast dict; small by construction: one entry per
    keyword). Keys absent from ``caps`` keep nothing."""
    def kernel(df: pd.DataFrame) -> np.ndarray:
        s = df.sort_values(order_col, kind="mergesort")
        r = s.groupby(key_col, sort=False).cumcount()
        cap = s[key_col].map(caps).fillna(0)
        return s.index.to_numpy()[(r < cap).to_numpy()]

    helpers = list(dict.fromkeys([key_col, order_col]))
    return per_bucket_take(ds, [key_col], helpers, kernel, num_buckets)


def anti_by_key(left, right_keys, key_col: str,
                num_buckets: int = DEFAULT_BUCKETS):
    """Arrow-native anti-join: drop ``left`` rows whose ``key_col`` value
    appears in ``right_keys`` (a one-column key Dataset). Unlike
    :func:`bucketed_join` the payload columns never round-trip through
    pandas (list columns survive intact): the right side is null-padded to
    the left schema, both shuffle ONCE on hash(key), and each partition
    filters with one vectorized ``pc.is_in`` — the dedup-against-prior-
    survivors shape of the retry/resume paths (VERDICT r4 #6)."""
    import pyarrow.compute as pc

    tag = "__side"
    lschema = None

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column(
            tag, pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    s = left.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        lschema = base
    elif all(isinstance(t, pa.DataType) for t in s.types):
        lschema = pa.schema(list(zip(s.names, s.types)))
    else:
        # pandas-block datasets report Python/numpy types — realize ONE
        # arrow batch for the authoritative schema (bounded: streaming
        # executor stops after the first batch)
        first = next(iter(left.iter_batches(batch_size=1,
                                            batch_format="pyarrow")))
        lschema = first.schema
    lnames = list(lschema.names)

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {}
        for name in lnames:
            if name == key_col:
                cols[name] = t.column(key_col).cast(
                    lschema.field(key_col).type)
            else:
                cols[name] = pa.nulls(t.num_rows,
                                      type=lschema.field(name).type)
        out = pa.table(cols)
        return out.append_column(
            tag, pa.array(np.ones(t.num_rows, dtype=np.int8)))

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right_keys.map_batches(pad_right, batch_format="pyarrow"))
    both = _add_bucket(both, [key_col], num_buckets)

    def kernel(g: pa.Table) -> pa.Table:
        if tag not in g.column_names:       # degenerate empty-stream block
            return g
        side = pc.equal(g.column(tag), 1)
        seen = g.filter(side).column(key_col)
        lrows = g.filter(pc.invert(side))
        if len(seen) == 0:
            return lrows.drop_columns([tag, BUCKET_COL])
        hit = pc.is_in(lrows.column(key_col), value_set=seen.combine_chunks())
        return lrows.filter(pc.invert(pc.fill_null(hit, False))) \
                    .drop_columns([tag, BUCKET_COL])

    if _hash_shuffle_on():
        return _partition_by_bucket(both, num_buckets).map_batches(
            kernel, batch_format="pyarrow", batch_size=None)
    return both.groupby(BUCKET_COL).map_groups(kernel,
                                               batch_format="pyarrow")


def window_rank(ds, key_cols: Sequence[str], order_by: Sequence[tuple[str, bool]],
                rank_col: str = "rank", num_buckets: int = DEFAULT_BUCKETS):
    """ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) - 1 as ``rank_col``."""
    keys = list(key_cols)
    cols = [c for c, _ in order_by]
    asc = [a for _, a in order_by]

    def kernel(df: pd.DataFrame):
        s = df.sort_values(cols, ascending=asc, kind="mergesort")
        ranks = s.groupby(keys, sort=False).cumcount().to_numpy()
        return s.index.to_numpy(), {rank_col: ranks.astype(np.int64)}

    helpers = list(dict.fromkeys(keys + cols))
    return per_bucket_take(ds, keys, helpers, kernel, num_buckets)


def bucketed_join(left, right, on: Sequence[str] | str, how: str = "inner",
                  num_buckets: int = DEFAULT_BUCKETS,
                  suffixes: tuple[str, str] = ("", "_r")):
    """Partitioned hash join of two Datasets on ``on``.

    Both sides get ``bucket = hash(key) % B``; a tagged union is shuffled once
    on bucket; each bucket is joined with a vectorized ``pd.merge``. This is
    the portable large-large join (ray_guide "Joins"); small right sides
    should use ``broadcast_join`` in ``stages/fetch.py`` instead (no shuffle).

    ``how``: inner/left/outer/semi/anti — keys are co-located per bucket,
    so per-bucket unmatched rows are globally unmatched and the full-outer
    result is exact.
    """
    on = [on] if isinstance(on, str) else list(on)
    tag = "__side"

    def _arrow_schema(ds) -> pa.Schema:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        fields = []
        for name, t in zip(s.names, s.types):
            if not isinstance(t, pa.DataType):
                dt = np.dtype(t)
                # pandas-backed blocks report object dtype for strings
                t = pa.string() if dt == object else pa.from_numpy_dtype(dt)
            fields.append((name, t))
        return pa.schema(fields)

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    lnames = list(lschema.names)
    # Non-key right columns that collide with left names get the suffix early
    # so the tagged union has one flat schema.
    rename = {n: (n if n in on or n not in lnames else n + suffixes[1])
              for n in rschema.names}
    rnames = [rename[n] for n in rschema.names]
    rtypes = dict(zip(rnames, rschema.types))
    ltypes = dict(zip(lnames, lschema.types))
    extra_for_left = [n for n in rnames if n not in lnames and n not in on]
    extra_for_right = [n for n in lnames if n not in rnames]
    all_names = lnames + extra_for_left

    def pad(batch: pa.Table, side: int) -> pa.Table:
        if side == 1:
            batch = batch.rename_columns([rename[n] for n in batch.column_names])
        missing = extra_for_left if side == 0 else extra_for_right
        types = rtypes if side == 0 else ltypes
        for name in missing:
            batch = batch.append_column(
                name, pa.nulls(batch.num_rows, type=types[name]))
        batch = batch.append_column(
            tag, pa.array(np.full(batch.num_rows, side, dtype=np.int8)))
        return batch.select(all_names + [tag])

    left_t = _add_bucket(
        left.map_batches(lambda b: pad(b, 0), batch_format="pyarrow"),
        on, num_buckets)
    right_t = _add_bucket(
        right.map_batches(lambda b: pad(b, 1), batch_format="pyarrow"),
        on, num_buckets)
    both = left_t.union(right_t)
    lkeep = lnames
    rkeep = on + [n for n in rnames if n not in on]

    # integer columns that arrive null-padded from the other side become
    # float64 in the pandas group view; the kernel therefore returns ARROW,
    # casting integer-typed columns back to their declared type so every
    # bucket emits one consistent schema (2^53 caveat on the float
    # round-trip: larger int values must use the arrow-native
    # per_bucket_take paths instead)
    import pyarrow.compute as pc

    target_types = {**rtypes, **ltypes}

    def kernel(g: pd.DataFrame) -> pa.Table:
        if tag not in g.columns:              # degenerate empty-stream block
            return pa.Table.from_pandas(g, preserve_index=False)
        l = g[g[tag] == 0][lkeep]
        r = g[g[tag] == 1][rkeep]
        if how == "semi":
            res = l[l.set_index(on).index.isin(r.set_index(on).index)]
        elif how == "anti":
            res = l[~l.set_index(on).index.isin(r.set_index(on).index)]
        else:
            res = l.merge(r, on=on, how=how)
        t = pa.Table.from_pandas(res, preserve_index=False)
        for i, name in enumerate(t.column_names):
            want = target_types.get(name)
            if (isinstance(want, pa.DataType) and t.column(name).type != want
                    and (pa.types.is_integer(want)
                         or pa.types.is_floating(want))):
                col = t.column(name)
                if (pa.types.is_floating(col.type)
                        and pa.types.is_integer(want)):
                    # left/outer joins pad unmatched rows with NaN; restore
                    # them as NULLs so the integer cast stays exact
                    col = pc.if_else(pc.is_nan(col),
                                     pa.scalar(None, col.type), col)
                t = t.set_column(i, name, pc.cast(col, want))
        return t

    if _hash_shuffle_on():
        # kernel projects columns explicitly, so the bucket column is inert
        return _partition_by_bucket(both, num_buckets).map_batches(
            kernel, batch_format="pandas", batch_size=None)
    return both.groupby(BUCKET_COL).map_groups(kernel, batch_format="pandas")
