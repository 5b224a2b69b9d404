"""Column-statistics profiler — the engine-side ANALYZE/statistics
collection every query planner and data-quality gate needs (count, null
count, min/max per column), expressed Ray-Data-first: each batch emits a
CONSTANT-sized partial (one row per profiled column), one tiny keyed
exchange merges them, and nothing corpus-sized ever aggregates centrally.

No reference analog (PixCrawler profiles nothing); the shape is the
standard per-column sufficient-statistics sketch. Numeric min/max merge in
the integer domain (floats as exact cents); the output stringifies AFTER
the merge so the registry row is hash-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pixcrawler_ray.sources.readers import read_table

# (column, kind): kind selects the exact-merge domain — int64 as-is,
# 2-decimal floats as cents, strings byte-lexicographic (ASCII corpus:
# matches DuckDB VARCHAR min/max).
DEFAULT_SPECS: dict[str, list[tuple[str, str]]] = {
    "orders": [("o_orderkey", "int"), ("o_custkey", "int"),
               ("o_orderstatus", "str"), ("o_totalprice", "cents"),
               ("o_orderpriority", "str")],
    "documents": [("doc_id", "int"), ("lang", "str"), ("source", "str")],
}

_I64_MIN = np.iinfo(np.int64).min
_I64_MAX = np.iinfo(np.int64).max


def profile_table(sf_dir: str, table: str = "orders",
                  spec: list[tuple[str, str]] | None = None,
                  num_buckets: int = 4):
    """Profile ``table``: per column, row count, null count, min and max.

    Returns (col, n, n_null, min_v, max_v) with min/max stringified after
    the typed merge. Scale shape: partials are one row per column per
    batch; the merge exchange is O(columns x batches) tiny rows.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    specs = spec or DEFAULT_SPECS[table]
    cols = [c for c, _ in specs]
    ds = read_table(sf_dir, table, columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for col, kind in specs:
            arr = t.column(col)
            n = len(arr)
            n_null = arr.null_count
            row = {"col": col, "kind": kind, "n": n, "n_null": n_null,
                   "min_i": _I64_MAX, "max_i": _I64_MIN,
                   "min_s": None, "max_s": None}
            if n > n_null:
                if kind == "str":
                    mm = pc.min_max(arr)
                    row["min_s"] = mm["min"].as_py()
                    row["max_s"] = mm["max"].as_py()
                else:
                    if kind == "cents":
                        v = pc.round(pc.multiply(arr.cast(pa.float64()),
                                                 pa.scalar(100.0)))
                        arr = v.cast(pa.int64())
                    else:
                        arr = arr.cast(pa.int64())
                    mm = pc.min_max(arr)
                    row["min_i"] = mm["min"].as_py()
                    row["max_i"] = mm["max"].as_py()
            rows.append(row)
        df = pd.DataFrame(rows)
        df["min_s"] = df["min_s"].astype("object")
        df["max_s"] = df["max_s"].astype("object")
        return pa.Table.from_pandas(df, preserve_index=False,
                                    schema=pa.schema([
                                        ("col", pa.string()),
                                        ("kind", pa.string()),
                                        ("n", pa.int64()),
                                        ("n_null", pa.int64()),
                                        ("min_i", pa.int64()),
                                        ("max_i", pa.int64()),
                                        ("min_s", pa.string()),
                                        ("max_s", pa.string()),
                                    ]))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (col, kind), grp in g.groupby(["col", "kind"], sort=False):
            n = int(grp["n"].sum())
            n_null = int(grp["n_null"].sum())
            if kind == "str":
                vals = grp["min_s"].dropna()
                mn = vals.min() if len(vals) else ""
                vals = grp["max_s"].dropna()
                mx = vals.max() if len(vals) else ""
            else:
                mni = int(grp["min_i"].min())
                mxi = int(grp["max_i"].max())
                mn = str(mni) if mni != _I64_MAX else ""
                mx = str(mxi) if mxi != _I64_MIN else ""
            out.append({"col": col, "n": n, "n_null": n_null,
                        "min_v": str(mn), "max_v": str(mx)})
        return pd.DataFrame(out,
                            columns=["col", "n", "n_null", "min_v",
                                     "max_v"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return per_bucket(partials, ["col"], merge, num_buckets=num_buckets)


def exact_quantiles(sf_dir: str, table: str = "events", col: str = "value",
                    qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                    kind: str = "cents", num_bins: int = 512,
                    num_buckets: int = 4):
    """EXACT quantiles over an arbitrary integer-domain column by
    iterative bracket refinement — the scale path for percentiles when the
    value domain is too wide for the bounded-domain histogram trick
    (textstats.token_quantiles) and a full distributed sort is overkill:

    each pass streams the column once, computes per-batch fixed-width
    histograms restricted to each quantile's current [lo, hi] bracket
    (constant ``num_bins`` x ``len(qs)`` partial rows per batch), merges
    them through one tiny keyed exchange, then narrows every bracket to
    the bin containing its target rank. Bracket width shrinks by
    ``num_bins`` x per pass, so passes = ceil(log_bins(range)) — 2 passes
    for a 2-decimal [0, 1e6) domain — and the driver only ever sees the
    merged constant-sized histogram. The discrete-rank rule is DuckDB's
    ``quantile_disc``: idx = max(0, ceil(q*n) - 1), making the result
    value-hash oracleable (cents are order-preserving, so quantile of the
    cents equals cents of the quantile).

    Returns a pandas frame (q, n, value_i) with value_i in the integer
    (cents) domain.
    """
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, table, columns=[col])

    def to_int(t: pa.Table) -> np.ndarray:
        arr = t.column(col)
        arr = arr.drop_null() if arr.null_count else arr
        if kind == "cents":
            arr = pc.round(pc.multiply(arr.cast(pa.float64()),
                                       pa.scalar(100.0)))
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)

    # pass 0: n, lo, hi (one streaming scan, 1-row partials)
    def mm_partial(t: pa.Table) -> pa.Table:
        v = to_int(t)
        if len(v) == 0:
            return pa.table({"k": pa.array([0]), "n": pa.array([0]),
                             "lo": pa.array([_I64_MAX]),
                             "hi": pa.array([_I64_MIN])})
        return pa.table({"k": pa.array([0]),
                         "n": pa.array([np.int64(len(v))]),
                         "lo": pa.array([v.min()]),
                         "hi": pa.array([v.max()])})

    def mm_merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [0], "n": [g["n"].sum()],
                             "lo": [g["lo"].min()], "hi": [g["hi"].max()]})

    # merge the 1-row partials DISTRIBUTEDLY (one keyed reduce) so the
    # driver sees exactly one row, not one per batch — at 100 TB the
    # per-batch concat would be an O(num_batches) driver materialization
    mm = per_bucket(ds.map_batches(mm_partial, batch_format="pyarrow"),
                    ["k"], mm_merge, num_buckets=1).to_pandas()
    n = int(mm["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": list(qs), "n": 0, "value_i": np.int64(0)})
    lo0, hi0 = int(mm["lo"].min()), int(mm["hi"].max())
    # quantile_disc rank rule (0-based), per q
    import math
    state = []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        state.append({"q": q, "lo": lo0, "hi": hi0, "rank": idx})

    while any(s["lo"] < s["hi"] for s in state):
        active = [i for i, s in enumerate(state) if s["lo"] < s["hi"]]
        brackets = [(state[i]["lo"], state[i]["hi"]) for i in active]
        widths = [max(1, -(-(hi - lo + 1) // num_bins))
                  for lo, hi in brackets]

        def hist_partial(t: pa.Table, _b=brackets, _w=widths,
                         _a=active) -> pa.Table:
            v = to_int(t)
            ks, bins, cnts = [], [], []
            for qi, (lo, hi), w in zip(_a, _b, _w):
                sel = v[(v >= lo) & (v <= hi)]
                if len(sel) == 0:
                    continue
                b = (sel - lo) // w
                c = np.bincount(b)
                nz = np.flatnonzero(c)
                ks.append(np.full(len(nz), qi, dtype=np.int64))
                bins.append(nz.astype(np.int64))
                cnts.append(c[nz].astype(np.int64))
            if not ks:
                return pa.table({"k": pa.array([], type=pa.int64()),
                                 "bin": pa.array([], type=pa.int64()),
                                 "cnt": pa.array([], type=pa.int64())})
            return pa.table({"k": pa.array(np.concatenate(ks)),
                             "bin": pa.array(np.concatenate(bins)),
                             "cnt": pa.array(np.concatenate(cnts))})

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return (g.groupby(["k", "bin"], sort=False)["cnt"].sum()
                     .reset_index())

        hist = per_bucket(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            ["k"], merge, num_buckets=num_buckets).to_pandas()
        for qi, (lo, hi), w in zip(active, brackets, widths):
            h = hist[hist["k"] == qi].sort_values("bin")
            cum = h["cnt"].cumsum().to_numpy()
            pos = int(np.searchsorted(cum, state[qi]["rank"] + 1))
            b = int(h["bin"].iloc[pos])
            below = int(cum[pos - 1]) if pos > 0 else 0
            state[qi]["rank"] -= below
            state[qi]["lo"] = lo + b * w
            state[qi]["hi"] = min(hi, lo + (b + 1) * w - 1)

    return pd.DataFrame({"q": [s["q"] for s in state], "n": n,
                         "value_i": np.int64([s["lo"] for s in state])})
