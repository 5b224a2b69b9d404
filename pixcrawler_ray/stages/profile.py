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
