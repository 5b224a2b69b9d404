"""Size-aware parquet reads (S11 analog — the SDK's chunked reader).

Ray's default read planning targets ~200 blocks regardless of input size; a
5k-row dimension table then becomes 64 blocks of 78 rows and every downstream
stage pays 64x task overhead. This helper sizes ``override_num_blocks`` from
parquet metadata: ~``target_rows`` rows per block, capped by cluster CPUs —
the same formula yields hundreds of blocks on a 100 TB input and ONE block on
a dimension table. Column pruning stays mandatory at the call site.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import ray
import ray.data as rd

DEFAULT_TARGET_ROWS = 32_768


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               target_rows: int = DEFAULT_TARGET_ROWS):
    import os

    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path) or not os.path.exists(path):
        # sharded table (directory of parquet files — the 100 TB layout):
        # row count from footers only, no data pages touched
        dir_path = path if os.path.isdir(path) else f"{sf_dir}/{name}"
        import pyarrow.dataset as pads
        n = pads.dataset(dir_path, format="parquet").count_rows()
        path = dir_path
    else:
        n = pq.read_metadata(path).num_rows
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    blocks = max(1, min(math.ceil(n / target_rows), 4 * cpus))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=blocks)


def ingest_table(path: str, fmt: str | None = None,
                 columns: list[str] | None = None):
    """Format-dispatching ingest for external corpora: parquet (native),
    jsonl, or csv — the formats web-text drops actually arrive in (WARC
    derivatives ship as jsonl.gz; metadata sidecars as csv). Non-parquet
    inputs stream through Ray's native readers and then project to the
    requested columns, so a one-time ``ingest -> write_parquet`` conversion
    is the same pipeline as a direct query.

    ``fmt`` defaults from the file suffix. Column pruning happens at the
    read only for parquet (the columnar format); jsonl/csv must parse rows
    anyway, so the projection is a stage.
    """
    import ray.data as _rd

    if fmt is None:
        low = path.lower()
        fmt = ("parquet" if low.endswith(".parquet")
               else "jsonl" if low.endswith((".jsonl", ".json"))
               else "csv" if low.endswith(".csv") else None)
        if fmt is None:
            raise ValueError(
                f"cannot infer ingest format from suffix of {path!r}; "
                "pass fmt='parquet' | 'jsonl' | 'csv' explicitly")
    if fmt == "parquet":
        return _rd.read_parquet(path, columns=columns)
    if fmt == "jsonl":
        ds = _rd.read_json(path)
    elif fmt == "csv":
        ds = _rd.read_csv(path)
    else:
        raise ValueError(f"unsupported ingest format: {fmt}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def pool_size(fraction: float = 0.5, minimum: int = 1) -> int:
    """Deterministic actor-pool size proportional to cluster CPUs.

    Autoscaling pools ((1, N)) ramp on queue depth and often stay tiny for
    short jobs — run-to-run variance and poor scaling. A fixed pool sized to
    a fraction of the cluster is deterministic and leaves CPU slots for the
    surrounding task stages.
    """
    import ray as _ray
    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(minimum, int(cpus * fraction))
