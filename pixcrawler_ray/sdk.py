"""SDK-shaped convenience reader over a committed crawl output directory.

Engine analog of the reference's client SDK ``load_dataset``
(`sdk/pixcrawler/core.py:82-500`): there it downloads a dataset by id with
retries, a hard in-memory size guardrail, and returns a list-like
``Dataset`` wrapper; here the "service" is a :func:`write_partitioned`
output directory, so loading is a LAZY ``ray.data.read_parquet`` over the
committed partitions only (uncommitted ``_tmp-part=*`` staging dirs are
never visible — the atomic-rename commit protocol guarantees it), and the
eager conveniences keep the same guardrail semantics: materializing more
than ``max_memory_bytes`` raises instead of silently OOMing the driver.

The lazy path is the 100 TB path — ``load_dataset(out).ds`` streams; the
eager helpers exist for the small-result ergonomics the SDK had.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pyarrow as pa

from pixcrawler_ray.state.checkpoint import completed_partitions, read_manifest

_DEFAULT_MAX_MEMORY = 300 * 1024 * 1024  # the SDK's 300 MB guardrail


class LocalDataset:
    """List-like wrapper around a lazy Ray Dataset (SDK ``Dataset`` analog).

    ``.ds`` is the lazy handle (stream it); ``len``/``take``/``to_pandas``
    are the eager conveniences, guarded: any materialization that would
    exceed ``max_memory_bytes`` raises ``RuntimeError`` like the SDK's
    download-size check did.
    """

    def __init__(self, ds, manifest_rows: list[dict],
                 max_memory_bytes: int = _DEFAULT_MAX_MEMORY):
        self.ds = ds
        self.manifest = manifest_rows
        self.max_memory_bytes = max_memory_bytes
        # manifest rows carry exact committed sizes — the guardrail check
        # is O(partitions), no data read
        self._bytes = sum(int(m.get("bytes", 0)) for m in manifest_rows)
        self._rows = sum(int(m.get("rows", 0)) for m in manifest_rows)

    def __len__(self) -> int:
        return self._rows

    def _guard(self, nbytes: int, what: str) -> None:
        if nbytes > self.max_memory_bytes:
            raise RuntimeError(
                f"{what} ({nbytes / 1048576:.2f}MB) exceeds memory limit "
                f"({self.max_memory_bytes / 1048576:.0f}MB); iterate the "
                f"lazy handle (.ds.iter_batches()) instead")

    def take(self, n: int = 20) -> list[dict]:
        return self.ds.take(n)

    def to_table(self) -> pa.Table:
        self._guard(self._bytes, "dataset")
        batches = list(self.ds.iter_batches(batch_size=65536,
                                            batch_format="pyarrow"))
        return (pa.concat_tables(batches) if batches
                else pa.table({}))

    def to_pandas(self):
        return self.to_table().to_pandas()

    def __iter__(self):
        return self.ds.iter_rows()


def load_dataset(out_dir: str, columns: Optional[Sequence[str]] = None,
                 limit: Optional[int] = None,
                 max_memory_bytes: int = _DEFAULT_MAX_MEMORY) -> LocalDataset:
    """Open a committed crawl/curation output directory lazily.

    Reads only partitions the manifest has committed (crash-safe view),
    column-pruned at the parquet reader. ``limit`` is applied lazily.
    Raises ``FileNotFoundError`` for a directory with no committed output
    (the SDK raised on a missing dataset id).
    """
    import ray.data as rd

    done = completed_partitions(out_dir)
    if not done:
        raise FileNotFoundError(
            f"no committed partitions under {out_dir!r} (missing or "
            f"unfinished run — nothing to load)")
    paths = [os.path.join(out_dir, f"part={p}", "data.parquet")
             for p in sorted(done)]
    ds = rd.read_parquet(paths, columns=list(columns) if columns else None)
    if limit is not None:
        ds = ds.limit(limit)
    manifest = [m for m in read_manifest(out_dir)
                if m.get("stage") == "extracted"
                and m["partition"] in done]
    return LocalDataset(ds, manifest, max_memory_bytes=max_memory_bytes)
