"""S9/M14 — compression sinks (utility/compress analog).

The reference batch-compresses output directories with zstd/tar/zip across a
thread pool (``utility/compress/pipeline.py:36-60``,
``utility/compress/compressor.py:1-129``). Columnar equivalents:

- dataset-level: ``write_parquet`` with a zstd/gzip codec (pyarrow builtin;
  compression happens inside the distributed write tasks — the "thread pool"
  is the cluster).
- record-level (M14 per-image recompression): a ``map_batches`` stage that
  zlib-recompresses the binary payload column.
- archive: a driver-side tar of a finished output directory (small outputs /
  export convenience only).
"""

from __future__ import annotations

import os
import tarfile
import zlib

import pyarrow as pa


def write_compressed_parquet(ds, out_dir: str, codec: str = "zstd",
                             level: int | None = None):
    """Distributed compressed columnar sink."""
    kwargs = {"compression": codec}
    if level is not None:
        kwargs["compression_level"] = level
    ds.write_parquet(out_dir, **kwargs)
    return out_dir


def recompress_payloads(ds, column: str = "html", level: int = 6):
    """M14 — per-record payload recompression as a vectorized batch stage."""

    def comp(t: pa.Table) -> pa.Table:
        data = [None if v is None else zlib.compress(v, level)
                for v in t.column(column).to_pylist()]
        idx = t.schema.get_field_index(column)
        return t.set_column(idx, column, pa.array(data, type=pa.binary()))

    return ds.map_batches(comp, batch_format="pyarrow")


def archive_output(out_dir: str, archive_path: str | None = None) -> str:
    """Driver-side tar.gz of a finished output directory (export path)."""
    archive_path = archive_path or out_dir.rstrip("/") + ".tar.gz"
    with tarfile.open(archive_path, "w:gz") as tar:
        tar.add(out_dir, arcname=os.path.basename(out_dir.rstrip("/")))
    return archive_path
