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
    """M14 — per-record payload recompression.

    The codec call is per-record BY SEMANTICS (the reference compresses each
    image file individually, ``utility/compress``), so the zlib C call can't
    batch — but the inputs are sliced ZERO-COPY from the Arrow value buffer
    via the offsets vector (one memoryview per batch, no per-row ``bytes``
    materialization), so the only per-row Python cost is the codec call
    itself, which dominates anyway.
    """
    import numpy as np

    def comp(t: pa.Table) -> pa.Table:
        arr = t.column(column).combine_chunks()
        n = len(arr)
        width, dtype = ((8, np.int64)
                        if pa.types.is_large_binary(arr.type)
                        else (4, np.int32))
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=dtype, count=n + 1,
                             offset=arr.offset * width)
        data = memoryview(bufs[2]) if bufs[2] is not None \
            else memoryview(b"")
        valid = (arr.is_valid().to_numpy(zero_copy_only=False)
                 if arr.null_count else np.ones(n, dtype=bool))
        out = [zlib.compress(data[offs[i]:offs[i + 1]], level)
               if valid[i] else None for i in range(n)]
        idx = t.schema.get_field_index(column)
        return t.set_column(idx, column, pa.array(out, type=pa.binary()))

    return ds.map_batches(comp, batch_format="pyarrow")


def archive_output(out_dir: str, archive_path: str | None = None,
                   fmt: str = "gz") -> str:
    """Driver-side archive of a finished output directory (export
    convenience only — small outputs). All three reference formats
    (``utility/compress/formats.py:1-181``): ``gz`` -> .tar.gz,
    ``zip`` -> .zip, ``zst`` -> .tar.zst (pyarrow zstd codec over an
    uncompressed tar)."""
    base = out_dir.rstrip("/")
    arcname = os.path.basename(base)
    if fmt == "gz":
        archive_path = archive_path or base + ".tar.gz"
        with tarfile.open(archive_path, "w:gz") as tar:
            tar.add(out_dir, arcname=arcname)
    elif fmt == "zip":
        import zipfile
        archive_path = archive_path or base + ".zip"
        with zipfile.ZipFile(archive_path, "w",
                             compression=zipfile.ZIP_DEFLATED) as zf:
            for root, _, files in os.walk(out_dir):
                for f in sorted(files):
                    full = os.path.join(root, f)
                    rel = os.path.join(arcname,
                                       os.path.relpath(full, out_dir))
                    zf.write(full, rel)
    elif fmt == "zst":
        archive_path = archive_path or base + ".tar.zst"
        # framed zstd stream (readable by any zstd tool /
        # pa.CompressedInputStream) around an uncompressed tar
        with pa.CompressedOutputStream(archive_path, "zstd") as out, \
                tarfile.open(fileobj=out, mode="w") as tar:
            tar.add(out_dir, arcname=arcname)
    else:
        raise ValueError(f"unknown archive format {fmt!r} "
                         "(expected gz | zip | zst)")
    return archive_path
