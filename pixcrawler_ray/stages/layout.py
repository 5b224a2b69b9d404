"""Physical-layout operators: Z-order clustering and partition compaction.

At 100 TB the dominant cost of every later scan is LAYOUT — which rows sit
in which files. Two standard remedies, Ray-Data-first:

- ``zorder_layout``: assign each row a Morton (Z-order) key interleaving
  the bits of two bounded dimensions, then bucket rows by key prefix — the
  multi-dimensional clustering trick (used by Delta/Iceberg OPTIMIZE
  ZORDER) that makes range predicates on EITHER dimension prune most
  files. Pure integer arithmetic => SQL-replayable.
- ``compact_partitions``: rewrite a directory of many small parquet files
  into ~target-row files WITHOUT a shuffle (file-granular coalescing), the
  maintenance pass every incremental/checkpointed writer needs.

No reference analog (PixCrawler stores blobs); the shapes are public
lakehouse-maintenance patterns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pixcrawler_ray.sources.readers import read_table


def _interleave_bits(a: np.ndarray, b: np.ndarray, bits: int) -> np.ndarray:
    """Morton key: bit i of ``a`` -> bit 2i, bit i of ``b`` -> bit 2i+1.
    Vectorized over int64 inputs already clamped to ``bits`` bits."""
    z = np.zeros(len(a), dtype=np.int64)
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout(sf_dir: str, bits: int = 8, num_files: int = 16):
    """Z-order clustering key for the documents table over the two scan
    dimensions a 100 TB curation pipeline filters by most — language
    (hashed to ``bits`` bits) and document length (log2-bucketed to
    ``bits`` bits) — plus the file bucket each row would land in
    (top ``log2(num_files)`` bits of the Morton key).

    Stateless map (no shuffle needed to COMPUTE the layout; the physical
    rewrite is one ``repartition``-by-bucket write). Output
    (doc_id, z, file_bucket), all int64, exact SQL replay via integer
    bit arithmetic.
    """
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    shift = 2 * bits - int(num_files - 1).bit_length()

    def kernel(t: pa.Table) -> pa.Table:
        # lang dimension: stable tiny-domain hash (byte sum * MINSTD step)
        lang = t.column("lang")
        d = lang.combine_chunks().dictionary_encode()
        uh = np.array(
            [sum(s.encode()) * 48271 % 2147483647 % (1 << bits)
             for s in d.dictionary.to_pylist()], dtype=np.int64)
        lh = uh[d.indices.to_numpy(zero_copy_only=False)]
        # length dimension: floor(log2(len+1)) clamped to bits
        ln = pc.binary_length(t.column("text")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lb = np.minimum(
            np.int64(np.floor(np.log2(ln + 1))), (1 << bits) - 1)
        z = _interleave_bits(lh, lb.astype(np.int64), bits)
        return pa.table({"doc_id": t.column("doc_id").cast(pa.int64()),
                         "z": pa.array(z),
                         "file_bucket": pa.array(z >> shift)})

    return ds.map_batches(kernel, batch_format="pyarrow")


def compact_partitions(in_dir: str, out_dir: str,
                       target_rows: int = 100_000):
    """Coalesce a directory of small parquet files into ~``target_rows``
    files: plan file groups by ROW COUNT from parquet footers only (no
    data read on the driver), then one distributed pass reads each group
    and writes one output file — file-granular, no row shuffle, resumable
    by group (each group commits its own file; rerun skips existing).

    Returns (n_input_files, n_output_files).
    """
    import os

    import pyarrow.parquet as pq
    import ray

    files = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))
    counts = [pq.read_metadata(os.path.join(in_dir, f)).num_rows
              for f in files]
    groups, cur, cur_rows = [], [], 0
    for f, c in zip(files, counts):
        cur.append(f)
        cur_rows += c
        if cur_rows >= target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
    if cur:
        groups.append(cur)

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def compact(gi: int, names: list[str]) -> int:
        out = os.path.join(out_dir, f"compact-{gi:05d}.parquet")
        if os.path.exists(out):           # resume: group already committed
            return 0
        t = pa.concat_tables([pq.read_table(os.path.join(in_dir, n))
                              for n in names])
        tmp = out + ".tmp"
        pq.write_table(t, tmp)
        os.rename(tmp, out)
        return 1

    ray.get([compact.remote(i, g) for i, g in enumerate(groups)])
    return len(files), len(groups)
