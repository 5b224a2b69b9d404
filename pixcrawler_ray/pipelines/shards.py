"""WebDataset-style tar shard sink: pack (key, payload) samples into
sequentially numbered ``.tar`` shards of bounded sample count, byte-
deterministically, with a per-shard manifest.

The reference archives datasets as zip/tar trees after the crawl
(``backend/services/dataset_export.py`` shape — archive-per-dataset); the
training-side analog is the WebDataset convention: many same-sized tar
shards a dataloader can stream and shuffle. Sharding rule is DETERMINISTIC
(``shard_id = seq // samples_per_shard`` over a dense integer sequence), so
a re-run produces byte-identical shards and a crashed run can skip
completed ones (atomic tmp+rename commit per shard, same protocol as
``state/checkpoint.py``).

Scale shape: one keyed bucket shuffle on ``shard_id`` (each shard's samples
co-locate in one kernel call), tar bytes assembled in-memory per shard
(bounded by samples_per_shard × payload size) and written once. No driver
materialization; the returned manifest is one row per shard.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa


def _tar_bytes(names: list[str], payloads: list[bytes]) -> bytes:
    """Deterministic tar: fixed mtime/uid/gid/mode, entries in given order
    (USTAR format — no pax headers that embed timestamps)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in zip(names, payloads):
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def _tar_len(payload_sizes) -> int:
    """Deterministic USTAR archive size for the given payload sizes (the
    same arithmetic the SQL oracle replays): 512 B header + 512-padded data
    per entry, 1024 B end marker, padded to the 10240 B record size."""
    body = sum(512 + -(-int(n) // 512) * 512 for n in payload_sizes) + 1024
    return -(-body // 10240) * 10240


def write_tar_shards(ds, out_dir: str, key_col: str = "doc_id",
                     payload_col: str = "payload",
                     samples_per_shard: int = 64,
                     name_suffix: str = ".bin"):
    """Write ``ds`` into ``out_dir/shard-%05d.tar`` and return the manifest
    dataset (shard_id, n_samples, payload_bytes, tar_bytes, path).

    ``key_col`` must be a dense-enough integer id: ``shard_id =
    key // samples_per_shard`` (gaps just make smaller shards — still
    deterministic). Entries are named ``{key:012d}{name_suffix}`` and sorted
    by key within the shard. Already-present shards are skipped (resume) —
    which assumes ``out_dir`` is a SHARED filesystem (object store / NFS)
    on a multi-node cluster, and that a given out_dir is never reused with
    different sharding parameters (callers should key the directory by
    them, as ``__ray_entry__.tar_shards_q`` does)."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "shard_id", pa.array(keys // samples_per_shard))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for sid, g in df.groupby("shard_id", sort=True):
            g = g.sort_values(key_col, kind="mergesort")
            payloads = [bytes(p) for p in g[payload_col]]
            path = os.path.join(out_dir, f"shard-{int(sid):05d}.tar")
            # resume: a committed shard is free — but only if its size
            # matches the deterministic USTAR size of the CURRENT payloads
            # (a stale file from a changed corpus is rewritten, not mixed
            # into the manifest)
            expect = _tar_len(len(p) for p in payloads)
            if os.path.exists(path) and os.path.getsize(path) == expect:
                tar_len = expect
            else:
                names = [f"{int(k):012d}{name_suffix}" for k in g[key_col]]
                blob = _tar_bytes(names, payloads)
                tar_len = len(blob)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)         # atomic commit
            rows.append({"shard_id": int(sid), "n_samples": len(g),
                         "payload_bytes": int(sum(map(len, payloads))),
                         "tar_bytes": tar_len, "path": path})
        return pd.DataFrame(rows)

    return per_bucket(ds.map_batches(assign, batch_format="pyarrow"),
                      ["shard_id"], pack)


def read_tar_shard(path: str) -> list[tuple[str, bytes]]:
    """Read one shard back as (name, payload) pairs, in archive order."""
    out = []
    with tarfile.open(path, mode="r") as tf:
        for m in tf.getmembers():
            out.append((m.name, tf.extractfile(m).read()))
    return out


def shard_pages(sf_dir: str, out_dir: str, samples_per_shard: int = 64):
    """Shard the virtual page corpus (html bytes keyed by doc_id) — the
    query-registry entry point. Returns the manifest minus the local
    ``path`` column (paths are host-local, not value-hashable)."""
    from pixcrawler_ray import corpus

    pages = corpus.pages_dataset(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "payload": t.column("html")})

    ds = pages.map_batches(project, batch_format="pyarrow")
    manifest = write_tar_shards(ds, out_dir,
                                samples_per_shard=samples_per_shard,
                                name_suffix=".html")
    return manifest.map_batches(
        lambda t: t.drop_columns(["path"]), batch_format="pyarrow")


def read_shards_dataset(out_dir: str):
    """Stream shards back as a Dataset of (shard_id, name, payload) — the
    dataloader side of the WebDataset convention. ``read_binary_files``
    yields one row per shard (bytes + path); a flat ``map_batches`` untars
    each in-memory. Shard files are bounded by construction
    (samples_per_shard × payload), so per-task memory is bounded too; a
    100 TB corpus is just more shard files, each an independent task."""
    import ray.data as rd

    ds = rd.read_binary_files(out_dir, include_paths=True)

    def untar(t: pa.Table) -> pa.Table:
        sids, names, payloads = [], [], []
        for path, blob in zip(t.column("path").to_pylist(),
                              t.column("bytes").to_pylist()):
            base = os.path.basename(path)
            if not (base.startswith("shard-") and base.endswith(".tar")):
                continue
            sid = int(base[len("shard-"):-len(".tar")])
            with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tf:
                for m in tf.getmembers():
                    sids.append(sid)
                    names.append(m.name)
                    payloads.append(tf.extractfile(m).read())
        return pa.table({"shard_id": pa.array(sids, type=pa.int64()),
                         "name": pa.array(names, type=pa.string()),
                         "payload": pa.array(payloads, type=pa.binary())})

    return ds.map_batches(untar, batch_format="pyarrow")
