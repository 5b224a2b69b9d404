"""WARC-style archive sink + streaming reader: the canonical webcrawl
archive format (ISO 28500 / Common Crawl layout), deterministic at the
byte level so the manifest is SQL-oracleable and a crashed run resumes by
skipping committed files.

The reference exports crawled datasets as archives
(``backend/services/dataset_export.py`` shape); the crawl-side analog is
the WARC convention: sequentially numbered ``.warc`` files of bounded
record count, each record a response header block + payload. Layout rule
is DETERMINISTIC (``file_id = doc_id // records_per_file``, records sorted
by doc_id, fixed WARC-Date, fixed-width record ids), so a re-run is
byte-identical and the per-record size is pure arithmetic:
``RECORD_FIXED_BYTES + len(url) + digits(len(payload)) + len(payload)`` —
the same expression the SQL oracle replays (the tar sink's USTAR-size
trick, ``shards._tar_len``).

Scale shape: one keyed bucket shuffle on ``file_id`` (each file's records
co-locate in one kernel), bytes assembled in-memory per file (bounded by
records_per_file x payload size) and committed atomically (tmp+rename).
The reader is one task per file — bounded by construction.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

WARC_DATE = "2026-01-01T00:00:00Z"     # fixed archive date: determinism
_HDR = ("WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        "WARC-Record-ID: <urn:pixcrawler:{rid:012d}>\r\n"
        "WARC-Date: " + WARC_DATE + "\r\n"
        "WARC-Target-URI: {url}\r\n"
        "Content-Type: text/html\r\n"
        "Content-Length: {n}\r\n"
        "\r\n")
# header/trailer bytes excluding the variable url and content-length
# digits: len of _HDR with rid 12 digits, url '' and n '' + the \r\n\r\n
# record trailer. The SQL oracle replays this constant.
RECORD_FIXED_BYTES = len(_HDR.format(rid=0, url="", n="").encode()) + 4


def warc_record(doc_id: int, url: str, payload: bytes) -> bytes:
    hdr = _HDR.format(rid=doc_id, url=url, n=len(payload))
    return hdr.encode() + payload + b"\r\n\r\n"


def write_warc_files(ds, out_dir: str, records_per_file: int = 64):
    """Write (doc_id, url, payload) rows into ``out_dir/part-%05d.warc``
    and return the manifest dataset (file_id, n_records, payload_bytes,
    warc_bytes, path). Committed files whose size matches the
    deterministic byte arithmetic of the CURRENT rows are skipped
    (resume); stale files are rewritten."""
    from pixcrawler_ray.stages.shuffle import per_bucket

    os.makedirs(out_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        keys = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "file_id", pa.array(keys // records_per_file))

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for fid, g in df.groupby("file_id", sort=True):
            g = g.sort_values("doc_id", kind="mergesort")
            payloads = [bytes(p) for p in g["payload"]]
            urls = list(g["url"])
            ids = g["doc_id"].to_numpy()
            expect = sum(
                RECORD_FIXED_BYTES + len(u) + len(str(len(p))) + len(p)
                for u, p in zip(urls, payloads))
            path = os.path.join(out_dir, f"part-{int(fid):05d}.warc")
            if os.path.exists(path) and os.path.getsize(path) == expect:
                n_bytes = expect
            else:
                blob = b"".join(
                    warc_record(int(i), u, p)
                    for i, u, p in zip(ids, urls, payloads))
                assert len(blob) == expect   # arithmetic IS the format
                n_bytes = len(blob)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)        # atomic commit
            rows.append({"file_id": int(fid), "n_records": len(g),
                         "payload_bytes": int(sum(map(len, payloads))),
                         "warc_bytes": int(n_bytes), "path": path})
        return pd.DataFrame(rows)

    return per_bucket(ds.map_batches(assign, batch_format="pyarrow"),
                      ["file_id"], pack)


def read_warc_file(path: str) -> list[tuple[int, str, bytes]]:
    """Streaming parse of one WARC file -> (doc_id, url, payload) records
    in archive order. Content-Length-driven (never scans payload bytes for
    delimiters — payloads may contain header-like text)."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        end = data.index(b"\r\n\r\n", pos) + 4
        hdr = data[pos:end].decode()
        fields = {}
        for line in hdr.split("\r\n")[1:]:
            if ": " in line:
                k, v = line.split(": ", 1)
                fields[k] = v
        n = int(fields["Content-Length"])
        payload = data[end:end + n]
        rid = int(fields["WARC-Record-ID"]
                  .removeprefix("<urn:pixcrawler:").rstrip(">"))
        out.append((rid, fields["WARC-Target-URI"], payload))
        pos = end + n + 4                       # record trailer \r\n\r\n
    return out


def read_warc_dir(out_dir: str):
    """Stream a WARC directory back as a Dataset (doc_id, url, payload) —
    one read task per file, bounded memory by construction."""
    import ray.data as rd

    paths = sorted(os.path.join(out_dir, p) for p in os.listdir(out_dir)
                   if p.endswith(".warc"))

    def parse(batch: dict) -> pa.Table:
        ids, urls, payloads = [], [], []
        for p in batch["path"]:
            for rid, url, payload in read_warc_file(p):
                ids.append(rid)
                urls.append(url)
                payloads.append(payload)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "url": pa.array(urls, type=pa.string()),
                         "payload": pa.array(payloads, type=pa.binary())})

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse, batch_size=1)


def cdx_index(sf_dir: str, records_per_file: int = 64,
              num_buckets: int = 8):
    """CDX-style random-access index over the WARC layout — what Common
    Crawl publishes beside its archives (the CDX(J) index: per record,
    which file and which byte range, so one record is fetchable with a
    single ranged read instead of a file scan). Because the archive
    layout is deterministic, every offset is PURE ARITHMETIC: record size
    = RECORD_FIXED_BYTES + len(url) + digits(len(payload)) + len(payload)
    and a record's offset is the exclusive per-file prefix sum of the
    sizes before it (records sorted by doc_id within file).

    Distributed shape: one stateless map computes per-record sizes (urls
    rebuilt arithmetically — the html payload column never moves), then
    ONE file_id-keyed exchange runs a vectorized exclusive cumsum with
    file-boundary resets. Output (doc_id, file_id, rec_idx, offset,
    length), all int64; the pytest proves the offsets by actually
    seeking the written archives.
    """
    from pixcrawler_ray import corpus
    from pixcrawler_ray.stages.shuffle import per_bucket

    pages = corpus.pages_dataset(sf_dir)

    def sizes(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        url, _ = corpus.urls_hosts_arrow(ids)
        ulen = pc.utf8_length(url).to_numpy(zero_copy_only=False)
        nb = pc.binary_length(
            t.column("html").cast(pa.binary())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        digits = np.char.str_len(nb.astype(np.int64).astype(str))
        rec = RECORD_FIXED_BYTES + ulen + digits + nb
        return pa.table({
            "doc_id": pa.array(ids),
            "file_id": pa.array(ids // records_per_file),
            "rec_bytes": pa.array(rec.astype(np.int64))})

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["file_id", "doc_id"], kind="mergesort")
        rec = df["rec_bytes"].to_numpy().astype(np.int64)
        fid = df["file_id"].to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(rec)[:-1]])
        starts = np.flatnonzero(np.concatenate(
            [[True], fid[1:] != fid[:-1]]))
        reps = np.diff(np.append(starts, len(fid)))
        offset = cum - np.repeat(cum[starts], reps)
        rec_idx = np.arange(len(fid)) - np.repeat(starts, reps)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "file_id": fid,
            "rec_idx": rec_idx.astype(np.int64),
            "offset": offset.astype(np.int64),
            "length": rec})

    return per_bucket(pages.map_batches(sizes, batch_format="pyarrow"),
                      ["file_id"], kernel, num_buckets=num_buckets)


def warc_pages(sf_dir: str, out_dir: str, records_per_file: int = 64):
    """Archive the virtual page corpus (html keyed by doc_id + crawl url)
    — the query-registry entry point. Returns the manifest minus the
    host-local ``path`` column."""
    from pixcrawler_ray import corpus

    pages = corpus.pages_dataset(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        url, _ = corpus.urls_hosts_arrow(ids)
        return pa.table({"doc_id": t.column("doc_id"), "url": url,
                         "payload": t.column("html").cast(pa.binary())})

    manifest = write_warc_files(pages.map_batches(
        project, batch_format="pyarrow"), out_dir,
        records_per_file=records_per_file)
    return manifest.map_batches(
        lambda t: t.select(["file_id", "n_records", "payload_bytes",
                            "warc_bytes"]),
        batch_format="pyarrow")
