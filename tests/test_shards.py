"""Tar shard sink: round-trip, byte determinism, resume skip."""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa

from pixcrawler_ray.pipelines import shards


def _digest_dir(d: str) -> dict:
    return {os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(f"{d}/shard-*.tar"))}


def test_tar_shards_roundtrip_and_determinism(ray_session, sf_tiny, tmp_path):
    import ray.data as rd
    payloads = {i: bytes([i % 251]) * (10 + i * 7 % 300) for i in range(50)}
    ds = rd.from_arrow(pa.table({
        "doc_id": list(payloads), "payload": list(payloads.values())}))
    out1 = str(tmp_path / "a")
    m = shards.write_tar_shards(ds, out1, samples_per_shard=16).to_pandas()
    assert sorted(m["shard_id"]) == [0, 1, 2, 3]
    assert m["n_samples"].sum() == 50
    # round-trip: every payload back, named by key, sorted within shard
    got = {}
    for p in sorted(glob.glob(f"{out1}/shard-*.tar")):
        entries = shards.read_tar_shard(p)
        names = [n for n, _ in entries]
        assert names == sorted(names)
        for n, b in entries:
            got[int(n.split(".")[0])] = b
    assert got == payloads
    # byte determinism: a second run elsewhere produces identical bytes
    out2 = str(tmp_path / "b")
    shards.write_tar_shards(ds, out2, samples_per_shard=16).to_pandas()
    assert list(_digest_dir(out1).values()) == list(_digest_dir(out2).values())
    # manifest tar_bytes matches the files on disk
    sizes = {os.path.basename(p): os.path.getsize(p)
             for p in glob.glob(f"{out1}/shard-*.tar")}
    for _, r in m.iterrows():
        assert sizes[f"shard-{int(r['shard_id']):05d}.tar"] == r["tar_bytes"]


def test_tar_shards_resume_skips_committed(ray_session, tmp_path):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(20)), "payload": [b"x" * 40] * 20}))
    out = str(tmp_path / "r")
    shards.write_tar_shards(ds, out, samples_per_shard=10).to_pandas()
    p0 = f"{out}/shard-00000.tar"
    marker = os.path.getmtime(p0)
    # second run must not rewrite the committed shard
    shards.write_tar_shards(ds, out, samples_per_shard=10).to_pandas()
    assert os.path.getmtime(p0) == marker


def test_shard_pages_manifest(ray_session, sf_tiny, tmp_path):
    m = shards.shard_pages(sf_tiny, str(tmp_path / "p"),
                           samples_per_shard=16).to_pandas()
    assert (m["n_samples"] <= 16).all()
    assert (m["payload_bytes"] > 0).all()
    assert "path" not in m.columns


def test_heavy_hitter_bigrams_exact_and_k_invariant(ray_session, sf_tiny):
    """MG candidates + verify must equal the exact GROUP BY..HAVING answer,
    and a SMALLER candidate budget (wider per-batch threshold) must not
    change the output — the approximation only widens the candidate set."""
    import collections

    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.sketch import heavy_hitter_bigrams

    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["text"]).to_pandas()
    big = collections.Counter()
    for t in docs["text"]:
        ws = t.split()
        big.update(zip(ws[:-1], ws[1:]))
    n = sum(big.values())
    k = 1000
    want = sorted((w1, w2, c) for (w1, w2), c in big.items()
                  if c * (k + 1) > n)
    got = heavy_hitter_bigrams(sf_tiny, k=k).to_pandas()
    got_t = sorted(zip(got["w1"], got["w2"], got["cnt"]))
    assert got_t == want
    assert len(want) > 0
    # same k-threshold applied, but candidate pass run at a 5x larger
    # budget: output must be identical — a wider candidate superset never
    # changes the exact final filter
    got2 = heavy_hitter_bigrams(sf_tiny, k=k, candidate_k=5 * k)
    got2_t = sorted(zip(*(got2.to_pandas()[c] for c in ("w1", "w2", "cnt"))))
    assert got2_t == got_t


def test_read_shards_dataset_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    payloads = {i: bytes([i % 7 + 1]) * (5 + i) for i in range(30)}
    ds = rd.from_arrow(pa.table({
        "doc_id": list(payloads), "payload": list(payloads.values())}))
    out = str(tmp_path / "w")
    shards.write_tar_shards(ds, out, samples_per_shard=8).to_pandas()
    back = shards.read_shards_dataset(out).to_pandas()
    assert len(back) == 30
    got = {int(n.split(".")[0]): p for n, p in zip(back["name"],
                                                   back["payload"])}
    assert got == payloads
    assert (back["shard_id"] == back["name"].str.split(".").str[0]
            .astype(int) // 8).all()


def test_heavy_hitter_candidate_collect_is_bounded(ray_session, tmp_path):
    """The driver-side candidate collect must be bounded by the DISTINCT
    candidate count (the distributed dedup), not O(k x num_batches): 4000
    one-line docs force multiple map batches, all emitting the SAME three
    bigrams — the driver must see exactly 3 candidate rows."""
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.sketch import heavy_hitter_bigrams

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    n = 4000
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["alpha beta alpha gamma"] * n)}),
        f"{sf}/documents.parquet")
    stats = {}
    got = heavy_hitter_bigrams(sf, k=10, stats=stats).to_pandas()
    # distinct bigrams: (alpha,beta) (beta,alpha) (alpha,gamma)
    assert stats["driver_candidate_rows"] == 3
    assert sorted(zip(got["w1"], got["w2"])) == [
        ("alpha", "beta"), ("alpha", "gamma"), ("beta", "alpha")]
    assert (got["cnt"] == n).all()


def test_stale_shard_is_rewritten(ray_session, tmp_path):
    """Resume must not silently reuse a shard file whose size disagrees
    with the deterministic USTAR size of the CURRENT payloads."""
    import ray.data as rd

    out = str(tmp_path / "t")
    ds1 = rd.from_arrow(pa.table({
        "doc_id": list(range(10)), "payload": [b"x" * 8] * 10}))
    shards.write_tar_shards(ds1, out, samples_per_shard=10).to_pandas()
    d1 = _digest_dir(out)
    # corpus changed underneath the same out_dir: payload sizes differ
    ds2 = rd.from_arrow(pa.table({
        "doc_id": list(range(10)), "payload": [b"y" * 9000] * 10}))
    m2 = shards.write_tar_shards(ds2, out, samples_per_shard=10).to_pandas()
    d2 = _digest_dir(out)
    assert d1 != d2, "stale shard was reused"
    assert int(m2["payload_bytes"].iloc[0]) == 90000
    assert int(m2["tar_bytes"].iloc[0]) == os.path.getsize(
        f"{out}/shard-00000.tar")


def test_warc_roundtrip_resume_and_byte_arithmetic(ray_session, sf_tiny,
                                                   tmp_path):
    """WARC sink: byte-deterministic files whose size equals the pure
    arithmetic the SQL oracle replays; the streaming reader inverts the
    writer exactly; a second run skips every committed file; a stale file
    is rewritten."""
    import os

    from pixcrawler_ray import corpus
    from pixcrawler_ray.pipelines.warc import (RECORD_FIXED_BYTES,
                                               read_warc_dir, warc_pages)

    out = str(tmp_path / "w")
    m = warc_pages(sf_tiny, out).to_pandas().sort_values("file_id")
    pages = corpus.pages_dataset(sf_tiny).to_pandas().sort_values("doc_id")
    assert m.n_records.sum() == len(pages)
    # manifest bytes == on-disk bytes == the oracle's arithmetic
    for _, r in m.iterrows():
        path = os.path.join(out, f"part-{int(r.file_id):05d}.warc")
        assert os.path.getsize(path) == r.warc_bytes
    ids = pages.doc_id.to_numpy()
    urls = corpus.urls_hosts_arrow(ids)[0].to_pylist()
    expect = sum(RECORD_FIXED_BYTES + len(u) + len(str(len(bytes(h))))
                 + len(bytes(h)) for u, h in zip(urls, pages.html))
    assert m.warc_bytes.sum() == expect

    back = read_warc_dir(out).to_pandas().sort_values("doc_id")
    assert list(back.doc_id) == list(pages.doc_id)
    assert list(back.url) == urls
    assert all(bytes(a) == bytes(b)
               for a, b in zip(back.payload, pages.html))

    mtimes = {p: os.path.getmtime(os.path.join(out, p))
              for p in os.listdir(out)}
    warc_pages(sf_tiny, out).to_pandas()          # resume: all skipped
    assert mtimes == {p: os.path.getmtime(os.path.join(out, p))
                      for p in os.listdir(out)}

    stale = os.path.join(out, "part-00000.warc")
    with open(stale, "ab") as f:                  # corrupt -> size mismatch
        f.write(b"x")
    warc_pages(sf_tiny, out).to_pandas()
    assert os.path.getsize(stale) == int(
        m.loc[m.file_id == 0, "warc_bytes"].iloc[0])   # rewritten


def test_build_training_corpus_stages_and_resume(ray_session, sf_tiny,
                                                 tmp_path):
    """The 3-stage corpus build must (a) produce byte-identical shards to
    an uninterrupted run after a mid-build crash, (b) skip finished stages
    on resume (stage-1 output untouched), and (c) produce shards whose
    payloads reassemble the segment-deduped curated docs."""
    import glob
    import os

    import pytest

    from pixcrawler_ray.pipelines.corpusbuild import build_training_corpus

    full = tmp_path / "full"
    m1, r1 = build_training_corpus(sf_tiny, str(full))
    assert r1["n_shards"] > 0 and not r1["stage1_skipped"]

    crash = tmp_path / "crash"
    with pytest.raises(RuntimeError, match="stage 2"):
        build_training_corpus(sf_tiny, str(crash), fail_stage=2)
    # the atomically-renamed documents dir IS the stage-1 commit marker
    assert (crash / "stage1_curated" / "documents").is_dir()
    mtime_before = os.path.getmtime(crash / "stage1_curated" / "documents")
    m2, r2 = build_training_corpus(sf_tiny, str(crash))
    assert r2["stage1_skipped"] and not r2["stage2_skipped"]
    assert os.path.getmtime(
        crash / "stage1_curated" / "documents") == mtime_before
    # a THIRD run of a finished build must short-circuit every stage to
    # manifest reads (no recompute, no re-pack)
    m3, r3 = build_training_corpus(sf_tiny, str(crash))
    assert r3["stage1_skipped"] and r3["stage2_skipped"] \
        and r3["stage3_skipped"]
    assert r3["n_shards"] == r2["n_shards"]

    a = sorted(glob.glob(str(full / "stage3_shards" / "*.tar")))
    b = sorted(glob.glob(str(crash / "stage3_shards" / "*.tar")))
    assert [os.path.basename(p) for p in a] == \
        [os.path.basename(p) for p in b]
    for pa_, pb in zip(a, b):
        assert open(pa_, "rb").read() == open(pb, "rb").read()
    assert r1["stage2_rows"] == r2["stage2_rows"] > 0


def test_cdx_index_seeks_byte_exact(sf_tiny, tmp_path):
    """The CDX index's (file, offset, length) triples must actually work
    as ranged reads against the written WARC archives: seek + read +
    parse every sampled record and match its id and framing."""
    import os

    from pixcrawler_ray.pipelines.warc import cdx_index, warc_pages

    out = str(tmp_path / "warc")
    warc_pages(sf_tiny, out).materialize()
    idx = cdx_index(sf_tiny).to_pandas()
    assert len(idx) > 0
    sample = idx.sample(min(20, len(idx)), random_state=0)
    for _, r in sample.iterrows():
        path = os.path.join(out, f"part-{int(r.file_id):05d}.warc")
        with open(path, "rb") as f:
            f.seek(int(r.offset))
            blob = f.read(int(r.length))
        end = blob.index(b"\r\n\r\n") + 4
        hdr = dict(line.split(": ", 1) for line in
                   blob[:end].decode().split("\r\n")[1:] if ": " in line)
        rid = int(hdr["WARC-Record-ID"]
                  .removeprefix("<urn:pixcrawler:").rstrip(">"))
        assert rid == int(r.doc_id)
        assert end + int(hdr["Content-Length"]) + 4 == int(r.length)
