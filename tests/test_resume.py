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
