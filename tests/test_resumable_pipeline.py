"""Deployable resumable crawl + simhash near-dup verification."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pixcrawler_ray.pipelines import resumable
from pixcrawler_ray.stages.expand import CrawlConfig

CFG = {
    "dataset_name": "resumable_fixture",
    "categories": {"cats": ["cat"], "dogs": ["dog"]},
    "options": {"max_images": 12},
}


def test_resumable_crawl_full_and_rerun(sf_tiny, tmp_path):
    cfg = CrawlConfig.from_dict(CFG)
    out = str(tmp_path / "crawl_out")
    summary = resumable.resumable_crawl(cfg, sf_tiny, out, num_partitions=4)
    assert summary["rows"] > 0
    assert os.path.exists(summary["report_path"])
    assert summary["dataset_metadata"]["categories_count"] == 2
    # re-run: all partitions committed -> nothing new, same totals
    again = resumable.resumable_crawl(cfg, sf_tiny, out, num_partitions=4)
    assert again["partitions_committed"] == 0
    assert again["total_rows"] == summary["total_rows"]
    assert again["epoch"] == summary["epoch"] + 1


def test_simhash_near_pairs_within_radius(sf_tiny):
    from pixcrawler_ray.functions.minhash import simhash64
    from pixcrawler_ray.stages.dedup import simhash_near_pairs
    import pyarrow.parquet as pq

    pairs = simhash_near_pairs(sf_tiny, radius=3).to_pandas()
    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs.doc_id, docs.text))
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ha = np.uint64(simhash64(text_of[a]))
        hb = np.uint64(simhash64(text_of[b]))
        dist = bin(int(ha) ^ int(hb)).count("1")
        assert dist <= 3, (a, b, dist)
    # brute-force ground truth on a slice: blocking must not miss pairs
    sample = docs.head(120)
    sims = {d: simhash64(t) for d, t in zip(sample.doc_id, sample.text)}
    want = set()
    ids = list(sims)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(sims[ids[i]] ^ sims[ids[j]]).count("1") <= 3:
                want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    got = {(a, b) for a, b in zip(pairs.doc_a, pairs.doc_b)
           if a in sims and b in sims}
    assert want <= got
