"""Ray pipeline vs serial oracle: seen-set, admission schedule, budget,
extracted bytes (FIXTURES.md §4.2-4.5)."""

from __future__ import annotations

import pytest

from pixcrawler_ray import oracle
from pixcrawler_ray.pipelines import crawl
from pixcrawler_ray.stages.expand import CrawlConfig

CFG = {
    "dataset_name": "fixture_dataset",
    "categories": {"cats": ["cat", "kitten"], "dogs": ["dog", "puppy"],
                   "birds": []},
    "options": {"max_images": 20, "max_retries": 3,
                "keyword_generation": "disabled", "generate_labels": True},
}


@pytest.fixture(scope="module")
def config():
    return CrawlConfig.from_dict(CFG)


@pytest.fixture(scope="module")
def oracle_res(config, request):
    sf = "/root/testdata/sf0.001"
    return oracle.run_oracle(config, sf, budget_per_round=8)


def test_frontier_and_seen_set(config, oracle_res, sf_tiny):
    fr = crawl.build_frontier(config, sf_tiny, budget_per_round=8)
    rows = fr.take_all()
    got = {(r["url"], r["seq"]) for r in rows}
    want = {(r["url"], r["seq"]) for r in oracle_res.frontier}
    assert got == want


def test_admission_schedule(config, oracle_res, sf_tiny):
    fr = crawl.build_frontier(config, sf_tiny, budget_per_round=8)
    rows = fr.take_all()
    got = sorted((r["round"], r["host"], r["host_rank"], r["url"])
                 for r in rows)
    assert got == oracle_res.admission


def test_extracted_bytes_and_dedup(config, oracle_res, sf_tiny):
    index_ref = crawl.pages_index_ref(sf_tiny)
    extracted, _ = crawl.crawl_generation(config, sf_tiny, index_ref,
                                          budget_per_round=8)
    rows = extracted.take_all()
    got = {r["url"]: (r["text"], bytes(r["content_md5"]), r["seq"])
           for r in rows}
    want = {r["url"]: (r["text"], r["content_md5"], r["seq"])
            for r in oracle_res.extracted}
    assert set(got) == set(want), (
        f"url sets differ: extra={set(got) - set(want)}, "
        f"missing={set(want) - set(got)}")
    for url, (text, md5, seq) in want.items():
        assert got[url] == (text, md5, seq), f"mismatch at {url}"


def test_budget_cap(config, oracle_res, sf_tiny):
    """Per keyword at most max_images OK rows survive, first by seq."""
    index_ref = crawl.pages_index_ref(sf_tiny)
    extracted, _ = crawl.crawl_generation(config, sf_tiny, index_ref,
                                          budget_per_round=8)
    want_by_url = {r["url"] for r in oracle_res.budget_survivors}
    rows = extracted.take_all()
    assert all(r["url"] in want_by_url for r in rows)
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["keyword"]] = counts.get(r["keyword"], 0) + 1
    assert all(v <= config.max_images for v in counts.values())


def test_transient_retry_generation(config, oracle_res, sf_tiny):
    """Gen-1 re-fetches exactly the oracle's transient urls and they succeed."""
    index_ref = crawl.pages_index_ref(sf_tiny)
    _, transient = crawl.crawl_generation(config, sf_tiny, index_ref,
                                          budget_per_round=8)
    t = transient.take_all()
    assert {r["url"] for r in t} == set(oracle_res.transient_urls)
    assert all(r["depth"] == 1 for r in t)
    # full multi-generation run terminates and includes at least gen-0 output
    out = crawl.run_crawl(config, sf_tiny, budget_per_round=8)
    urls = {r["url"] for r in out.select_columns(["url"]).take_all()}
    assert urls >= {r["url"] for r in oracle_res.extracted}
