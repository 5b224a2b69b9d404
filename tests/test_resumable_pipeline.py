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


def _parse_report_table(md: str, section: str) -> list[list[str]]:
    lines = md.splitlines()
    i = lines.index(f"## {section}")
    rows = []
    for ln in lines[i + 3:]:          # skip header + separator
        if not ln.startswith("|"):
            break
        rows.append([c.strip() for c in ln.strip("|").split("|")])
    return rows


def test_report_reconciles_with_quarantine(sf_tiny, tmp_path):
    """The report's Keywords/Errors sections must reconcile exactly with the
    quarantine trail and the committed row counts (reference report parity,
    utility/report_generator.py:29-352)."""
    from pixcrawler_ray.state import checkpoint

    cfg = CrawlConfig.from_dict(CFG)
    out = str(tmp_path / "crawl_rep")
    summary = resumable.resumable_crawl(cfg, sf_tiny, out, num_partitions=4)
    md = open(summary["report_path"]).read()

    kw_rows = _parse_report_table(md, "Keywords")
    downloads = {r[0]: int(r[1]) for r in kw_rows}
    failures = {r[0]: int(r[2]) for r in kw_rows}
    err_rows = _parse_report_table(md, "Errors")
    reasons = {r[0]: int(r[1]) for r in err_rows}

    # downloads reconcile with the committed output
    out_t = checkpoint.read_output(out)
    per_kw = {}
    for kw in out_t.column("keyword").to_pylist():
        per_kw[kw] = per_kw.get(kw, 0) + 1
    assert downloads == per_kw
    assert sum(downloads.values()) == summary["total_rows"]

    # failures + error reasons reconcile with the quarantine trail
    q = checkpoint.read_quarantine(out).to_pandas()
    # keywords with zero failures render as 0 rows — compare the nonzero set
    assert {k: v for k, v in failures.items() if v} == \
        {k: int(v) for k, v in q.groupby("keyword").size().items()}
    assert reasons == {k: int(v) for k, v in
                       q.groupby("reason").size().items()}
    assert sum(reasons.values()) == summary["quarantined"]


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


def test_resumable_curation_crash_and_resume(sf_tiny, tmp_path):
    """Curation sweep: crash after 1 committed partition, resume, output
    byte-identical to an uninterrupted run."""
    import pytest

    from pixcrawler_ray.pipelines.curation import resumable_curation
    from pixcrawler_ray.state import checkpoint

    full_dir = str(tmp_path / "full")
    resumable_curation(sf_tiny, full_dir, num_partitions=4)
    full = checkpoint.read_output(full_dir)

    crash_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError):
        resumable_curation(sf_tiny, crash_dir, num_partitions=4,
                           fail_after=1)
    assert len(checkpoint.completed_partitions(crash_dir)) == 1
    resumable_curation(sf_tiny, crash_dir, num_partitions=4)
    resumed = checkpoint.read_output(crash_dir)

    assert resumed.num_rows == full.num_rows > 0
    assert resumed.sort_by([("seq", "ascending")]).equals(
        full.sort_by([("seq", "ascending")]))


def test_attribute_tagger_resume_and_mixer_decoupling(sf_tiny, tmp_path):
    """Dolma-shape taggers commit atomically and resume skips complete
    ones; the mixer re-runs with a different rule WITHOUT re-tagging
    (the decoupling that makes filter sweeps cheap at scale)."""
    import os

    import pytest

    from pixcrawler_ray.pipelines.attributes import (mix_corpus,
                                                     tag_attributes)

    out = str(tmp_path / "attrs")
    with pytest.raises(RuntimeError, match="simulated crash"):
        tag_attributes(sf_tiny, out, fail_after=1)
    assert os.path.exists(os.path.join(out, "attr=textstat", "_DONE"))
    assert not os.path.exists(os.path.join(out, "attr=pii", "_DONE"))

    paths = tag_attributes(sf_tiny, out)
    assert sorted(paths) == ["dup", "pii", "textstat"]
    mtimes = {n: os.path.getmtime(os.path.join(p, "_DONE"))
              for n, p in paths.items()}
    # re-run: all three skipped (markers untouched)
    tag_attributes(sf_tiny, out)
    for n, p in paths.items():
        assert os.path.getmtime(os.path.join(p, "_DONE")) == mtimes[n]

    base = mix_corpus(sf_tiny, out).to_pandas()
    strict = mix_corpus(sf_tiny, out, min_tokens=50).to_pandas()
    assert 0 < len(strict) < len(base)
    assert (strict["n_tokens"] >= 50).all()
    assert set(strict["doc_id"]) <= set(base["doc_id"])


def test_build_from_crawl_stage_resume_byte_identical(sf_tiny, tmp_path):
    """The complete web->training-shards composition: crash before stage
    2, resume skips the committed crawl + curation stages, and the final
    shard manifest equals an uninterrupted build's."""
    import pytest

    from pixcrawler_ray.pipelines.corpusbuild import build_from_crawl
    from pixcrawler_ray.stages.expand import CrawlConfig

    cfg = CrawlConfig.from_dict({
        "dataset_name": "v",
        "categories": {"cats": ["cat", "kitten"], "dogs": ["dog"]},
        "options": {"max_images": 20}})
    out = str(tmp_path / "bfc")
    with pytest.raises(RuntimeError, match="before stage 2"):
        build_from_crawl(cfg, sf_tiny, out, fail_stage=2)
    m, rep = build_from_crawl(cfg, sf_tiny, out)
    assert rep["stage0_skipped"] and rep["stage1_skipped"]
    assert not rep["stage2_skipped"]
    assert rep["stage0_rows"] > 0

    m2, _ = build_from_crawl(cfg, sf_tiny, str(tmp_path / "bfc2"))
    cols = ["shard_id", "n_samples", "payload_bytes", "tar_bytes"]
    a = m.to_pandas().sort_values("shard_id").reset_index(drop=True)[cols]
    b = m2.to_pandas().sort_values("shard_id").reset_index(drop=True)[cols]
    assert a.equals(b)
