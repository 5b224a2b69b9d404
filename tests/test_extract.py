"""The per-row invariant: extract(render(text)) == text, byte-identical,
serial oracle == Ray pipeline (FIXTURES.md §4.1)."""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq
import pytest

from pixcrawler_ray import corpus, extract


def test_render_extract_roundtrip_unit():
    for d, text in [(0, "hello world"), (5, "a & b < c"), (12, ""),
                    (7, "x" * 1000)]:
        html = corpus.render_html(d, text)
        out_text, links, valid = extract.extract_one(html)
        assert valid
        assert out_text == text
        assert links == corpus.image_links_for(d)


def test_malformed_pages_extract_empty():
    d = corpus.MALFORMED_REM  # 13 -> truncated
    html = corpus.render_html(d, "some text that will be cut off entirely")
    assert len(html) == corpus.MALFORMED_PREFIX_LEN
    text, links, valid = extract.extract_one(html)
    assert (text, links, valid) == ("", [], False)


def test_extract_invariant_ray_vs_serial(sf_tiny):
    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    # serial oracle: ground truth text per url
    serial = {}
    for d, t in zip(docs.column("doc_id").to_pylist(),
                    docs.column("text").to_pylist()):
        url = corpus.urls_for(__import__("numpy").array([d]))[0]
        html = corpus.render_html(d, t)
        text, _, valid = extract.extract_one(html)
        gt = "" if d % corpus.MALFORMED_MOD == corpus.MALFORMED_REM else t
        assert text == gt, f"doc {d}: extraction not byte-identical"
        serial[url] = hashlib.md5(text.encode()).hexdigest()

    pages = corpus.pages_dataset(sf_tiny)
    extracted = extract.extracted_dataset(pages)
    got = extracted.select_columns(["url", "text", "valid"]).take_all()
    assert len(got) == docs.num_rows
    for row in got:
        assert hashlib.md5(row["text"].encode()).hexdigest() == serial[row["url"]]


def test_ground_truth_column_matches_extraction(sf_tiny):
    """pages.text (ground truth) == extracted text for every url."""
    pages = corpus.pages_dataset(sf_tiny)
    rows = pages.take(50)
    for r in rows:
        text, _, _ = extract.extract_one(r["html"])
        assert text == r["text"]
