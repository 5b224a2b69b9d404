"""Recrawl scheduler (stages/recrawl.py): serial-oracle equality, bucket
invariance, and the revisit-policy monotonicity contract."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pixcrawler_ray.stages.recrawl import (
    CHANGE_MOD, CHANGE_THRESHOLD, EPOCHS, _MULT_D, _MULT_E,
    recrawl_schedule, snapshot_history)


def _serial_expected(sf_dir: str) -> pd.DataFrame:
    """Pure-Python per-url recrawl schedule (the spec, row loop allowed)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    rows = []
    for d, text in zip(t.column("doc_id").to_pylist(),
                       t.column("text").to_pylist()):
        if d % 3 == 0:
            host = "h0"
        else:
            host = f"h{1 + (d * 2654435761) % 499}"
        path = f"/private/doc/{d}" if d % 50 == 7 else f"/doc/{d}"
        url = f"http://{host}.example.com{path}"
        ver, md5s = 0, []
        for e in range(EPOCHS):
            if e >= 1 and (d * _MULT_D + e * _MULT_E) \
                    % CHANGE_MOD < CHANGE_THRESHOLD:
                ver += 1
            md5s.append(hashlib.md5(
                f"{text or ''}|{ver}".encode()).hexdigest())
        changes = sum(1 for i in range(1, EPOCHS) if md5s[i] != md5s[i - 1])
        interval = max(1, (EPOCHS - 1) // (changes + 1))
        rows.append((url, changes, EPOCHS, (EPOCHS - 1) + interval))
    return (pd.DataFrame(rows, columns=["url", "changes", "n_snaps",
                                        "next_epoch"])
            .astype({"changes": "int64", "n_snaps": "int64",
                     "next_epoch": "int64"})
            .sort_values("url").reset_index(drop=True))


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("url").reset_index(drop=True)[
        ["url", "changes", "n_snaps", "next_epoch"]]


def test_recrawl_matches_serial_oracle(sf_tiny):
    got = _sorted(recrawl_schedule(sf_tiny).to_pandas())
    pd.testing.assert_frame_equal(got, _serial_expected(sf_tiny))


def test_recrawl_bucket_invariance(sf_tiny):
    a = _sorted(recrawl_schedule(sf_tiny, num_buckets=2).to_pandas())
    b = _sorted(recrawl_schedule(sf_tiny, num_buckets=16).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_recrawl_policy_monotone(sf_tiny):
    """More observed changes never push the next visit LATER (the Cho/G-M
    freshness intuition the integer policy must preserve)."""
    got = recrawl_schedule(sf_tiny).to_pandas()
    by_changes = got.groupby("changes")["next_epoch"].max().sort_index()
    assert (by_changes.diff().dropna() <= 0).all()
    # every url is revisited strictly after the horizon
    assert (got["next_epoch"] >= EPOCHS).all()


def test_snapshot_history_shape(sf_tiny):
    snaps = snapshot_history(sf_tiny)
    n_docs = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
    df = snaps.to_pandas()
    assert len(df) == n_docs * EPOCHS
    assert set(np.unique(df["epoch"])) == set(range(EPOCHS))
    # one checksum row per (url, epoch)
    assert not df.duplicated(["url", "epoch"]).any()


def test_url_template_counts(sf_tiny):
    """Template collapse sums to the url count; the hot host's /doc/{n}
    template dominates (the spider-trap signal)."""
    from pixcrawler_ray.stages.urlnorm import url_template_counts

    got = url_template_counts(sf_tiny).to_pandas()
    n_docs = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
    assert got["n"].sum() == n_docs
    assert set(got["template"]) <= {"/doc/{n}", "/private/doc/{n}"}
    hot = got[got["host"] == "h0.example.com"]
    assert hot["n"].sum() > n_docs // 4          # hot-host skew visible
    # bucket invariance
    alt = url_template_counts(sf_tiny, num_buckets=2).to_pandas()
    key = ["host", "template", "n"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        alt[key].sort_values(key).reset_index(drop=True))
