"""Distributed BPE merge-table training (Sennrich et al. 2016 §3.2, the
TRAIN side — ``functions/bpe.py`` is the inference side that applies a
learned table).

Scale shape: the only corpus-sized pass is the word count (map-side
combined, one keyed exchange). Everything after runs on the DISTINCT-word
table with counts — Heaps-law bounded (vocabulary grows ~O(corpus^0.5)),
which is exactly why production BPE trainers (e.g. the HuggingFace
tokenizers trainer) operate on a word-count table rather than the raw
corpus. Each merge iteration is: a vocab-sized pair-count exchange
(map-side combined), a distributed argmax whose driver share is one row
per block, and a vocab-sized merge application. Nothing corpus-sized ever
reaches the driver.

Reference analog: the reference has no trainer; its keyword munging
(``builder/_keywords.py``) is the closest text-table shape. The serial
spec lives in ``functions/bpe.py:train_bpe_serial`` and the equality is
pinned in pytest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pixcrawler_ray.sources.readers import read_table
from pixcrawler_ray.stages.shuffle import per_bucket


def word_counts(sf_dir: str, num_buckets: int = 16):
    """documents.text -> (word, cnt) — the one corpus-sized pass.
    Per-batch value_counts is the map-side combine; the exchange then
    moves one row per (batch, distinct word), not per token."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["text"].fillna("").str.split().explode().dropna()
        vc = vc[vc.str.len() > 0].value_counts()
        return pd.DataFrame({"word": vc.index.astype(str),
                             "cnt": vc.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", sort=False)["cnt"].sum().reset_index()
        return out

    return per_bucket(parts, ["word"], combine, num_buckets=num_buckets)


def _apply_merge_rows(parts_col: list[list[str]], a: str,
                      b: str) -> list[list[str]]:
    """Leftmost-first simultaneous merge of adjacent (a, b) -> a+b, the
    Sennrich scan order (so 'aaa' + (a,a) -> ['aa','a'])."""
    ab = a + b
    out = []
    for p in parts_col:
        if len(p) < 2:
            out.append(p)
            continue
        q, i, n = [], 0, len(p)
        while i < n:
            if i < n - 1 and p[i] == a and p[i + 1] == b:
                q.append(ab)
                i += 2
            else:
                q.append(p[i])
                i += 1
        out.append(q)
    return out


def bpe_train(sf_dir: str, num_merges: int = 12,
              num_buckets: int = 16) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over the corpus vocabulary.

    Per iteration: (1) pair counts via map_batches with per-batch combine
    + one vocab-sized keyed exchange, (2) distributed argmax — each block
    emits its best (cnt desc, then lexicographic (a, b)) candidate, the
    driver reduces one row per block, (3) the winning merge applies
    vocab-side as a map_batches over the parts table, materialized so the
    next iteration does not replay the whole lineage (vocab-sized by
    Heaps' law — the documented memory model). Tie-break is total
    (cnt, a, b), so the merge sequence is deterministic and equal to the
    serial spec ``functions.bpe.train_bpe_serial``.

    Returns a DataFrame (rank, a, b) of the learned merge table.
    """
    vocab = word_counts(sf_dir, num_buckets=num_buckets)

    def init_parts(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        return pa.table({
            "cnt": t.column("cnt").cast(pa.int64()),
            "parts": pa.array([list(w) for w in words],
                              type=pa.list_(pa.string())),
        })

    parts_ds = vocab.map_batches(
        init_parts, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []

    def pair_partials(t: pa.Table) -> pd.DataFrame:
        cnts = t.column("cnt").to_numpy(zero_copy_only=False)
        col = t.column("parts").to_pylist()
        acc: dict[tuple[str, str], int] = {}
        for c, p in zip(cnts, col):
            for i in range(len(p) - 1):
                k = (p[i], p[i + 1])
                acc[k] = acc.get(k, 0) + int(c)
        if not acc:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64)})
        ks = list(acc)
        return pd.DataFrame({"a": [k[0] for k in ks],
                             "b": [k[1] for k in ks],
                             "cnt": np.fromiter(acc.values(), np.int64)})

    def best_per_block(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["a", "b"], sort=False)["cnt"].sum().reset_index()
        tot = tot.sort_values(["cnt", "a", "b"],
                              ascending=[False, True, True],
                              kind="mergesort")
        return tot.head(1)

    for _ in range(num_merges):
        partials = parts_ds.map_batches(pair_partials,
                                        batch_format="pyarrow")
        # one row PER BLOCK reaches the driver, never the pair table
        cands = per_bucket(partials, ["a", "b"], best_per_block,
                           num_buckets=num_buckets).to_pandas()
        cands = cands[cands["cnt"] > 0]
        if cands.empty:
            break
        cands = cands.sort_values(["cnt", "a", "b"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        a, b = str(cands.iloc[0]["a"]), str(cands.iloc[0]["b"])
        merges.append((a, b))

        def apply(t: pa.Table, a=a, b=b) -> pa.Table:
            col = _apply_merge_rows(t.column("parts").to_pylist(), a, b)
            return pa.table({
                "cnt": t.column("cnt"),
                "parts": pa.array(col, type=pa.list_(pa.string())),
            })

        parts_ds = parts_ds.map_batches(
            apply, batch_format="pyarrow").materialize()

    return pd.DataFrame({
        "rank": np.arange(len(merges), dtype=np.int64),
        "a": [m[0] for m in merges],
        "b": [m[1] for m in merges],
    })
