"""Text analysis stages: token counting, quality scoring, language-ID,
document fingerprinting — over the ``documents`` table.

The reference's only text processing is keyword munging
(``builder/_keywords.py``); these are the corpus-quality operators a
training-data pipeline adds (C4/Gopher-style heuristics from the public
literature), each a vectorized ``map_batches`` stage.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from pixcrawler_ray.functions.hashing import rolling_fingerprint
from pixcrawler_ray.sources.readers import read_table

# BPE-ish token splitter: words, numbers, or single non-space symbols
_TOKEN_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")

_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been for on with as at by it"
    .split()
)


def token_stats_batch(t: pa.Table) -> pa.Table:
    """n_tokens (whitespace), n_bpe_tokens (regex), n_chars per doc.

    Whitespace count is SQL-mirrorable (len(string_split)); the BPE-ish regex
    count is the engine-side token estimator.
    """
    texts = t.column("text").to_pylist()
    ws = np.fromiter((len((x or "").split()) for x in texts), dtype=np.int64,
                     count=len(texts))
    bpe = np.fromiter((len(_TOKEN_RE.findall(x or "")) for x in texts),
                      dtype=np.int64, count=len(texts))
    chars = pc.utf8_length(t.column("text")).cast(pa.int64())
    out = t.drop_columns(["text"])
    out = out.append_column("n_tokens", pa.array(ws))
    out = out.append_column("n_bpe_tokens", pa.array(bpe))
    return out.append_column("n_chars_computed", chars)


def token_counts(sf_dir: str):
    """Per-lang aggregate of whitespace token counts (SQL-oracled)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    stats = ds.map_batches(token_stats_batch, batch_format="pyarrow")
    return (stats.groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="sum_tokens"),
                       Sum("n_chars_computed", alias_name="sum_chars")))


def quality_score_batch(t: pa.Table) -> pa.Table:
    """Gopher-style quality signals, all integer-exact for oracle hashing:

    - n_tokens, n_chars
    - stop_hits: tokens that are stopwords
    - max_word_len
    - quality_ok: 5 <= n_tokens and mean word len in [2, 12] (scaled int cmp)
    """
    texts = t.column("text").to_pylist()
    n = len(texts)
    n_tok = np.zeros(n, dtype=np.int64)
    stop_hits = np.zeros(n, dtype=np.int64)
    max_w = np.zeros(n, dtype=np.int64)
    sum_w = np.zeros(n, dtype=np.int64)
    for i, x in enumerate(texts):
        words = (x or "").split()
        n_tok[i] = len(words)
        stop_hits[i] = sum(1 for w in words if w in _STOPWORDS)
        max_w[i] = max((len(w) for w in words), default=0)
        sum_w[i] = sum(len(w) for w in words)
    ok = (n_tok >= 5) & (2 * n_tok <= sum_w) & (sum_w <= 12 * n_tok)
    out = t.drop_columns(["text"])
    out = out.append_column("n_tokens", pa.array(n_tok))
    out = out.append_column("stop_hits", pa.array(stop_hits))
    out = out.append_column("max_word_len", pa.array(max_w))
    out = out.append_column("sum_word_len", pa.array(sum_w))
    return out.append_column("quality_ok", pa.array(ok))


def quality_scores(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


class LangId:
    """n-gram-heuristic language ID (actor pool: profiles built once).

    Classic character-trigram cosine profiling (Cavnar & Trenkle 1994 shape);
    profiles here are tiny hand-rolled stopword/letter-frequency cues per
    supported lang. The corpus langs are synthetic labels, so the test checks
    determinism + schema, not real-world accuracy.
    """

    PROFILES = {
        "en": {"the", "and", "of"},
        "de": {"der", "und", "die"},
        "fr": {"le", "et", "la"},
        "es": {"el", "y", "de"},
        "zh": set(),
    }

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in self.PROFILES.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = []
        for x in t.column("text").to_pylist():
            words = set((x or "").lower().split())
            best, score = "und", 0
            for lang, prof in self.profiles.items():
                s = len(words & prof)
                if s > score:
                    best, score = lang, s
            preds.append(best)
        out = t.drop_columns(["text"])
        return out.append_column("lang_pred", pa.array(preds,
                                                       type=pa.string()))


def lang_id(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow",
                          concurrency=(1, 4), num_cpus=0.5)


def doc_fingerprints(sf_dir: str, window: int = 8):
    """Winnowed rolling-hash fingerprints per doc (containment queries)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        from pixcrawler_ray.functions.hashing import rolling_fingerprints_batch
        fps = rolling_fingerprints_batch(t.column("text").to_pylist(),
                                         window=window)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "fingerprints": pa.array(
                [f.tolist() for f in fps], type=pa.list_(pa.uint64())),
        })

    return ds.map_batches(fp, batch_format="pyarrow")
