"""Greedy BPE merge application (Sennrich et al. 2016 §3.2 shape): a fixed
ordered merge table applied lowest-rank-first per word, the way trained BPE
tokenizers segment at inference time.

The merge table is a LITERAL (24 common-English digraph/trigraph merges) —
a stand-in for a trained vocabulary, which would load from a file in
``__init__`` of the actor-pool stage exactly the same way. The scalar
``bpe_word`` is the spec; the batch path memoizes per DISTINCT word
(Zipf: vocabulary << token count), which is the entire performance model
of tokenizing 100 TB — the cache lives in actor state, built once per
actor, hit per batch.
"""

from __future__ import annotations

import numpy as np

# ordered merges: earlier = higher priority (lower rank)
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("in", "g"), ("an", "d"), ("er", "s"),
)
_RANK = {pair: i for i, pair in enumerate(MERGES)}


def bpe_word(word: str) -> list[str]:
    """Scalar spec: greedy lowest-rank merge until no merge applies."""
    parts = list(word)
    while len(parts) > 1:
        best, best_i = None, -1
        for i in range(len(parts) - 1):
            r = _RANK.get((parts[i], parts[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


class BpeCounter:
    """Actor-pool stage state: the merge ranks plus a distinct-word token-
    count cache (built once per actor, shared across batches)."""

    def __init__(self) -> None:
        self.cache: dict[str, int] = {}

    def count_texts(self, texts: list[str | None]) -> np.ndarray:
        out = np.zeros(len(texts), dtype=np.int64)
        cache = self.cache
        for i, x in enumerate(texts):
            n = 0
            for w in (x or "").split():
                c = cache.get(w)
                if c is None:
                    c = len(bpe_word(w))
                    cache[w] = c
                n += c
            out[i] = n
        return out


def train_bpe_serial(word_counts: dict[str, int],
                     num_merges: int) -> list[tuple[str, str]]:
    """Serial Sennrich trainer spec (learn_bpe shape): count adjacent
    symbol pairs weighted by word frequency, merge the most frequent
    (ties: lexicographic smallest (a, b)), repeat. The distributed
    ``stages.bpetrain.bpe_train`` must produce this exact sequence."""
    parts = {w: list(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        acc: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            p = parts[w]
            for i in range(len(p) - 1):
                k = (p[i], p[i + 1])
                acc[k] = acc.get(k, 0) + c
        if not acc:
            break
        best = min(acc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, p in parts.items():
            if len(p) < 2:
                continue
            q, i, n = [], 0, len(p)
            while i < n:
                if i < n - 1 and p[i] == a and p[i + 1] == b:
                    q.append(a + b)
                    i += 2
                else:
                    q.append(p[i])
                    i += 1
            parts[w] = q
    return merges
