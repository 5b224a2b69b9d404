"""Deterministic sampling operators for corpus curation.

Training-data pipelines sample: per-stratum caps for balance (e.g. at most
N docs per language), reproducibly across reruns and resumes. Random state
is banned (a resumed run must pick the SAME sample), so the ordering key is
a fixed integer hash of the row id — a Lehmer/MINSTD multiplicative step,
chosen because it is exactly replayable in plain SQL integer arithmetic
(products stay under 2^47, no modular-overflow divergence between numpy
and the oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pixcrawler_ray.sources.readers import read_table
from pixcrawler_ray.stages.shuffle import keep_first_n

_MINSTD_A = 48271
_MERS31 = 2147483647  # 2^31 - 1


def lehmer_rank(ids: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-random rank of int64 ids: one MINSTD step on
    ``id mod (2^31-1)``. Bijective on [0, 2^31-1) so ids below 2^31-1
    never collide; SQL replay: ``(id % 2147483647) * 48271 % 2147483647``."""
    return (ids.astype(np.int64) % _MERS31) * _MINSTD_A % _MERS31


def sample_stratified(sf_dir: str, per_stratum: int = 50,
                      stratum_col: str = "lang"):
    """Keep the ``per_stratum`` lowest-rank docs per stratum.

    One bucketed keep-first-N shuffle on the stratum key (the same
    primitive as the crawl budget cap, shuffle.keep_first_n); rank ties
    cannot occur below 2^31-1 ids (bijection), so the sample is total-order
    deterministic and resume-stable.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", stratum_col])

    def add_rank(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        return t.append_column(
            "sample_rank", pa.array(lehmer_rank(ids), type=pa.int64()))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    kept = keep_first_n(ranked, [stratum_col], "sample_rank", per_stratum)
    return kept.map_batches(
        lambda t: t.select(["doc_id", stratum_col]),
        batch_format="pyarrow")


# mixture weights as acceptance percentages by source index mod 4 — the
# DoReMi/Pile-style static domain reweighting shape (upsample quality
# domains, downsample noisy ones), deterministic so resumes re-pick the
# same rows. Literal table => exact SQL replay.
MIXTURE_PCT = (100, 60, 30, 10)


def domain_mixture(sf_dir: str, weights: dict[str, int] | None = None):
    """Static domain-mixture resampling: keep a source-dependent fraction
    of each domain via the Lehmer rank as the acceptance variable —
    ``keep iff lehmer_rank(doc_id) % 100 < pct(source)``.

    ``weights`` maps source name -> acceptance percentage (DoReMi-style
    weights are learned PER DOMAIN, so callers pass their own map; a source
    absent from the map defaults to 100 = keep all). When ``weights`` is
    None the literal ``MIXTURE_PCT[src_idx % 4]`` table applies — the
    SQL-replayable default. One embarrassingly parallel pass (no shuffle):
    the mixture is a per-row predicate, exactly reproducible across reruns
    and partitions. Output (doc_id, source, pct)."""
    import pyarrow.compute as pc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "source"])

    def kernel(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        src = t.column("source")
        if weights is None:
            idx = pc.cast(pc.replace_substring_regex(src, "^src", ""),
                          pa.int64()).to_numpy(zero_copy_only=False)
            pct = np.asarray(MIXTURE_PCT, dtype=np.int64)[idx % 4]
        else:
            # vectorized dict lookup: map each UNIQUE source once
            d = src.combine_chunks().dictionary_encode()
            upct = np.array([int(weights.get(str(v), 100))
                             for v in d.dictionary.to_pylist()],
                            dtype=np.int64)
            pct = upct[d.indices.to_numpy(zero_copy_only=False)]
        keep = (lehmer_rank(ids) % 100) < pct
        out = pa.table({"doc_id": t.column("doc_id"),
                        "source": src,
                        "pct": pa.array(pct)})
        return out.filter(pa.array(keep))

    return ds.map_batches(kernel, batch_format="pyarrow")


_WKEY_SCALE = np.int64(1) << np.int64(40)


def weighted_priority_keys(ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Integer priority-sampling key ``floor(w * 2^40 / (rank+1))`` where
    rank is the Lehmer rank of the id (Duffield, Lund & Thorup 2007
    "Priority sampling": priority q = w/u with u uniform in (0,1]; keeping
    the k largest priorities is a weighted sample without replacement whose
    inclusion probability is proportional to weight for w << threshold).
    The uniform is (rank+1)/2^31-1 — deterministic, resume-stable — and the
    key is one int64 floor-division, so the oracle replays it as plain SQL
    integer arithmetic (no float log / division divergence)."""
    w = weights.astype(np.int64)
    if len(w) and int(w.max()) >= (1 << 22):
        # 2^22 * 2^40 = 2^62: the int64 budget. DuckDB would raise on
        # overflow while numpy wraps silently — fail loudly instead.
        raise ValueError("weight too large for the 2^40 priority key scale")
    r = lehmer_rank(ids) + 1            # [1, 2^31-1]: never divides by 0
    return (w * _WKEY_SCALE) // r


def sample_weighted_reservoir(sf_dir: str, k: int = 200):
    """Deterministic weighted reservoir sample (A-ES / priority-sampling
    shape, Efraimidis & Spirakis 2006): keep the ``k`` docs with the
    largest integer priority keys, weight = whitespace token count, so
    long documents are proportionally more likely to be picked — the
    standard design for drawing eval/inspection subsets where token mass,
    not doc count, is the budget.

    Scale shape: each batch reduces to its LOCAL top-k partial (map-side
    combine — at most k rows leave any batch regardless of batch size), and
    one constant-key exchange merges the partials with a final
    (wkey DESC, doc_id) head-k. Total moved data is O(k x num_batches)
    rows of 3 int64s; nothing rescans the corpus. Zero-weight (empty)
    docs are excluded. Output (doc_id, n_tokens, wkey).
    """
    from pixcrawler_ray.stages.shuffle import per_bucket
    from pixcrawler_ray.stages.textstats import _segment_sum, _split_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        _, offs, lens = _split_words(t.column("text"))
        nt = _segment_sum((lens > 0).astype(np.int64), offs)
        keep = nt > 0
        ids, nt = ids[keep].astype(np.int64), nt[keep]
        key = weighted_priority_keys(ids, nt)
        if len(ids) > k:                      # local top-k partial
            order = np.lexsort((ids, -key))[:k]
            ids, nt, key = ids[order], nt[order], key[order]
        return pa.table({"g": pa.array(np.zeros(len(ids), dtype=np.int64)),
                         "doc_id": pa.array(ids),
                         "n_tokens": pa.array(nt),
                         "wkey": pa.array(key)})

    def merge(g):
        s = g.sort_values(["wkey", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        return s[["doc_id", "n_tokens", "wkey"]].reset_index(drop=True)

    return per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                      ["g"], merge, num_buckets=1)


def sample_pps_systematic(sf_dir: str, k: int = 200, num_buckets: int = 8):
    """Systematic probability-proportional-to-size sampling: order docs by
    the deterministic Lehmer shuffle rank, take the token-count prefix sum
    along that order, and keep every doc whose token interval crosses a
    stride boundary (``stride = max(1, total_tokens // k)``) — each doc's
    selection probability is proportional to its token mass, the classic
    PPS design for picking evaluation/holdout docs so long docs are not
    under-represented.

    Scale shape: rides ``textprep.scan_prefix_tokens`` (the shared
    two-step distributed prefix scan — one keyed exchange, 64-row driver
    table); the total for the stride is one Ray aggregate over the
    materialized scan, and the boundary selection is a stateless
    vectorized floor-division map — no second exchange. Integer
    arithmetic throughout => exact SQL replay with
    ``SUM(...) OVER (ORDER BY rank)``.

    Output (doc_id, n_tokens, pick_idx) for kept docs, pick_idx the
    0-based stride boundary the doc's interval crossed (strictly
    increasing along the shuffle order; a doc spanning m boundaries
    appears once with the highest index, matching the SQL replay).
    """
    import ray.data.aggregate as agg

    from pixcrawler_ray.stages.textprep import scan_prefix_tokens

    scan = scan_prefix_tokens(sf_dir).materialize()
    row = scan.aggregate(agg.Sum("n_tokens"))
    total = int(row["sum(n_tokens)"] or 0)
    stride = max(1, total // k)

    def pick(t: pa.Table) -> pa.Table:
        prev = t.column("prefix_before").to_numpy(zero_copy_only=False)
        tok = t.column("n_tokens").to_numpy(zero_copy_only=False)
        after = prev + tok
        keep = (after // stride) > (prev // stride)
        return pa.table({
            "doc_id": pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False)[keep],
                type=pa.int64()),
            "n_tokens": pa.array(tok[keep], type=pa.int64()),
            "pick_idx": pa.array((after // stride)[keep], type=pa.int64())})

    return scan.map_batches(pick, batch_format="pyarrow")
