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


_PPS_RANGES = 64


def sample_pps_systematic(sf_dir: str, k: int = 200, num_buckets: int = 8):
    """Systematic probability-proportional-to-size sampling: order docs by
    the deterministic Lehmer shuffle rank, take the token-count prefix sum
    along that order, and keep every doc whose token interval crosses a
    stride boundary (``stride = max(1, total_tokens // k)``) — each doc's
    selection probability is proportional to its token mass, the classic
    PPS design for picking evaluation/holdout docs so long docs are not
    under-represented.

    Scale shape: the SAME two-step distributed prefix scan as
    ``textprep.pack_contexts`` — ranks are uniform on [0, 2^31-1), so
    ``rank * R >> 31`` range-partitions the order; per-range token totals
    (R = 64 rows) are exclusive-scanned on the driver and broadcast; one
    range-keyed exchange finishes the exact global prefix; selection is a
    vectorized floor-division compare. No sort, no corpus-sized driver
    state. Integer arithmetic throughout => exact SQL replay with
    ``SUM(...) OVER (ORDER BY rank)``.

    Output (doc_id, n_tokens, pick_idx) for kept docs, pick_idx the
    0-based stride boundary the doc's interval crossed (strictly
    increasing along the shuffle order; a doc spanning m boundaries
    appears once with the highest index, matching the SQL replay).
    """
    import pandas as pd

    from pixcrawler_ray.stages.shuffle import per_bucket
    from pixcrawler_ray.stages.textprep import _nonempty_words

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        _, nw = _nonempty_words(t.column("text"))
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        rank = lehmer_rank(ids)
        return pa.table({"doc_id": pa.array(ids),
                         "rank": pa.array(rank),
                         "n_tokens": pa.array(nw.astype(np.int64)),
                         "rng": pa.array((rank * _PPS_RANGES) >> 31)})

    toks = ds.map_batches(tokens, batch_format="pyarrow")

    def range_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"rng": t.column("rng").to_numpy(),
                           "tok": t.column("n_tokens").to_numpy()})
        return pa.Table.from_pandas(
            df.groupby("rng", sort=False)["tok"].sum().reset_index(),
            preserve_index=False)

    def range_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("rng", sort=False)["tok"].sum().reset_index()

    totals = per_bucket(toks.map_batches(range_partial,
                                         batch_format="pyarrow"),
                        ["rng"], range_merge, num_buckets=2).to_pandas()
    totals = totals.sort_values("rng")
    cum = np.cumsum(totals["tok"].to_numpy())
    base = dict(zip(totals["rng"].to_numpy(),
                    np.concatenate([[0], cum[:-1]]).astype(np.int64)))
    total = int(cum[-1]) if len(cum) else 0
    stride = max(1, total // k)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["rng", "rank"], kind="mergesort")
        tok = df["n_tokens"].to_numpy().astype(np.int64)
        rng = df["rng"].to_numpy().astype(np.int64)
        cum_prev = np.concatenate([[0], np.cumsum(tok)[:-1]])
        starts = np.flatnonzero(np.concatenate(
            [[True], rng[1:] != rng[:-1]]))
        prev = cum_prev - np.repeat(cum_prev[starts],
                                    np.diff(np.append(starts, len(rng))))
        bases = np.array([base.get(int(r), 0) for r in rng[starts]],
                         dtype=np.int64)
        prev = prev + np.repeat(bases,
                                np.diff(np.append(starts, len(rng))))
        after = prev + tok
        keep = (after // stride) > (prev // stride)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()[keep],
                            "n_tokens": tok[keep],
                            "pick_idx": (after // stride)[keep]})
        return out

    return per_bucket(toks, ["rng"], pick, num_buckets=num_buckets)
