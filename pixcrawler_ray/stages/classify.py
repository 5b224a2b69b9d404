"""Distributed quality-classifier TRAINING — the learn side of the
fastText-style filter whose inference stand-in ships in
``textstats.quality_repetition`` (lr_margin/lr_ok): full-batch logistic
regression over the integer quality/repetition signals, with the gradient
reduction in int64 fixed point so training is bit-identical at any
parallelism (the kmeans_fit_full determinism recipe).

Per iteration: ONE streaming pass emits a constant (dim+1)-wide integer
gradient partial per batch, one tiny keyed exchange merges them, the
driver applies the update (a dim-vector — constant). Labels come from the
documented literal rule the inference margin uses, so the trainer's
pytest can assert it re-learns a separating boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# fixed feature scaling (documented constants — standardization at scale
# would come from profile_table's min/max, a constant-sized artifact)
FEATURES = ("n_tokens", "stop_hits", "dup_tokens", "sum_word_len")
FEATURE_SCALE = np.array([100.0, 10.0, 10.0, 500.0])
GRAD_Q = 1 << 20


def logreg_train_quality(sf_dir: str, iters: int = 60, lr: float = 10.0,
                         num_buckets: int = 4):
    """Train w on P(lr_ok | scaled signals) by full-batch GD.

    Returns (per_doc_dataset, weights): the final (doc_id, label, pred)
    dataset and the learned float64 weight vector (bias last). Exactness:
    each sample's gradient contribution is quantized to int64 x 2^20
    (identical regardless of batch shape), partials sum associatively, and
    the driver update is pure float ops on the exact integer totals.
    """
    import ray

    from pixcrawler_ray.stages.shuffle import per_bucket
    from pixcrawler_ray.stages.textstats import quality_repetition

    stats = quality_repetition(sf_dir)

    def xy(t: pa.Table):
        cols = [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in FEATURES]
        x = np.stack(cols, axis=1) / FEATURE_SCALE
        x = np.concatenate([x, np.ones((len(x), 1))], axis=1)  # bias
        y = t.column("lr_ok").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return x, y

    dim = len(FEATURES) + 1
    gcols = [f"g{j}" for j in range(dim)]
    w = np.zeros(dim, dtype=np.float64)

    compact = stats.map_batches(
        lambda t: t.select(["doc_id"] + list(FEATURES) + ["lr_ok"]),
        batch_format="pyarrow").materialize()   # 5 ints + bool per doc
    # count the MATERIALIZED projection — counting `stats` would run the
    # whole quality/repetition scan a second time
    n_total = compact.count()

    for _ in range(iters):
        w_ref = ray.put(w)

        def gpart(t: pa.Table) -> pa.Table:
            wv = ray.get(w_ref)
            x, y = xy(t)
            p = 1.0 / (1.0 + np.exp(-(x @ wv)))
            g = (p - y)[:, None] * x
            qg = np.rint(g * GRAD_Q).astype(np.int64)   # per-sample quant:
            # identical for any batching, so the int sums are exact
            out = {"k": pa.array(np.zeros(1, dtype=np.int64))}
            tot = qg.sum(axis=0)
            for j, name in enumerate(gcols):
                out[name] = pa.array(tot[j:j + 1])
            return pa.table(out)

        def gmerge(g: pd.DataFrame) -> pd.DataFrame:
            return (g.groupby("k", sort=True)[gcols].sum().reset_index())

        agg = per_bucket(
            compact.map_batches(gpart, batch_format="pyarrow"),
            ["k"], gmerge, num_buckets=num_buckets).to_pandas()
        tot = agg[gcols].to_numpy(dtype=np.float64).sum(axis=0) / GRAD_Q
        w = w - lr * tot / n_total

    w_ref = ray.put(w)

    def predict(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        x, y = xy(t)
        p = 1.0 / (1.0 + np.exp(-(x @ wv)))
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "label": pa.array(y.astype(np.int64)),
            "pred": pa.array((p > 0.5).astype(np.int64)),
        })

    return compact.map_batches(predict, batch_format="pyarrow"), w


DSIR_FEATS = 64
DSIR_RATIO_Q = 1_000_000


def dsir_scores(sf_dir: str, target_lang: str = "en",
                num_buckets: int = 4):
    """DSIR-shape importance scoring (Xie et al. 2023, arXiv:2302.03169):
    score each raw doc by how target-like its hashed-unigram distribution
    is. The target stand-in is the ``lang == target_lang`` slice;
    production passes a real high-quality sample.

    Two passes, both scale-shaped: (1) ONE streaming pass emits per-batch
    (feature, target_cnt, raw_cnt) partials over ``DSIR_FEATS`` hashed
    word buckets — a constant-width histogram exchange; the driver turns
    the merged 64 rows into Laplace-smoothed log-ratio weights, quantized
    to int64 x 1e6 so (2) every per-doc score is an exact INTEGER dot
    product of the doc's feature counts with the broadcast ratio vector —
    bit-identical at any parallelism, serial-replayable in pytest.
    Output (doc_id, lang, score_fp, selected) with selected = score > 0
    (the top-slice variant of DSIR's exp-tilt resampling).
    """
    import ray

    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket
    from pixcrawler_ray.stages.textprep import (_nonempty_words,
                                                _word_hash64)

    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "text"])

    def doc_feats(t: pa.Table):
        """(n_docs x DSIR_FEATS) int64 feature-count matrix."""
        flat, nw = _nonempty_words(t.column("text"))
        feats = (_word_hash64(flat) % np.uint64(DSIR_FEATS)).astype(np.int64)
        seg = np.repeat(np.arange(t.num_rows, dtype=np.int64), nw)
        m = np.zeros((t.num_rows, DSIR_FEATS), dtype=np.int64)
        np.add.at(m, (seg, feats), 1)
        return m

    def cpart(t: pa.Table) -> pa.Table:
        m = doc_feats(t)
        is_t = (t.column("lang").to_pandas()
                .to_numpy() == target_lang)
        return pa.table({
            "feat": pa.array(np.arange(DSIR_FEATS, dtype=np.int64)),
            "cnt_target": pa.array(m[is_t].sum(axis=0)),
            "cnt_raw": pa.array(m.sum(axis=0)),
        })

    def cmerge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("feat", sort=True)[["cnt_target", "cnt_raw"]]
                .sum().reset_index())

    hist = (per_bucket(ds.map_batches(cpart, batch_format="pyarrow"),
                       ["feat"], cmerge, num_buckets=num_buckets)
            .to_pandas().sort_values("feat"))
    ct = hist["cnt_target"].to_numpy(dtype=np.float64) + 1.0
    cr = hist["cnt_raw"].to_numpy(dtype=np.float64) + 1.0
    ratio = np.log(ct / ct.sum()) - np.log(cr / cr.sum())
    ratio_fp = np.rint(ratio * DSIR_RATIO_Q).astype(np.int64)
    ratio_ref = ray.put(ratio_fp)

    def score(t: pa.Table) -> pa.Table:
        r = ray.get(ratio_ref)
        s = doc_feats(t) @ r                 # exact integer dot
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "lang": t.column("lang").cast(pa.string()),
            "score_fp": pa.array(s),
            "selected": pa.array(s > 0),
        })

    return ds.map_batches(score, batch_format="pyarrow")
