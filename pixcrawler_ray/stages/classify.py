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
    n_total = stats.count()

    compact = stats.map_batches(
        lambda t: t.select(["doc_id"] + list(FEATURES) + ["lr_ok"]),
        batch_format="pyarrow").materialize()   # 5 ints + bool per doc

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
