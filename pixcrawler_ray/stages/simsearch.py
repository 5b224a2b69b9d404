"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the exact baseline: the query matrix is broadcast
once (``ray.put``), each batch does one float64 matmul, per-batch top-k
partials are merged in a tiny driver reduce — no shuffle at all. The scale
path is IVF: k-means-lite centroids (seeded, few iterations, sampled fit)
assign each vector to a coarse cell; queries probe the ``nprobe`` nearest
cells only. Recall vs the exact baseline is asserted in tests.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from pixcrawler_ray.sources.readers import pool_size, read_table


def _normalize(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


def load_query_vectors(sf_dir: str, query_vec_ids: list[int]) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    t = t.set_index("vec_id")
    return np.stack([np.asarray(t.loc[q, "embedding"], dtype=np.float64)
                     for q in query_vec_ids])


class BruteForceScorer:
    """Actor-pool stage: per batch, cosine of all rows vs the broadcast
    queries; emits per-batch top-k partials (k rows per query per batch)."""

    def __init__(self, query_ref, k: int):
        q = ray.get(query_ref)
        self.q = _normalize(q)          # (nq, d)
        self.k = k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                   for v in df["embedding"]]))
        sims = mat @ self.q.T           # (n, nq)
        out = {"query_idx": [], "vec_id": [], "cosine": []}
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            if len(col) > self.k:
                top = np.argpartition(-col, self.k)[: self.k]
            else:
                top = np.arange(len(col))
            for t in top:
                out["query_idx"].append(qi)
                out["vec_id"].append(int(ids[t]))
                out["cosine"].append(float(col[t]))
        return pd.DataFrame(out)


def topk_bruteforce(sf_dir: str, query_vec_ids: list[int], k: int = 10,
                    exclude_self: bool = True) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_vec_id, vec_id, rank) — rank by (-cosine, vec_id) so ties
    are deterministic; cosine itself is excluded from the hashed output
    columns to keep the driver compare float-free.
    """
    q = load_query_vectors(sf_dir, query_vec_ids)
    query_ref = ray.put(q)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k + 1},
        batch_format="pandas", batch_size=4096,
        concurrency=(1, max(1, pool_size(0.25))), num_cpus=1).to_pandas()
    out_rows = []
    for qi, qid in enumerate(query_vec_ids):
        part = partials[partials.query_idx == qi]
        if exclude_self:
            part = part[part.vec_id != qid]
        part = part.sort_values(["cosine", "vec_id"],
                                ascending=[False, True], kind="mergesort")
        top = part.head(k).reset_index(drop=True)
        for rank, r in top.iterrows():
            out_rows.append({"query_vec_id": qid, "vec_id": int(r.vec_id),
                             "rank": rank + 1, "cosine": float(r.cosine)})
    return pd.DataFrame(out_rows)


class IVFIndex:
    """Seeded k-means-lite coarse quantizer (public IVF-flat construction)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(centroids)

    @classmethod
    def fit(cls, sample: np.ndarray, n_cells: int, iters: int = 5,
            seed: int = 7) -> "IVFIndex":
        rng = np.random.default_rng(seed)
        sample = _normalize(sample.astype(np.float64))
        cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)),
                                 replace=False)]
        for _ in range(iters):
            assign = np.argmax(sample @ cent.T, axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = sample[m].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cent[c] = v / n
        return cls(cent)

    def assign(self, mat: np.ndarray) -> np.ndarray:
        return np.argmax(_normalize(mat) @ self.centroids.T, axis=1)


def topk_ivf(sf_dir: str, query_vec_ids: list[int], k: int = 10,
             n_cells: int = 16, nprobe: int = 4,
             sample_rows: int = 4096) -> pd.DataFrame:
    """Approximate top-k: probe only the nprobe nearest IVF cells per query.

    Index fit on a driver-side sample (seeded); assignment + scoring are
    distributed. At 256 nodes the cell id becomes the partition key of a
    bucketed layout so a probe touches nprobe/n_cells of the data.
    """
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in emb["embedding"].head(sample_rows)])
    index = IVFIndex.fit(sample, n_cells)
    q = load_query_vectors(sf_dir, query_vec_ids)
    qn = _normalize(q)
    probe_cells = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]
    index_ref = ray.put(index.centroids)
    wanted = [set(int(c) for c in row) for row in probe_cells]
    query_ref = ray.put(qn)

    class ProbeScorer:
        def __init__(self):
            self.cent = _normalize(ray.get(index_ref))
            self.q = ray.get(query_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids = df["vec_id"].to_numpy()
            mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                       for v in df["embedding"]]))
            cells = np.argmax(mat @ self.cent.T, axis=1)
            out = {"query_idx": [], "vec_id": [], "cosine": []}
            sims = mat @ self.q.T
            for qi in range(self.q.shape[0]):
                mask = np.isin(cells, list(wanted[qi]))
                for t in np.nonzero(mask)[0]:
                    out["query_idx"].append(qi)
                    out["vec_id"].append(int(ids[t]))
                    out["cosine"].append(float(sims[t, qi]))
            return pd.DataFrame(out)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(ProbeScorer, batch_format="pandas",
                              batch_size=4096,
                              concurrency=(1, max(1, pool_size(0.25))),
                              num_cpus=1).to_pandas()
    out_rows = []
    for qi, qid in enumerate(query_vec_ids):
        part = partials[(partials.query_idx == qi)
                        & (partials.vec_id != qid)]
        part = part.sort_values(["cosine", "vec_id"],
                                ascending=[False, True], kind="mergesort")
        for rank, r in part.head(k).reset_index(drop=True).iterrows():
            out_rows.append({"query_vec_id": qid, "vec_id": int(r.vec_id),
                             "rank": rank + 1, "cosine": float(r.cosine)})
    return pd.DataFrame(out_rows)
