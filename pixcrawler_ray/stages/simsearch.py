"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine top-k is the exact baseline: the query matrix is broadcast
once (``ray.put``), each batch does one float64 matmul, per-batch top-k
partials are merged in a tiny driver reduce — no shuffle at all. The scale
path is IVF: k-means-lite centroids (seeded, few iterations, sampled fit)
assign each vector to a coarse cell; queries probe the ``nprobe`` nearest
cells only. Recall vs the exact baseline is asserted in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from pixcrawler_ray.sources.readers import read_table


def _normalize(mat: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return mat / norm


def list_column_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """Zero-copy ``list<float>`` column -> (n, dim) float64 matrix — the
    ONE shared kernel for every embedding consumer (kmeans, power
    iteration, semdedup, …). The ``offs[0]:offs[-1]`` slice is load-
    bearing: a sliced/chunked Arrow array has non-zero start offsets, and
    reshaping the raw values buffer without it reads the wrong rows."""
    emb = t.column(col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    offs = np.asarray(emb.offsets)
    vals = np.asarray(emb.values, dtype=np.float64)
    return vals[offs[0]:offs[-1]].reshape(t.num_rows, -1)


def load_query_vectors(sf_dir: str, query_vec_ids: list[int]) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", list(query_vec_ids))]
                      ).to_pandas().set_index("vec_id")
    return np.stack([np.asarray(t.loc[q, "embedding"], dtype=np.float64)
                     for q in query_vec_ids])


def _sample_embeddings(sf_dir: str, sample_rows: int) -> np.ndarray:
    """Fit sample from the FIRST row group(s) only — never the full table."""
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    parts, got = [], 0
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(rg, columns=["embedding"])
        parts.append(t)
        got += t.num_rows
        if got >= sample_rows:
            break
    col = pa.concat_tables(parts).column("embedding")
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in col.to_pylist()[:sample_rows]])


class BruteForceScorer:
    """TASK-pool stage: per batch, cosine of all rows vs the broadcast
    queries; emits per-batch top-k partials (k rows per query per batch).

    A callable INSTANCE, not an actor pool: the query matrix is tiny
    (nq x d) and ships once as a task closure constant (ray.put under the
    hood, zero-copy per read) — a dedicated actor pool paid seconds of
    process spawn per call for sub-second work (round-2 bench regression)."""

    def __init__(self, q: np.ndarray, k: int):
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
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    partials = ds.map_batches(
        BruteForceScorer(q, k + 1),
        batch_format="pandas", batch_size=4096).to_pandas()
    return _merge_topk(partials, query_vec_ids, k, exclude_self=exclude_self)


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
    sample = _sample_embeddings(sf_dir, sample_rows)
    index = IVFIndex.fit(sample, n_cells)
    q = load_query_vectors(sf_dir, query_vec_ids)
    qn = _normalize(q)
    probe_cells = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :nprobe]
    wanted = [set(int(c) for c in row) for row in probe_cells]

    class ProbeScorer:
        """Task-pool callable: centroids + queries are tiny closure
        constants (shipped once), no actor spawn for sub-second scans."""

        def __init__(self, cent: np.ndarray, q: np.ndarray):
            self.cent = _normalize(cent)
            self.q = q

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
    partials = ds.map_batches(ProbeScorer(index.centroids, qn),
                              batch_format="pandas",
                              batch_size=4096).to_pandas()
    return _merge_topk(partials, query_vec_ids, k)


def _merge_topk(partials: pd.DataFrame, query_vec_ids: list[int], k: int,
                exclude_self: bool = True) -> pd.DataFrame:
    """Tiny driver reduce over per-batch top-k partials (k x nq x nblocks
    rows — small by construction regardless of corpus size)."""
    out_rows = []
    for qi, qid in enumerate(query_vec_ids):
        part = partials[partials.query_idx == qi]
        if exclude_self:
            part = part[part.vec_id != qid]
        part = part.sort_values(["cosine", "vec_id"],
                                ascending=[False, True], kind="mergesort")
        for rank, r in part.head(k).reset_index(drop=True).iterrows():
            out_rows.append({"query_vec_id": qid, "vec_id": int(r.vec_id),
                             "rank": rank + 1, "cosine": float(r.cosine)})
    return pd.DataFrame(out_rows)


def build_ivf_index(sf_dir: str, index_dir: str, n_cells: int = 16,
                    sample_rows: int = 4096) -> np.ndarray:
    """Build the cell-PARTITIONED IVF layout: assign every vector to its
    coarse cell (distributed, one matmul per batch vs the broadcast
    centroids) and write parquet hive-partitioned by ``cell``.

    This is the 100 TB shape round 1 flagged as missing: a probe then reads
    ONLY the ``nprobe`` cell directories (partition pruning at the read),
    touching ~nprobe/n_cells of the bytes instead of scanning every row.
    Returns the centroid matrix (also persisted as ``centroids.npy``).
    """
    import os

    sample = _sample_embeddings(sf_dir, sample_rows)
    index = IVFIndex.fit(sample, n_cells)

    class CellAssigner:
        """Task-pool callable: the centroid matrix is a tiny closure
        constant, shipped to the object store once."""

        def __init__(self, cent: np.ndarray):
            self.cent = _normalize(cent)

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                       for v in t.column("embedding")
                                       .to_pylist()]))
            cells = np.argmax(mat @ self.cent.T, axis=1).astype(np.int64)
            return t.append_column("cell", pa.array(cells))

    ds = read_table(sf_dir, "embeddings")
    ds.map_batches(CellAssigner(index.centroids),
                   batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"])
    os.makedirs(index_dir, exist_ok=True)
    # underscore prefix: parquet dataset discovery ignores "_"-prefixed
    # files, so the sidecar does not break read_parquet over the index dir
    np.save(os.path.join(index_dir, "_centroids.npy"), index.centroids)
    return index.centroids


def topk_ivf_partitioned(index_dir: str, sf_dir: str,
                         query_vec_ids: list[int], k: int = 10,
                         nprobe: int = 4) -> pd.DataFrame:
    """Probe a :func:`build_ivf_index` layout — reads ONLY the probed cell
    partitions (hive partition pruning pushed into the parquet read), then
    scores each surviving batch against just the queries probing its cells.
    """
    import os

    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
    )

    cent = _normalize(np.load(os.path.join(index_dir, "_centroids.npy")))
    q = load_query_vectors(sf_dir, query_vec_ids)
    qn = _normalize(q)
    probe_cells = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    wanted = [set(int(c) for c in row) for row in probe_cells]
    union = set().union(*wanted)

    # path-level pruning: non-probed cell directories are dropped at file
    # discovery — their bytes are never opened, the IVF point
    ds = rd.read_parquet(
        index_dir,
        partition_filter=PathPartitionFilter.of(
            lambda kv: int(kv["cell"]) in union if "cell" in kv
            else False, style="hive"),   # sidecar files have no partition dir
        partitioning=Partitioning("hive", field_types={"cell": int}))

    class PrunedScorer:
        """Task-pool callable (tiny query matrix as closure constant)."""

        def __init__(self, q: np.ndarray):
            self.q = q

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids = df["vec_id"].to_numpy()
            cells = df["cell"].to_numpy().astype(np.int64)
            mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                       for v in df["embedding"]]))
            sims = mat @ self.q.T
            out = {"query_idx": [], "vec_id": [], "cosine": []}
            for qi in range(self.q.shape[0]):
                mask = np.isin(cells, list(wanted[qi]))
                col = sims[mask, qi]
                sel = np.nonzero(mask)[0]
                if len(col) > k + 1:        # per-batch partial top-k
                    keep = np.argpartition(-col, k + 1)[: k + 1]
                    sel, col = sel[keep], col[keep]
                out["query_idx"].extend([qi] * len(sel))
                out["vec_id"].extend(int(ids[t]) for t in sel)
                out["cosine"].extend(float(c) for c in col)
            return pd.DataFrame(out)

    partials = ds.map_batches(PrunedScorer(qn), batch_format="pandas",
                              batch_size=4096).to_pandas()
    return _merge_topk(partials, query_vec_ids, k)


class PQCodebook:
    """Product quantizer (Jegou et al. 2011, TPAMI — public PQ/ADC shape):
    the D-dim space splits into ``m`` subspaces; each subspace gets its own
    seeded k-means-lite codebook of ``ksub`` centroids fit on a driver-side
    sample. Vectors are L2-normalized FIRST, so cosine decomposes into a
    sum of per-subspace inner products and ADC scan is exact w.r.t. the
    quantized codes. Codes are m bytes per vector — a 64-dim float32
    embedding compresses 32x (256 -> 8 bytes), which is the whole reason PQ
    is the 100 TB path: the code table for a billion vectors fits a node.
    """

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = codebooks          # (m, ksub, dsub)
        self.m, self.ksub, self.dsub = codebooks.shape

    @classmethod
    def fit(cls, sample: np.ndarray, m: int = 8, ksub: int = 16,
            iters: int = 8, seed: int = 7) -> "PQCodebook":
        sample = _normalize(sample.astype(np.float64))
        n, d = sample.shape
        assert d % m == 0, f"dim {d} not divisible by m={m}"
        dsub = d // m
        rng = np.random.default_rng(seed)
        books = np.empty((m, ksub, dsub))
        for j in range(m):
            sub = sample[:, j * dsub:(j + 1) * dsub]
            cent = sub[rng.choice(n, size=min(ksub, n), replace=False)]
            for _ in range(iters):
                d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for c in range(len(cent)):
                    msk = assign == c
                    if msk.any():
                        cent[c] = sub[msk].mean(axis=0)
            books[j, :len(cent)] = cent
            if len(cent) < ksub:            # degenerate tiny-sample case
                books[j, len(cent):] = cent[-1]
        return cls(books)

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """(n, d) -> (n, m) uint8 codes; one argmin per subspace,
        vectorized over the batch."""
        mat = _normalize(mat.astype(np.float64))
        n = mat.shape[0]
        codes = np.empty((n, self.m), dtype=np.uint8)
        for j in range(self.m):
            sub = mat[:, j * self.dsub:(j + 1) * self.dsub]
            d2 = ((sub[:, None, :] - self.codebooks[j][None, :, :]) ** 2
                  ).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return codes

    def adc_tables(self, q: np.ndarray) -> np.ndarray:
        """(nq, d) queries -> (nq, m, ksub) inner-product lookup tables."""
        qn = _normalize(q.astype(np.float64))
        nq = qn.shape[0]
        tabs = np.empty((nq, self.m, self.ksub))
        for j in range(self.m):
            qs = qn[:, j * self.dsub:(j + 1) * self.dsub]  # (nq, dsub)
            tabs[:, j, :] = qs @ self.codebooks[j].T
        return tabs


def pq_encode(sf_dir: str, pq_index: "PQCodebook"):
    """Distributed encode: one Dataset pass, m bytes/vector out. The
    codebook is a tiny closure constant (m*ksub*dsub floats), shipped once."""

    class Encoder:
        def __init__(self, book: PQCodebook):
            self.book = book

        def __call__(self, t: pa.Table) -> pa.Table:
            mat = np.stack([np.asarray(v, dtype=np.float64)
                            for v in t.column("embedding").to_pylist()])
            codes = self.book.encode(mat)
            return pa.table({
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), type=pa.uint8()),
                    self.book.m),
            })

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(Encoder(pq_index), batch_format="pyarrow")


def topk_pq(sf_dir: str, query_vec_ids: list[int], k: int = 10,
            m: int = 32, ksub: int = 128, sample_rows: int = 4096,
            refine: int = 0, exclude_self: bool = True) -> pd.DataFrame:
    """Approximate top-k via PQ/ADC: fit on a sample, encode distributed,
    then scan CODES ONLY (m bytes/vector) against per-query lookup tables —
    per batch one fancy-index gather + row sum, partial top-k, tiny driver
    merge. At 100 TB the encode output is the persisted artifact (32x
    smaller than the raw embeddings) and re-scans never touch raw floats.

    ``refine > 0`` adds the standard ADC+R step (Jegou et al. §V): the ADC
    scan keeps a per-query shortlist of ``refine`` candidates, then ONLY
    those ids are re-scored with exact cosine (a broadcast-id filtered
    second pass over the raw embeddings — nq*refine rows, never the
    corpus). Returns (query_vec_id, vec_id, rank) like
    :func:`topk_bruteforce`; recall vs the exact baseline is pinned in
    pytest."""
    sample = _sample_embeddings(sf_dir, sample_rows)
    book = PQCodebook.fit(sample, m=m, ksub=ksub)
    q = load_query_vectors(sf_dir, query_vec_ids)
    tabs = book.adc_tables(q)               # (nq, m, ksub)
    codes_ds = pq_encode(sf_dir, book)
    mcols = np.arange(book.m)

    class AdcScanner:
        """Task-pool callable: lookup tables are tiny closure constants."""

        def __init__(self, tabs: np.ndarray, k: int):
            self.tabs = tabs
            self.k = k

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            ids = t.column("vec_id").to_numpy(zero_copy_only=False)
            flat = t.column("code").combine_chunks().flatten().to_numpy(
                zero_copy_only=False)
            codes = flat.reshape(len(ids), -1)         # (n, m) uint8
            out = {"query_idx": [], "vec_id": [], "cosine": []}
            for qi in range(self.tabs.shape[0]):
                # ADC: score = sum_j LUT[qi, j, code[:, j]]
                scores = self.tabs[qi][mcols[None, :], codes].sum(axis=1)
                if len(scores) > self.k:
                    top = np.argpartition(-scores, self.k)[: self.k]
                else:
                    top = np.arange(len(scores))
                out["query_idx"].extend([qi] * len(top))
                out["vec_id"].extend(int(ids[i]) for i in top)
                out["cosine"].extend(float(scores[i]) for i in top)
            return pd.DataFrame(out)

    shortlist = k + (1 if exclude_self else 0)
    if refine > 0:
        shortlist = max(shortlist, refine)
    partials = codes_ds.map_batches(
        AdcScanner(tabs, shortlist),
        batch_format="pyarrow", batch_size=4096).to_pandas()
    if refine <= 0:
        return _merge_topk(partials, query_vec_ids, k,
                           exclude_self=exclude_self)

    # ADC+R: exact cosine re-rank of the per-query shortlist only. The
    # candidate id set is nq*refine rows (driver-small by construction);
    # the second pass filters the raw embeddings by that broadcast set.
    cand: dict[int, set[int]] = {}
    for qi in range(len(query_vec_ids)):
        part = partials[partials.query_idx == qi]
        part = part.sort_values(["cosine", "vec_id"],
                                ascending=[False, True], kind="mergesort")
        cand[qi] = set(int(v) for v in part.head(refine).vec_id)
    union_ids = sorted(set().union(*cand.values()))
    qn = _normalize(q)

    class RefineScorer:
        """Exact cosine on shortlist rows only (id set is a tiny closure
        constant); everything else is filtered out batch-side."""

        def __init__(self, wanted_ids: np.ndarray, q: np.ndarray):
            self.wanted = wanted_ids
            self.q = q

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids = df["vec_id"].to_numpy()
            msk = np.isin(ids, self.wanted)
            if not msk.any():
                return pd.DataFrame({"query_idx": pd.Series([], dtype=int),
                                     "vec_id": pd.Series([], dtype=int),
                                     "cosine": pd.Series([], dtype=float)})
            sub = df[msk]
            mat = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                       for v in sub["embedding"]]))
            sims = mat @ self.q.T
            out = {"query_idx": [], "vec_id": [], "cosine": []}
            sids = sub["vec_id"].to_numpy()
            for qi in range(self.q.shape[0]):
                for t_, vid in enumerate(sids):
                    out["query_idx"].append(qi)
                    out["vec_id"].append(int(vid))
                    out["cosine"].append(float(sims[t_, qi]))
            return pd.DataFrame(out)

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = ds.map_batches(
        RefineScorer(np.asarray(union_ids, dtype=np.int64), qn),
        batch_format="pandas", batch_size=4096).to_pandas()
    # keep each query's own shortlist only, then exact merge
    keep = [row.vec_id in cand[row.query_idx]
            for row in exact.itertuples()]
    return _merge_topk(exact[np.asarray(keep, dtype=bool)],
                       query_vec_ids, k, exclude_self=exclude_self)


def kmeans_fit_full(sf_dir: str, k: int = 16, iters: int = 5,
                    seed: int = 7, sample_rows: int = 4096,
                    num_buckets: int = 4):
    """Full-corpus distributed Lloyd k-means over the embedding column —
    the training loop behind IVF/PQ/SemDeDup cells, run on ALL rows instead
    of a head sample (a 100 TB corpus needs corpus-representative cells).

    Determinism at any parallelism: embeddings AND centroids are quantized
    to int64 fixed-point (x 2^20); assignments are the argmax of the exact
    INTEGER dot products (a float BLAS dot can change its last bits with
    the gemm batch shape, flipping near-tie argmaxes between runs — seen
    in testing), and every per-iteration reduction sums integers —
    associative and exact. Batch order / concurrency cannot change a
    single bit of the result, and the serial replay in pytest is
    row-identical. Per iteration: one streaming assign pass emits k-row
    (cid, count, 64 int sums) partials per batch, one keyed exchange merges
    them, and the driver holds only the k x (dim+1) update (constant).
    Init = the same seeded head-sample choice as ``IVFIndex.fit``.

    Returns (assignments_dataset, centroids): the final-iteration
    (vec_id, cluster_id) dataset and the float64 centroid matrix.
    """
    import ray

    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket

    Q = 1 << 20
    rng = np.random.default_rng(seed)
    sample = _normalize(_sample_embeddings(sf_dir, sample_rows))
    cent = sample[rng.choice(len(sample), size=min(k, len(sample)),
                             replace=False)].copy()

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _mat(t: pa.Table) -> np.ndarray:
        return _normalize(list_column_matrix(t))

    dim = sample.shape[1]
    sum_cols = [f"s{j}" for j in range(dim)]

    def _qcent(c: np.ndarray) -> np.ndarray:
        return np.rint(c * Q).astype(np.int64)

    for _ in range(iters):
        cent_ref = ray.put(_qcent(cent))

        def partial(t: pa.Table) -> pa.Table:
            qc = ray.get(cent_ref)
            m = _mat(t)
            qm = np.rint(m * Q).astype(np.int64)     # exact integer domain
            cid = np.argmax(qm @ qc.T, axis=1)       # exact int dots:
            # |vals| <= 2^20, so a 64-dim dot is <= 2^46 — no overflow
            out = {"cid": pa.array(np.arange(len(qc), dtype=np.int64)),
                   "cnt": pa.array(np.bincount(cid, minlength=len(qc))
                                   .astype(np.int64))}
            sums = np.zeros((len(qc), dim), dtype=np.int64)
            np.add.at(sums, cid, qm)
            for j, name in enumerate(sum_cols):
                out[name] = pa.array(sums[:, j])
            return pa.table(out)

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return (g.groupby("cid", sort=True)[["cnt"] + sum_cols]
                    .sum().reset_index())

        agg = per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                         ["cid"], merge,
                         num_buckets=num_buckets).to_pandas()
        agg = agg.groupby("cid", sort=True).sum().reindex(range(k))
        cnt = agg["cnt"].to_numpy()
        sums = agg[sum_cols].to_numpy(dtype=np.float64) / Q
        upd = cent.copy()
        nz = np.nan_to_num(cnt) > 0
        v = sums[nz] / cnt[nz, None]
        # explicit sqrt-sum-of-squares: np.linalg.norm's row-wise and
        # single-vector paths (einsum vs BLAS dnrm2) differ in the last
        # bit, which would break the bit-exact serial replay
        norm = np.sqrt((v * v).sum(axis=1, keepdims=True))
        norm[norm == 0] = 1.0
        upd[nz] = v / norm
        cent = upd

    cent_ref = ray.put(_qcent(cent))

    def assign(t: pa.Table) -> pa.Table:
        qc = ray.get(cent_ref)
        qm = np.rint(_mat(t) * Q).astype(np.int64)
        cid = np.argmax(qm @ qc.T, axis=1)
        return pa.table({"vec_id": t.column("vec_id").cast(pa.int64()),
                         "cluster_id": pa.array(cid.astype(np.int64))})

    return ds.map_batches(assign, batch_format="pyarrow"), cent


def pca_power_iteration(sf_dir: str, iters: int = 8, seed: int = 7,
                        num_buckets: int = 2):
    """Top principal component of the embedding matrix by DISTRIBUTED
    power iteration — the dimensionality-reduction / drift-detection
    primitive (top-PC projections flag embedding-space outliers and
    batch drift) — with the same int64-quantized-reduction discipline as
    ``kmeans_fit_full``, so the result is bit-identical at any
    parallelism:

    - pass 0: the corpus mean from one streaming pass of int64 sums;
    - per iteration: the direction broadcasts quantized (x 2^20); each
      batch accumulates y += (c.v >> 26) * c over its centered quantized
      rows — every reduction an exact integer sum (|c| <= 2^21 and the
      shifted projection <= 2^21, so each term is <= 2^42; the int64
      budget holds to ~4e6 batch rows x partials, and the per-batch
      partial is ONE dim-width row through the tiny keyed exchange);
    - the driver renormalizes the merged integer vector (explicit
      sqrt-sum-of-squares, constant work).

    Returns (scores_dataset, component): per-vector integer projections
    (vec_id, proj) onto the final direction, and the float64 unit
    component. Power iteration with a fixed seeded start converges to the
    dominant eigenvector (pytest pins cosine vs the exact numpy
    eigenvector and the bit-exact serial replay).
    """
    import ray

    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket

    Q = 1 << 20
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def _qmat(t: pa.Table) -> np.ndarray:
        return np.rint(list_column_matrix(t) * Q).astype(np.int64)

    # pass 0: integer mean sums
    def mean_partial(t: pa.Table) -> pa.Table:
        qm = _qmat(t)
        out = {"k": pa.array([0]), "n": pa.array([np.int64(len(qm))])}
        s = qm.sum(axis=0)
        for j in range(qm.shape[1]):
            out[f"s{j}"] = pa.array([s[j]])
        return pa.table(out)

    def mean_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False).sum().reset_index()

    # merge partials distributedly (one keyed reduce, exact integer sums)
    # so the driver reads ONE dim-width row, not one per batch
    mp = per_bucket(ds.map_batches(mean_partial, batch_format="pyarrow"),
                    ["k"], mean_merge, num_buckets=1).to_pandas()
    n = int(mp["n"].sum())
    dim = len([c for c in mp.columns if c.startswith("s")])
    qmean = np.array([int(mp[f"s{j}"].sum()) // n for j in range(dim)],
                     dtype=np.int64)      # floor-div: exact + replayable

    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    v /= np.sqrt((v * v).sum())

    for _ in range(iters):
        qv_ref = ray.put(np.rint(v * Q).astype(np.int64))

        def it_partial(t: pa.Table) -> pa.Table:
            qv = ray.get(qv_ref)
            c = _qmat(t) - qmean
            p = (c @ qv) >> 26                  # exact shifted projection
            y = (p[:, None] * c).sum(axis=0)
            out = {"k": pa.array([0])}
            for j in range(dim):
                out[f"y{j}"] = pa.array([y[j]])
            return pa.table(out)

        def merge(g):
            return g.groupby("k", sort=False).sum().reset_index()

        yp = per_bucket(ds.map_batches(it_partial, batch_format="pyarrow"),
                        ["k"], merge, num_buckets=num_buckets).to_pandas()
        y = np.array([int(yp[f"y{j}"].sum()) for j in range(dim)],
                     dtype=np.float64)
        nrm = np.sqrt((y * y).sum())
        if nrm == 0:
            break
        v = y / nrm

    qv_ref = ray.put(np.rint(v * Q).astype(np.int64))

    def score(t: pa.Table) -> pa.Table:
        qv = ray.get(qv_ref)
        c = _qmat(t) - qmean
        return pa.table({"vec_id": t.column("vec_id").cast(pa.int64()),
                         "proj": pa.array(c @ qv)})

    return ds.map_batches(score, batch_format="pyarrow"), v
