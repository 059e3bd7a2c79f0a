"""Vector similarity search + rank fusion over embedding columns.

- Brute-force cosine top-k (the reference's ChromaDB ``n_results`` query,
  reference: competitive-intel/vectorstore/store.py:172-231) as a distributed
  numpy matmul per batch against a broadcast query matrix; per-block partial
  top-k, merged on the driver — never materializes the corpus.
- LSH-bucketed ANN variant (random-hyperplane signs) as the 100-TB scale
  path: probe only the buckets matching the query signature.
- RRF fusion of k ranked lists (reference: webapp/rag/retriever.py:222-255):
  score(id) = Σ 1/(rrf_k + rank + 1), keep max-original-score copy per id.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions.embed import cosine_scores

RRF_K = 60


def _batch_topk(batch: pa.Table, query_ref, k: int, vec_col: str, id_col: str,
                round_to: Optional[int]) -> pa.Table:
    if len(batch) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], batch[id_col].type),
                         "score": pa.array([], pa.float64())})
    queries = ray.get(query_ref) if not isinstance(query_ref, np.ndarray) else query_ref
    vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_ids, out_scores, out_qids = [], [], []
    for qi in range(queries.shape[0]):
        scores = cosine_scores(vecs, queries[qi])
        if round_to is not None:
            scores = np.round(scores, round_to)
        take = min(k, len(scores))
        # partial top-k within the block; ties resolved later by (score, id)
        idx = np.argpartition(-scores, take - 1)[:take] if take < len(scores) else np.arange(len(scores))
        out_ids.append(ids[idx])
        out_scores.append(scores[idx])
        out_qids.append(np.full(take, qi, dtype=np.int64))
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_qids), pa.int64()),
            id_col: pa.array(np.concatenate(out_ids)),
            "score": pa.array(np.concatenate(out_scores), pa.float64()),
        }
    )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: Optional[int] = None,
) -> pd.DataFrame:
    """Top-k nearest rows per query vector.  ``queries``: (nq, dim).
    Returns DataFrame(query_id, id, score, rank) with deterministic
    (-score, id) ordering."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    query_ref = ray.put(queries)
    partials = ds.map_batches(
        lambda t: _batch_topk(t, query_ref, k, vec_col, id_col, round_to),
        batch_format="pyarrow",
    )
    df = partials.to_pandas()  # ≤ nq * k * n_blocks rows — small
    if not len(df) or "query_id" not in df.columns:
        return pd.DataFrame({"query_id": [], id_col: [], "score": [], "rank": []})
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True], kind="stable")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("query_id").cumcount()
    return df


def range_search(
    ds,
    query: np.ndarray,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: Optional[int] = 6,
) -> pd.DataFrame:
    """Radius similarity search: every row with cosine(query) >= threshold
    (the other half of a vector store's query API, next to top-k).

    Each block filters locally and emits ONLY its matches, so the driver
    collects O(|result|) rows no matter the corpus size — the caller picks
    the threshold, and a threshold that matches everything is the caller
    materializing the dataset, not a property of the operator.  Scores are
    rounded BEFORE the compare so the boundary is reproducible (and
    SQL-checkable) across summation orders."""
    q = np.asarray(query, dtype=np.float64).reshape(-1)
    query_ref = ray.put(q)

    def batch_filter(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if len(t) == 0:
            return empty
        qv = ray.get(query_ref)
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False))
        scores = cosine_scores(vecs, qv)
        if round_to is not None:
            scores = np.round(scores, round_to)
        mask = scores >= threshold
        if not mask.any():
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)[mask]
        return pa.table({
            id_col: pa.array(ids.astype("int64"), pa.int64()),
            "score": pa.array(scores[mask], pa.float64()),
        })

    df = ds.map_batches(batch_filter, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    return df.sort_values(["score", id_col], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


class HyperplaneLSH:
    """Random-hyperplane sign buckets; deterministic planes from a seed."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 99):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim)).astype(np.float64)

    def bucket(self, vecs: np.ndarray) -> np.ndarray:
        signs = (np.atleast_2d(vecs) @ self.planes.T) > 0
        weights = (1 << np.arange(signs.shape[1], dtype=np.int64))
        return (signs.astype(np.int64) * weights).sum(axis=1)


def lsh_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 99,
) -> pd.DataFrame:
    """Approximate top-k: score only rows whose LSH bucket matches the
    query's (single-probe).  Bucket assignment is a vectorized map_batches;
    at scale the bucket column is written partitioned so probes read one
    partition."""
    query = np.asarray(query, dtype=np.float64).reshape(-1)
    lsh = HyperplaneLSH(query.shape[0], n_planes, seed)
    qbucket = int(lsh.bucket(query)[0])

    def probe(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        buckets = lsh.bucket(vecs)
        mask = buckets == qbucket
        if not mask.any():
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "score": pa.array([], pa.float64())})
        scores = cosine_scores(vecs[mask], query)
        return pa.table({id_col: batch[id_col].filter(pa.array(mask)),
                         "score": pa.array(scores, pa.float64())})

    df = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
    df["rank"] = np.arange(len(df))
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bucket-partitioned ANN index: the "write partitioned so probes read one
# partition" scale path.  build once (one full pass + partitioned write);
# every probe afterwards reads ONLY the matching hive partitions — at 10⁹
# vectors a single-probe query touches ~1/2ⁿ_planes of storage instead of
# scanning every block.
# ---------------------------------------------------------------------------


def build_lsh_index(
    ds,
    index_dir: str,
    n_planes: int = 8,
    seed: int = 99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Assign every row its hyperplane bucket and write the corpus
    hive-partitioned by bucket (``index_dir/bucket=<b>/``).  Returns the
    index metadata needed to probe (dim, planes seed)."""
    first = ds.take(1)[0]
    dim = len(first[vec_col])
    lsh = HyperplaneLSH(dim, n_planes, seed)

    def assign(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        return t.append_column("bucket", pa.array(lsh.bucket(vecs), pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    return {"dim": dim, "n_planes": n_planes, "seed": seed, "index_dir": index_dir}


def lsh_index_topk(
    index: dict,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe: int = 0,
) -> pd.DataFrame:
    """Probe the partitioned LSH index: read ONLY the partitions for the
    query's bucket (plus its ``multiprobe`` nearest hamming-1 buckets —
    flipping the planes with the smallest |margin| first, the standard
    multi-probe order).  Exact same scoring as :func:`lsh_topk`."""
    import os

    import ray.data as rd

    query = np.asarray(query, dtype=np.float64).reshape(-1)
    lsh = HyperplaneLSH(index["dim"], index["n_planes"], index["seed"])
    margins = (query @ lsh.planes.T).reshape(-1)
    qbucket = int(lsh.bucket(query)[0])
    probes = [qbucket]
    for plane in np.argsort(np.abs(margins))[: max(0, multiprobe)]:
        probes.append(qbucket ^ (1 << int(plane)))

    dirs = [os.path.join(index["index_dir"], f"bucket={b}") for b in probes]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pd.DataFrame({id_col: [], "score": [], "rank": []})
    ds = rd.read_parquet(paths)

    def score(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table({id_col: batch[id_col],
                         "score": pa.array(cosine_scores(vecs, query), pa.float64())})

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    df = df.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
    df["rank"] = np.arange(len(df))
    return df.reset_index(drop=True)


def build_ivf_index(
    ds,
    index_dir: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
) -> dict:
    """IVF layout: assign every row to its nearest coarse centroid and write
    hive-partitioned by cell; centroids persist beside the data so probes
    need no retraining."""
    import os

    import pyarrow.parquet as pq

    if centroids is None:
        centroids = train_ivf_centroids(ds, n_centroids, vec_col=vec_col)
    cents_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cents_ref)
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return t.append_column("cell", pa.array(d.argmin(axis=1), pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    cent_table = pa.table({
        "cell": pa.array(range(len(centroids)), pa.int64()),
        "centroid": pa.FixedSizeListArray.from_arrays(
            pa.array(np.asarray(centroids, dtype=np.float64).reshape(-1), pa.float64()),
            centroids.shape[1],
        ),
    })
    pq.write_table(cent_table, os.path.join(index_dir, "_centroids.parquet"))
    return {"index_dir": index_dir, "n_centroids": len(centroids)}


def ivf_index_topk(
    index: dict,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Probe the partitioned IVF index: read ONLY the ``nprobe`` nearest
    cells' partitions.  Exact same scoring as :func:`ivf_topk`."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    query = np.asarray(query, dtype=np.float64).reshape(-1)
    cent_t = pq.read_table(os.path.join(index["index_dir"], "_centroids.parquet"))
    cells = cent_t["cell"].to_numpy(zero_copy_only=False)
    centroids = np.stack(cent_t["centroid"].to_numpy(zero_copy_only=False))
    qd = ((centroids - query[None, :]) ** 2).sum(axis=1)
    probe_cells = cells[np.argsort(qd)[:nprobe]]

    dirs = [os.path.join(index["index_dir"], f"cell={c}") for c in probe_cells]
    paths = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not paths:
        return pd.DataFrame({id_col: [], "score": [], "rank": []})
    ds = rd.read_parquet(paths)

    def score(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table({id_col: batch[id_col],
                         "score": pa.array(cosine_scores(vecs, query), pa.float64())})

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if not len(df):
        return pd.DataFrame({id_col: [], "score": [], "rank": []})
    df = df.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
    df["rank"] = np.arange(len(df))
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF ANN (scale path #2): coarse k-means centroids, probe nprobe cells
# ---------------------------------------------------------------------------


def train_ivf_centroids(ds, n_centroids: int = 16, sample_rows: int = 2048,
                        vec_col: str = "embedding", iters: int = 8,
                        seed: int = 7) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample (IVF coarse
    quantizer).  The sample is the first ``sample_rows`` rows —
    deterministic; at scale use ds.random_sample(frac, seed)."""
    sample = ds.limit(sample_rows).to_pandas()
    X = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = X[mask].mean(axis=0)
    return cents


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Optional[np.ndarray] = None,
) -> pd.DataFrame:
    """Approximate top-k: score only rows assigned to the ``nprobe``
    centroids nearest the query.  Assignment is a vectorized map_batches;
    at scale the assignment column is written partitioned (one parquet
    partition per cell) so probes read nprobe partitions only."""
    query = np.asarray(query, dtype=np.float64).reshape(-1)
    if centroids is None:
        centroids = train_ivf_centroids(ds, n_centroids, vec_col=vec_col)
    cents_ref = ray.put(centroids)
    qd = ((centroids - query[None, :]) ** 2).sum(axis=1)
    probe_cells = set(np.argsort(qd)[:nprobe].tolist())

    def probe(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "score": pa.array([], pa.float64())})
        cents = ray.get(cents_ref)
        vecs = np.stack(batch[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        mask = np.isin(assign, list(probe_cells))
        if not mask.any():
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "score": pa.array([], pa.float64())})
        scores = cosine_scores(vecs[mask], query)
        return pa.table({id_col: batch[id_col].filter(pa.array(mask)),
                         "score": pa.array(scores, pa.float64())})

    df = ds.map_batches(probe, batch_format="pyarrow").to_pandas()
    if not len(df):
        return pd.DataFrame({id_col: [], "score": [], "rank": []})
    df = df.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
    df["rank"] = np.arange(len(df))
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------


def rrf_fuse(ranked_lists: Sequence[pd.DataFrame], id_col: str = "chunk_id",
             score_col: str = "score", n: int = 10, rrf_k: int = RRF_K) -> pd.DataFrame:
    """Fuse ranked result lists (each with id + score ordered best-first).
    rrf_score(id) = Σ_lists 1/(rrf_k + rank + 1); keeps the max original
    score seen per id (reference: retriever.py:222-255)."""
    acc: Dict = {}
    for lst in ranked_lists:
        for rank, row in enumerate(lst.itertuples(index=False)):
            rid = getattr(row, id_col)
            orig = getattr(row, score_col)
            e = acc.get(rid)
            contrib = 1.0 / (rrf_k + rank + 1)
            if e is None:
                acc[rid] = [contrib, orig]
            else:
                e[0] += contrib
                e[1] = max(e[1], orig)
    out = pd.DataFrame(
        [(rid, v[0], v[1]) for rid, v in acc.items()],
        columns=[id_col, "rrf_score", score_col],
    )
    out = out.sort_values(["rrf_score", id_col], ascending=[False, True], kind="stable").head(n)
    return out.reset_index(drop=True)
