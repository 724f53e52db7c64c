"""Approximate-nearest-neighbor search over an embedding column
(driver brief: brute-force cosine top-k baseline + LSH/IVF scale path).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_sim


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query_vec: Sequence[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k: one map stage (JVM-side zip_with dot
    product) + a global top-k (Spark's orderBy+limit compiles to
    TakeOrderedAndProject — per-partition heaps, O(k) shuffle, no full
    sort). The scan-everything baseline."""
    sim = cosine_sim(F.col(vec_col), _query_lit(query_vec))
    return (df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
              .orderBy(F.desc("cosine"), F.col(id_col))
              .limit(k))


def hyperplane_signature(vec_col, planes: np.ndarray):
    return F.concat(*[
        F.when(F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in p]),
                       lambda u, w: u * w),
            F.lit(0.0), lambda acc, v: acc + v) >= 0,
            F.lit("1")).otherwise(F.lit("0"))
        for p in planes])


def build_lsh_index(df: DataFrame, id_col: str, vec_col: str,
                    planes: int = 10, seed: int = 11) -> DataFrame:
    """Materializable LSH 'index': rows bucketed by hyperplane signature.
    At scale, write this out partitioned/bucketed by `bucket` so probes
    prune to one partition."""
    dim = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    hp = rng.randn(planes, dim)
    return df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_signature(F.col(vec_col), hp).alias("bucket"),
    ), hp


def lsh_topk(index_df: DataFrame, hp: np.ndarray, id_col: str, vec_col: str,
             query_vec: Sequence[float], k: int = 10,
             probe_hamming: int = 1) -> DataFrame:
    """ANN probe: scan only buckets whose signature is within
    ``probe_hamming`` bit-flips of the query's bucket (multi-probe LSH),
    then exact cosine within the candidate set."""
    q = np.asarray(query_vec, dtype=float)
    qsig = "".join("1" if float(np.dot(p, q)) >= 0 else "0" for p in hp)
    probes = {qsig}
    if probe_hamming >= 1:
        for i in range(len(qsig)):
            flipped = qsig[:i] + ("0" if qsig[i] == "1" else "1") + qsig[i + 1:]
            probes.add(flipped)
    cand = index_df.filter(F.col("bucket").isin(*probes))
    sim = cosine_sim(F.col(vec_col), _query_lit(query_vec))
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col)).limit(k))


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """IVF cell assignment: argmax cosine against a (small, broadcast as
    literals) centroid table — one map stage. Centroids come from a sample
    (driver-side numpy k-means on .sample(); the 100 TB path trains on a
    bounded sample, standard IVF practice)."""
    sims = [cosine_sim(F.col(vec_col), _query_lit(c)) for c in centroids]
    best = F.greatest(*sims) if len(sims) > 1 else sims[0]
    cell = F.lit(0)
    for i, s in enumerate(sims):
        cell = F.when(s == best, F.lit(i)).otherwise(cell)
    return df.withColumn("ivf_cell", cell)


def train_centroids(df: DataFrame, vec_col: str, n_cells: int = 16,
                    sample_rows: int = 10000, iters: int = 10,
                    seed: int = 3) -> np.ndarray:
    """Driver-side mini k-means on a bounded sample."""
    rows = df.select(vec_col).limit(sample_rows).collect()
    X = np.array([r[0] for r in rows], dtype=float)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = X[assign == j]
            if len(m):
                c = m.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_topk(df: DataFrame, id_col: str, vec_col: str,
             query_vec: Sequence[float], centroids: np.ndarray,
             k: int = 10, n_probe: int = 2) -> DataFrame:
    """IVF probe: exact cosine within the ``n_probe`` nearest cells only."""
    q = np.asarray(query_vec, dtype=float)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ q))[:n_probe]
    assigned = ivf_assign(df, vec_col, centroids)
    cand = assigned.filter(F.col("ivf_cell").isin(*[int(i) for i in order]))
    sim = cosine_sim(F.col(vec_col), _query_lit(query_vec))
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col)).limit(k))
