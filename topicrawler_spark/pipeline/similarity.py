"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. Dot products via ``F.zip_with``
  + ``F.aggregate`` (JVM-side) or an Arrow/numpy UDF (vectorized matmul);
  both provided, numpy is the fast path for wide vectors.
- LSH-bucketed ANN: random-hyperplane signatures -> bucket join; the scale
  path (candidates share >= 1 of n_tables signatures; exact cosine re-rank).
- IVF-bucketed ANN: spherical k-means coarse quantizer trained on a bounded
  deterministic sample, one vectorized Arrow assignment pass over the
  corpus, probe-nearest-lists semi-join, exact cosine re-rank (the
  FAISS-style inverted-file pattern re-expressed as DataFrame ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float> columns, pure Catalyst."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_numpy: bool = True,
) -> DataFrame:
    """Exact top-k by cosine against one query vector."""
    if use_numpy:
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)

        @F.pandas_udf(DoubleType())
        def cos(vs: pd.Series) -> pd.Series:
            m = np.stack(vs.to_numpy())  # (batch, dim) one matmul per Arrow batch
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            return pd.Series(m @ q / (norms * qn))

        scored = embeddings.select(F.col(id_col), cos(F.col(vec_col)).alias("cosine"))
    else:
        qcol = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
        scored = embeddings.select(
            F.col(id_col),
            cosine_expr(F.col(vec_col).cast("array<double>"), qcol).alias("cosine"),
        )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) random-hyperplane signatures: bucket = sign bits
    of n_planes projections per table."""
    planes = _hyperplanes(dim, n_tables * n_planes, seed)

    @F.pandas_udf(ArrayType(DoubleType()))
    def project(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        proj = m @ planes.T  # (batch, tables*planes)
        return pd.Series(list(proj))

    projected = embeddings.select(F.col(id_col).alias("vec_id"), project(F.col(vec_col)).alias("proj"))
    powers = [1 << p for p in range(n_planes)]
    buckets = projected.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_tables - 1)),
                lambda t: F.aggregate(
                    F.sequence(F.lit(0), F.lit(n_planes - 1)),
                    F.lit(0).cast("long"),
                    lambda acc, p: acc
                    + F.when(
                        F.element_at("proj", (t * n_planes + p + 1).cast("int")) > 0,
                        F.element_at(F.array(*[F.lit(x).cast("long") for x in powers]), p + 1),
                    ).otherwise(F.lit(0).cast("long")),
                ),
            )
        ).alias("table", "bucket"),
    )
    return buckets


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the query's buckets, exact re-rank inside."""
    dim = len(query_vec)
    sigs = lsh_signatures(embeddings, dim, n_tables, n_planes, seed, id_col, vec_col)
    planes = _hyperplanes(dim, n_tables * n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    proj = planes @ q
    probe = []
    for t in range(n_tables):
        bucket = 0
        for p in range(n_planes):
            if proj[t * n_planes + p] > 0:
                bucket |= 1 << p
        probe.append((t, bucket))
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame(probe, "table int, bucket long")
    cand_ids = sigs.join(F.broadcast(probe_df), ["table", "bucket"], "left_semi").select("vec_id").distinct()
    cands = embeddings.join(
        cand_ids.withColumnRenamed("vec_id", id_col) if id_col != "vec_id" else cand_ids,
        id_col,
        "left_semi",
    )
    return brute_force_topk(cands, query_vec, k, id_col, vec_col)


def all_pairs_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Per-vector approximate k nearest neighbors via LSH bucket self-join +
    exact cosine re-rank (the corpus-vs-corpus scale pattern)."""
    first = embeddings.select(vec_col).first()
    dim = len(first[vec_col])
    sigs = lsh_signatures(embeddings, dim, n_tables, n_planes, seed, id_col, vec_col)
    l, r = sigs.alias("l"), sigs.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") != F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("a"), F.col("r.vec_id").alias("b"))
        .distinct()
    )
    ea = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    eb = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    scored = (
        pairs.join(ea, "a").join(eb, "b").withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
    )
    w = Window.partitionBy("a").orderBy(F.desc("cosine"), F.col("b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("a", "b", "cosine", "rank")
    )


def _ivf_sample(
    embeddings: DataFrame, id_col: str, vec_col: str, sample_cap: int
) -> np.ndarray:
    """Deterministic bounded training sample for the coarse quantizer.

    Hash-gated (xxhash64 pmod), never a global sort: the same rows are
    chosen at any partitioning and the collected matrix is bounded by
    ``sample_cap`` rows regardless of corpus size — the standard IVF
    training regime (FAISS trains its quantizer on a sample too; only the
    centroid table, n_centroids x dim, ever lives on the driver)."""
    n = embeddings.count()
    if n > sample_cap:
        # keep-one-in-m hash gate (expected ~sample_cap survivors), then a
        # deterministic id-ordered cap — the sort runs over the already
        # gated ~sample_cap rows, never the corpus
        m = max(2, n // sample_cap)
        sample = (
            embeddings.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)) == 0)
            .orderBy(id_col)
            .limit(sample_cap)
        )
    else:
        sample = embeddings
    rows = sample.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")).collect()
    rows.sort(key=lambda r: r["_id"])  # collect order is not deterministic; id order is
    return np.asarray([list(r["_v"]) for r in rows], dtype=np.float64)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 100_000,
) -> np.ndarray:
    """Spherical k-means (Lloyd on L2-normalized vectors, cosine metric)
    over a bounded deterministic sample. Returns (n_centroids, dim),
    rows L2-normalized. Deterministic for a given (input, seed)."""
    mat = _ivf_sample(embeddings, id_col, vec_col, sample_cap)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    k = min(n_centroids, len(unit))
    rng = np.random.default_rng(seed)
    cent = unit[rng.choice(len(unit), size=k, replace=False)].copy()
    for _ in range(n_iters):
        assign = np.argmax(unit @ cent.T, axis=1)  # cosine == dot on unit rows
        for c in range(k):
            members = unit[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
            else:
                # re-seed an empty list from the point farthest from its centroid
                far = int(np.argmin((unit * cent[assign]).sum(axis=1)))
                cent[c] = unit[far]
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id) inverted-file assignment: nearest centroid by cosine,
    one batch matmul per Arrow batch. At corpus scale this is the one full
    pass that builds the IVF index; it writes a list_id-partitionable
    table, so probes touch only n_probe/n_centroids of the data."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return pd.Series(np.argmax((m / n) @ cent.T, axis=1).astype(np.int32))

    return embeddings.select(
        F.col(id_col), nearest(F.col(vec_col)).alias("list_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: rank centroids against the query driver-side
    (n_centroids dot products), semi-join the n_probe nearest lists, exact
    cosine re-rank inside. Pass precomputed ``centroids``/``assignments``
    to amortize the index across queries (the at-scale deployment shape —
    the index is built once per corpus snapshot, queries only pay the
    probed fraction)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, n_iters, seed, id_col, vec_col
        )
    if assignments is None:
        assignments = ivf_assign(embeddings, centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0:
        qn = 1.0
    order = np.argsort(-(centroids @ (q / qn)), kind="stable")
    probe = [int(c) for c in order[: min(n_probe, len(centroids))]]
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame([(c,) for c in probe], "list_id int")
    cand_ids = assignments.join(
        F.broadcast(probe_df), "list_id", "left_semi"
    ).select(id_col)
    cands = embeddings.join(cand_ids, id_col, "left_semi")
    return brute_force_topk(cands, query_vec, k, id_col, vec_col)
