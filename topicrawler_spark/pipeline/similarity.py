"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline. Dot products via ``F.zip_with``
  + ``F.aggregate`` (JVM-side) or an Arrow/numpy UDF (vectorized matmul);
  both provided, numpy is the fast path for wide vectors.
- LSH-bucketed ANN: random-hyperplane signatures -> bucket join; the scale
  path (candidates share >= 1 of n_tables signatures; exact cosine re-rank).
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
