"""Distributed n-gram counting — the LM *build* side, pure Spark aggregations.

Replaces the reference's five shell/hadoop MapReduce jobs + sorted-file merge
(count, vocab, nfollow, nprecede, nfollowerprecede joined into one table)
with ``groupBy`` aggregations and three left joins. All window generation is
JVM-side (``sequence``/``slice``/``array_join``); only the tokenizer itself is
a pandas UDF.

Output schema (the ``lm_counts`` table):
  ngram:string, n:int, cnt:long,
  nf_N1,nf_N2,nf_N3,np_N1,np_N2,np_N3,nfp_N1,nfp_N2,nfp_N3:long (nullable)

Scale notes: counting shuffles once per aggregation on the ngram string (a
high-cardinality, well-distributed key — no salting needed); partial
aggregation (map-side combine) is automatic. The three continuation-count
joins are equi-joins on the same key; with AQE they become a single shuffle
reuse + sort-merge joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from topicrawler_spark.functions.udfs import make_lm_tokens_udf
from topicrawler_spark.lm.local import LocalLM


def ngram_windows(tokens: Column, n: int, boundary_mode: int = 0) -> Column:
    """array<string> -> array<array<string>> sliding windows of size n with
    the reference's boundary-mode-0 semantics (short sequences produce one
    short n-gram). JVM-side only."""
    size = F.size(tokens)
    slid = F.transform(
        F.sequence(F.lit(1), size - F.lit(n) + 1), lambda i: F.slice(tokens, i, F.lit(n))
    )
    if boundary_mode == -1:
        return F.when(size >= n, slid).otherwise(F.array().cast("array<array<string>>"))
    # mode 0: one short ngram when the sequence is shorter than the order
    return F.when(size <= n, F.array(tokens)).otherwise(slid)


def sentences_tokens(df: DataFrame, text_col: str = "text", language_code: str = "default") -> DataFrame:
    """documents -> one row per tokenized sentence (column ``tokens``)."""
    lm_tokens = make_lm_tokens_udf(language_code)
    return df.select(F.explode(lm_tokens(F.col(text_col))).alias("tokens"))


def count_ngrams(
    sentences: DataFrame,
    order: int,
    mincount: int = 1,
    boundary_mode: int = 0,
) -> DataFrame:
    """(tokens: array<string>) -> (ngram, n, cnt) for all orders 1..order."""
    per_order = []
    for n in range(1, order + 1):
        per_order.append(
            sentences.select(
                F.explode(ngram_windows(F.col("tokens"), n, boundary_mode)).alias("gram")
            ).select(F.array_join("gram", " ").alias("ngram"))
        )
    all_ngrams = per_order[0]
    for d in per_order[1:]:
        all_ngrams = all_ngrams.unionAll(d)
    counted = (
        all_ngrams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("n", F.size(F.split("ngram", " ")))
    )
    if mincount > 1:
        counted = counted.filter(F.col("cnt") >= mincount)
    return counted.select("ngram", "n", "cnt")


def _continuation(counts: DataFrame, key: Column, prefix: str) -> DataFrame:
    """The nfollow/nprecede/nfollowerprecede reducer as one groupBy."""
    return (
        counts.select(key.alias("key"), "cnt")
        .groupBy("key")
        .agg(
            F.count(F.when(F.col("cnt") == 1, 1)).alias(f"{prefix}_N1"),
            F.count(F.when(F.col("cnt") == 2, 1)).alias(f"{prefix}_N2"),
            F.count(F.when(F.col("cnt") >= 3, 1)).alias(f"{prefix}_N3"),
        )
    )


def _drop_last(ngram: Column) -> Column:
    toks = F.split(ngram, " ")
    return F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ")


def _drop_first(ngram: Column) -> Column:
    toks = F.split(ngram, " ")
    return F.array_join(F.slice(toks, 2, F.size(toks) - 1), " ")


def _middle(ngram: Column) -> Column:
    toks = F.split(ngram, " ")
    return F.array_join(F.slice(toks, 2, F.size(toks) - 2), " ")


def build_lm_counts(counts: DataFrame) -> DataFrame:
    """counts + the three continuation tables, left-joined on the ngram key
    (the reference's sorted ``join -a1`` merge; Catalyst picks SMJ/AQE)."""
    multi = counts.filter(F.col("n") > 1)
    nf = _continuation(multi, _drop_last(F.col("ngram")), "nf")
    np_ = _continuation(multi, _drop_first(F.col("ngram")), "np")
    nfp = _continuation(counts.filter(F.col("n") > 2), _middle(F.col("ngram")), "nfp")
    out = (
        counts.join(nf, counts["ngram"] == nf["key"], "left")
        .drop("key")
        .join(np_, counts["ngram"] == np_["key"], "left")
        .drop("key")
        .join(nfp, counts["ngram"] == nfp["key"], "left")
        .drop("key")
    )
    return out


def sum_ngrams_histogram(counts: DataFrame) -> tuple[list[list[int]], list[int]]:
    """The ``__sum_ngrams__`` histogram: N[n][class 0..5], S[n]. Tiny result,
    collected to the driver."""
    rows = (
        counts.groupBy("n", F.least(F.col("cnt"), F.lit(5)).alias("cls"))
        .agg(F.count(F.lit(1)).alias("num"), F.sum("cnt").alias("total"))
        .collect()
    )
    max_n = max((r["n"] for r in rows), default=0)
    N = [[0] * 6 for _ in range(max_n + 1)]
    S = [0] * (max_n + 1)
    for r in rows:
        N[r["n"]][r["cls"]] += r["num"]
        N[r["n"]][0] += r["num"]
        S[r["n"]] += r["total"]
    return N, S


def build_local_lm(
    spark: SparkSession,
    documents: DataFrame,
    order: int,
    text_col: str = "text",
    mincount: int = 1,
    language_code: str = "default",
) -> LocalLM:
    """End-to-end LM build: documents -> Spark counting -> driver LocalLM.

    The seed-topic LM is bounded by the seed corpus (not the crawl), so the
    collected table fits the driver by design; at larger corpus scales keep
    the DataFrame and use the join-based scorers instead.
    """
    sentences = sentences_tokens(documents, text_col, language_code)
    counts = count_ngrams(sentences, order, mincount)
    pairs = counts.select("ngram", "cnt").collect()
    return LocalLM.from_counts({r["ngram"]: r["cnt"] for r in pairs}, order)


def score_mle_join(
    ngrams_df: DataFrame,
    lm_counts: DataFrame,
    ngram_col: str = "ngram",
) -> DataFrame:
    """Join-based MLE log10 scoring for corpus-scale LMs: two broadcast-or-SMJ
    equi-joins instead of an in-memory dict. Adds ``log10p``."""
    c_ngram = lm_counts.select(F.col("ngram").alias("_g"), F.col("cnt").alias("_c"))
    c_hist = lm_counts.select(F.col("ngram").alias("_h"), F.col("cnt").alias("_hc"))
    n_unigrams = lm_counts.filter(F.col("n") == 1).count()
    toks = F.split(F.col(ngram_col), " ")
    hist = F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ")
    out = (
        ngrams_df.withColumn("_hist", hist)
        .join(c_ngram, F.col(ngram_col) == F.col("_g"), "left")
        .join(c_hist, F.col("_hist") == F.col("_h"), "left")
    )
    uni = F.log10(F.col("_c")) - F.lit(float(__import__("math").log10(max(n_unigrams, 1))))
    multi = F.log10(F.col("_c")) - F.log10(F.col("_hc"))
    log10p = (
        F.when(F.col("_c").isNull(), F.lit(float("-inf")))
        .when(F.size(toks) == 1, uni)
        .when(F.col("_hc").isNull(), F.lit(float("-inf")))
        .otherwise(multi)
    )
    return out.withColumn("log10p", log10p).drop("_g", "_c", "_h", "_hc", "_hist")
