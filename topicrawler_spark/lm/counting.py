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


def score_laplace_join(
    ngrams_df: DataFrame,
    lm_counts: DataFrame,
    ngram_col: str = "ngram",
) -> DataFrame:
    """Join-based Laplace (add-one) log10 scoring: mirrors
    ``LocalLM.laplace_log10`` (mapbased/LaplaceSmoothedLM) as two equi-joins.
    Unigrams normalize by (total tokens + V); higher orders by
    (c(hist) + V). Adds ``log10p``."""
    uni_stats = lm_counts.filter(F.col("n") == 1).agg(
        F.count(F.lit(1)).alias("V"), F.sum("cnt").alias("S1")
    ).collect()[0]
    V, S1 = int(uni_stats["V"]), int(uni_stats["S1"] or 0)
    c_ngram = lm_counts.select(F.col("ngram").alias("_g"), F.col("cnt").alias("_c"))
    c_hist = lm_counts.select(F.col("ngram").alias("_h"), F.col("cnt").alias("_hc"))
    toks = F.split(F.col(ngram_col), " ")
    hist = F.array_join(F.slice(toks, 1, F.size(toks) - 1), " ")
    out = (
        ngrams_df.withColumn("_hist", hist)
        .join(c_ngram, F.col(ngram_col) == F.col("_g"), "left")
        .join(c_hist, F.col("_hist") == F.col("_h"), "left")
    )
    nom = F.coalesce(F.col("_c"), F.lit(0)) + F.lit(1)
    log10p = F.when(
        F.size(toks) == 1, F.log10(nom) - F.lit(float(__import__("math").log10(S1 + V)))
    ).otherwise(F.log10(nom) - F.log10(F.coalesce(F.col("_hc"), F.lit(0)) + F.lit(V)))
    return out.withColumn("log10p", log10p).drop("_g", "_c", "_h", "_hc", "_hist")


def _bigram_side_tables(lm_counts: DataFrame):
    """Per-word count/continuation dimensions derived from the count table:
    c1/c2 (unigram counts), nf_tot (distinct successors of w), np_tot
    (distinct predecessors of w)."""
    uni = lm_counts.filter(F.col("n") == 1)
    big = lm_counts.filter(F.col("n") == 2)
    w_of = lambda i: F.split(F.col("ngram"), " ")[i]  # noqa: E731
    nf = big.groupBy(w_of(0).alias("_w")).agg(F.count(F.lit(1)).alias("_nf"))
    np_ = big.groupBy(w_of(1).alias("_w")).agg(F.count(F.lit(1)).alias("_np"))
    return uni, big, nf, np_


def score_stupid_backoff_bigram_join(
    bigrams_df: DataFrame,
    lm_counts: DataFrame,
    discount: float = 0.4,
    ngram_col: str = "ngram",
) -> DataFrame:
    """Join-based Stupid Backoff scoring of bigrams at order 2, mirroring
    ``LocalLM.stupid_backoff`` (lucenebased/StupidBackoffLM.score) including
    its early-return quirks: an OOV last word scores ud = discount/(U+1);
    a seen bigram scores c12/c1; otherwise the unigram score c(w2)/U with
    NO extra discount at the top order. Adds ``sb_log10``."""
    uni, big, _nf, _np = _bigram_side_tables(lm_counts)
    U = uni.count()
    ud = discount / (U + 1.0)
    toks = F.split(F.col(ngram_col), " ")
    w1, w2 = toks[0], toks[1]
    c12 = big.select(F.col("ngram").alias("_g12"), F.col("cnt").alias("_c12"))
    c1 = uni.select(F.col("ngram").alias("_g1"), F.col("cnt").alias("_c1"))
    c2 = uni.select(F.col("ngram").alias("_g2"), F.col("cnt").alias("_c2"))
    out = (
        bigrams_df.join(c12, F.col(ngram_col) == F.col("_g12"), "left")
        .join(c1, w1 == F.col("_g1"), "left")
        .join(c2, w2 == F.col("_g2"), "left")
    )
    score = (
        F.when(F.col("_c2").isNull(), F.lit(ud))  # ends_with_oov
        .when(F.col("_c12").isNotNull(), F.col("_c12") / F.col("_c1"))
        .otherwise(F.col("_c2") / F.lit(float(U)))
    )
    return out.withColumn("sb_log10", F.log10(score)).drop("_g12", "_c12", "_g1", "_c1", "_g2", "_c2")


def kn_discounts_from_histogram(N: list[list[int]], order: int, discount: float = -1.0) -> list[float]:
    """Per-order KN discounts D = N1/(N1+2*N2) with the reference's
    monotonicity fix-ups (lucenebased/KneserNeyLM discount estimation;
    parity with ``LocalLM.kn_discounts`` is pytest-pinned)."""
    D = [0.7] * (order + 1)
    if 0 <= discount <= 1:
        return [discount] * (order + 1)
    for n in range(1, order + 1):
        Nn = list(N[n])
        for i in range(len(Nn) - 1, 1, -1):
            if Nn[i] == 0:
                Nn[i] = 1
            if i * Nn[i] >= (i - 1) * Nn[i - 1]:
                Nn[i - 1] = Nn[i] * i + 1
        D[n] = Nn[1] / (Nn[1] + 2.0 * Nn[2])
    return D


def score_kn_bigram_join(
    bigrams_df: DataFrame,
    lm_counts: DataFrame,
    discount: float = -1.0,
    ngram_col: str = "ngram",
) -> DataFrame:
    """Join-based interpolated modified Kneser-Ney scoring of bigrams at
    order 2 — the corpus-scale twin of ``LocalLM.kneser_ney``
    (lucenebased/KneserNeyLM.kn), branch-for-branch for n=2:

    - unigram continuation p = np_tot(w2)/B, falling back to c(w2)/S1 then
      1/U when w2 has no predecessors / no count
    - top order p = max(c12-D2,0)/c1 + D2*max(nf_tot(w1),1)/c1 * p_cont
      (the nf==0 pruning reset), degrading to the continuation prob when
      c(w1)=0 and to punk when w2 is OOV
    - punk = nf_tot(w1)/B * D1/U (ud when w1 has no successors), and the
      final [punk, 1.0] clamp

    Scalars (U, B, S1, D) are a 12-number histogram collect; everything
    row-wise is broadcast-or-SMJ equi-joins on words. Adds ``kn_log10``."""
    uni, big, nf, np_ = _bigram_side_tables(lm_counts)
    N, S = sum_ngrams_histogram(lm_counts)
    D = kn_discounts_from_histogram(N, 2, discount)
    U, B, S1 = N[1][0], N[2][0], S[1]
    D1, D2 = float(D[1]), float(D[2])
    ud = (1.0 / B) * (D1 / U)
    toks = F.split(F.col(ngram_col), " ")
    w1, w2 = toks[0], toks[1]
    c12 = big.select(F.col("ngram").alias("_g12"), F.col("cnt").alias("_c12"))
    c1 = uni.select(F.col("ngram").alias("_g1"), F.col("cnt").alias("_c1"))
    c2 = uni.select(F.col("ngram").alias("_g2"), F.col("cnt").alias("_c2"))
    out = (
        bigrams_df.join(c12, F.col(ngram_col) == F.col("_g12"), "left")
        .join(c1, w1 == F.col("_g1"), "left")
        .join(c2, w2 == F.col("_g2"), "left")
        .join(nf.withColumnRenamed("_w", "_wnf"), w1 == F.col("_wnf"), "left")
        .join(np_.withColumnRenamed("_w", "_wnp"), w2 == F.col("_wnp"), "left")
    )
    punk = F.when(F.col("_nf").isNull(), F.lit(ud)).otherwise(
        (F.col("_nf") / F.lit(float(B))) * F.lit(D1 / U)
    )
    p_cont = F.col("_np") / F.lit(float(B))
    nfh = F.coalesce(F.col("_nf"), F.lit(1)).cast("double")
    p_top = F.greatest(F.coalesce(F.col("_c12"), F.lit(0)).cast("double") - F.lit(D2), F.lit(0.0)) / F.col("_c1")
    pkn2 = p_top + (F.lit(D2) * nfh / F.col("_c1")) * p_cont
    pkn = (
        F.when(F.col("_c2").isNull(), punk)  # ends_with_oov
        # np_total(w2)==0 is an EARLY return in the reference recursion:
        # c(w2)/S1 (w2 never follows anything), skipping top-order entirely
        .when(F.col("_np").isNull(), F.col("_c2") / F.lit(float(S1)))
        .when(F.col("_c1").isNull(), p_cont)  # ch==0: return the continuation prob
        .otherwise(pkn2)
    )
    prob = F.least(F.greatest(pkn, punk), F.lit(1.0))
    return out.withColumn("kn_log10", F.log10(prob)).drop(
        "_g12", "_c12", "_g1", "_c1", "_g2", "_c2", "_wnf", "_nf", "_wnp", "_np"
    )
