"""Batch scoring apps — the reference CLI tools as library functions.

- ``score_documents``  — PerpDoc: one perplexity per document row
- ``score_sentences``  — SentPerp: per-sentence perplexity records
- ``score_files``      — PerplexityClient over text files: (file, perplexity)
- ``load_text_corpus`` / ``read_count_table`` / ``write_lm_counts`` — the
  raw-text and gzip-TSV count-table sources/sinks of the LM pipeline
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType


def make_doc_perp_udf(
    scorer_bc,
    skip_oov: bool = False,
    oovref_vocab_bc=None,
    skip_oov_reflm: bool = False,
):
    """text -> per-document perplexity, PerpDoc semantics (reset per row).

    With ``skip_oov`` the n-grams ending in out-of-vocabulary words are
    excluded from both the sum and N (ModelPerplexity.calculatePerplexity's
    skip path; an empty remainder scores Integer.MAX_VALUE).
    ``oovref_vocab_bc`` is a broadcast *second* LM's vocabulary (the
    ``--oovreflm`` reference): the skip decision is then taken against that
    vocabulary per PerplexityClient's rule — skip iff ends-OOV in the
    reference AND (skip_oov_reflm OR (skip_oov AND ends-OOV in the scoring
    LM))."""
    from topicrawler_spark.lm.ngrams import provider_ngrams
    from topicrawler_spark.lm.perplexity import sequence_perplexity

    @F.pandas_udf(DoubleType())
    def doc_perp(text: pd.Series) -> pd.Series:
        scorer = scorer_bc.value
        lm = scorer.lm
        ref_vocab = None if oovref_vocab_bc is None else oovref_vocab_bc.value

        def go(t):
            if not t:
                return float(2**31 - 1)
            ngrams = provider_ngrams(t, lm.order, scorer.language_code)
            # score_ngram: the scorer's distinct-ngram memo — documents in a
            # corpus share most n-grams, so each distinct one pays the
            # smoothing chain once per worker process
            return sequence_perplexity(
                lm, scorer.score_ngram, ngrams, skip_oov, ref_vocab, skip_oov_reflm
            )

        return text.map(go)

    return doc_perp


def score_documents(
    df: DataFrame,
    scorer_bc,
    text_col: str = "text",
    skip_oov: bool = False,
    oovref_vocab_bc=None,
    skip_oov_reflm: bool = False,
) -> DataFrame:
    return df.withColumn(
        "perplexity",
        make_doc_perp_udf(scorer_bc, skip_oov, oovref_vocab_bc, skip_oov_reflm)(
            F.col(text_col)
        ),
    )


def reference_vocab_split(
    ngrams_df: DataFrame,
    ref_vocab: DataFrame,
    ngram_col: str = "ngram",
    word_col: str = "word",
) -> tuple[DataFrame, DataFrame]:
    """The ``--oovreflm`` join at corpus scale: split n-grams by whether the
    LAST word is in a second reference LM's vocabulary (kept, oov_dropped).
    A broadcast-or-SMJ semi/anti join pair on the last word — the relational
    twin of the per-row ends-with-OOV check."""
    last = F.element_at(F.split(F.col(ngram_col), " "), -1)
    tagged = ngrams_df.withColumn("_lw", last)
    ref = ref_vocab.select(F.col(word_col).alias("_lw")).distinct()
    kept = tagged.join(ref, "_lw", "left_semi").drop("_lw")
    dropped = tagged.join(ref, "_lw", "left_anti").drop("_lw")
    return kept, dropped


_SENT_PERP_TYPE = ArrayType(
    StructType([StructField("sentence", StringType()), StructField("perp", DoubleType())])
)


def score_sentences(
    df: DataFrame, scorer_bc, text_col: str = "text", skip_oov: bool = False
) -> DataFrame:
    """Per-sentence perplexity records (SentPerp's TSV shape)."""
    from topicrawler_spark.lm.ngrams import provider_ngrams
    from topicrawler_spark.lm.perplexity import sequence_perplexity

    @F.pandas_udf(_SENT_PERP_TYPE)
    def sent_perp(text: pd.Series) -> pd.Series:
        scorer = scorer_bc.value
        lm = scorer.lm

        def go(t):
            out = []
            for s in scorer.sentence_maker.sentences(t or ""):
                ngrams = provider_ngrams(s, lm.order, scorer.language_code)
                out.append({"sentence": s, "perp": sequence_perplexity(lm, scorer.score_ngram, ngrams, skip_oov)})
            return out

        return text.map(go)

    return df.select("*", F.posexplode(sent_perp(F.col(text_col))).alias("seq_no", "sp")).select(
        "*", F.col("sp.sentence").alias("sentence"), F.col("sp.perp").alias("perp")
    ).drop("sp")


def score_files(spark: SparkSession, path: str, scorer_bc, skip_oov: bool = False) -> DataFrame:
    """(file, perplexity) over a directory of text files (PerplexityClient)."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value").alias("line")
    )
    docs = raw.groupBy("file").agg(F.concat_ws("\n", F.collect_list("line")).alias("text"))
    return score_documents(docs, scorer_bc, skip_oov=skip_oov).select("file", "perplexity")


def load_text_corpus(spark: SparkSession, path: str, onedocperline: bool = False) -> DataFrame:
    """Raw .txt corpus source (the Ngrams app's file/stdin reader)."""
    raw = spark.read.text(path)
    if onedocperline:
        return raw.select(F.col("value").alias("text")).filter(F.trim("text") != "")
    return (
        raw.select(F.input_file_name().alias("file"), F.col("value").alias("line"))
        .groupBy("file")
        .agg(F.concat_ws("\n", F.collect_list("line")).alias("text"))
        .select("text")
    )


def read_count_table(spark: SparkSession, path: str) -> DataFrame:
    """gzip TSV ``ngram \\t count`` source (the shell pipeline's tables)."""
    return (
        spark.read.option("sep", "\t")
        .schema("ngram string, cnt long")
        .csv(path)
        .withColumn("n", F.size(F.split("ngram", " ")))
    )


def write_lm_counts(lm_counts: DataFrame, path: str) -> None:
    """Persist the joined count table (the Lucene-index-equivalent store),
    partitioned by order for partition-pruned lookups."""
    lm_counts.write.mode("overwrite").partitionBy("n").parquet(path)
