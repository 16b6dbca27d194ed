"""Parity: the join-based corpus-scale scorers (Laplace, Stupid Backoff,
Kneser-Ney for bigrams) must reproduce the reference-pinned LocalLM
(mapbased/LaplaceSmoothedLM, lucenebased/StupidBackoffLM.score,
lucenebased/KneserNeyLM.kn) on the same count tables — including the
backoff/early-return branches exercised by unseen and OOV bigrams."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from topicrawler_spark.lm.counting import (
    count_ngrams,
    kn_discounts_from_histogram,
    score_kn_bigram_join,
    score_laplace_join,
    score_stupid_backoff_bigram_join,
    sum_ngrams_histogram,
)
from topicrawler_spark.lm.local import LocalLM

TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog and a bird",
    "the bird sat quietly",
    "mat",  # 1-token sentence: boundary-mode-0 short-ngram double count
    "on the mat the cat sat",
    "dogs bark and cats meow",
]


@pytest.fixture(scope="module")
def built(spark):
    seqs = [t.split() for t in TEXTS]
    lm = LocalLM.from_token_sequences(seqs, order=2)
    sentences = spark.createDataFrame([(s,) for s in seqs], "tokens array<string>")
    counts = count_ngrams(sentences, order=2).cache()
    counts.count()
    bigrams = counts.filter(F.col("n") == 2).select("ngram")
    toks = F.split(F.col("ngram"), " ")
    reversed_ = bigrams.select(F.concat_ws(" ", toks[1], toks[0]).alias("ngram"))
    oov = spark.createDataFrame(
        [("cat zzz",), ("zzz cat",), ("zzz qqq",)], "ngram string"
    )
    cand = bigrams.unionByName(reversed_).unionByName(oov).distinct()
    return lm, counts, cand


def test_count_table_parity(spark, built):
    lm, counts, _ = built
    got = {r["ngram"]: r["cnt"] for r in counts.collect()}
    assert got == lm.counts


def test_kn_discounts_helper_parity(spark, built):
    lm, counts, _ = built
    N, _ = sum_ngrams_histogram(counts)
    assert kn_discounts_from_histogram(N, 2) == pytest.approx(lm.kn_discounts()[:3])


def test_laplace_join_parity(spark, built):
    lm, counts, cand = built
    got = {
        r["ngram"]: r["log10p"]
        for r in score_laplace_join(cand, counts).collect()
    }
    for g, v in got.items():
        assert v == pytest.approx(lm.laplace_log10(g.split(" ")), rel=1e-9), g


def test_stupid_backoff_join_parity(spark, built):
    lm, counts, cand = built
    got = {
        r["ngram"]: r["sb_log10"]
        for r in score_stupid_backoff_bigram_join(cand, counts).collect()
    }
    assert got, "no candidates scored"
    for g, v in got.items():
        assert v == pytest.approx(lm.stupid_backoff_log10(g.split(" ")), rel=1e-9), g


def test_kn_join_parity(spark, built):
    lm, counts, cand = built
    got = {
        r["ngram"]: r["kn_log10"]
        for r in score_kn_bigram_join(cand, counts).collect()
    }
    assert got, "no candidates scored"
    # the candidate set must exercise seen, unseen-but-in-vocab, and OOV paths
    for g, v in got.items():
        want = lm.kneser_ney_log10(g.split(" "))
        assert math.isfinite(v), g
        assert v == pytest.approx(want, rel=1e-9), g
