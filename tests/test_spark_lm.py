"""Cross-validation: the distributed Spark counting pipeline must produce
exactly the count tables the pure-Python builder produces, and the UDF layer
must reproduce the plain-function outputs."""

from __future__ import annotations

import os

import pytest

from topicrawler_spark.lm.counting import (
    build_lm_counts,
    count_ngrams,
    sentences_tokens,
    sum_ngrams_histogram,
)
from topicrawler_spark.lm.local import LocalLM

CAT = "/root/reference/lt.lm/src/test/resources/cat/cat.txt"


@pytest.fixture(scope="module")
def cat_text():
    if not os.path.isfile(CAT):
        pytest.skip("reference fixtures unavailable")
    return open(CAT, encoding="utf-8").read()


def test_spark_counts_match_python(spark, cat_text):
    order = 3
    docs = spark.createDataFrame([(cat_text,)], "text string")
    counts_df = count_ngrams(sentences_tokens(docs), order)
    spark_counts = {r["ngram"]: r["cnt"] for r in counts_df.collect()}
    py_lm = LocalLM.from_texts([cat_text], order=order)
    assert spark_counts == py_lm.counts


def test_lm_counts_join_matches_python(spark, cat_text):
    order = 3
    docs = spark.createDataFrame([(cat_text,)], "text string")
    counts_df = count_ngrams(sentences_tokens(docs), order)
    joined = build_lm_counts(counts_df)
    py_lm = LocalLM.from_texts([cat_text], order=order)
    for r in joined.collect():
        g = r["ngram"]
        nf = (r["nf_N1"] or 0, r["nf_N2"] or 0, r["nf_N3"] or 0)
        np_ = (r["np_N1"] or 0, r["np_N2"] or 0, r["np_N3"] or 0)
        nfp = (r["nfp_N1"] or 0, r["nfp_N2"] or 0, r["nfp_N3"] or 0)
        assert nf == py_lm.nf.get(g, (0, 0, 0)), ("nf", g)
        assert np_ == py_lm.np_.get(g, (0, 0, 0)), ("np", g)
        assert nfp == py_lm.nfp.get(g, (0, 0, 0)), ("nfp", g)


def test_histogram_matches_python(spark, cat_text):
    order = 3
    docs = spark.createDataFrame([(cat_text,)], "text string")
    counts_df = count_ngrams(sentences_tokens(docs), order)
    N, S = sum_ngrams_histogram(counts_df)
    py_lm = LocalLM.from_texts([cat_text], order=order)
    for n in range(1, order + 1):
        assert N[n] == py_lm.N[n], n
        assert S[n] == py_lm.S[n], n


def test_extraction_udf_matches_plain(spark):
    from topicrawler_spark.functions.cleaning import clean_ext
    from topicrawler_spark.functions.jsouptext import extract_text
    from topicrawler_spark.functions.udfs import make_extract_text_udf

    pages = [
        ("u1", "<html><body><p>Hello World</p><a href='x.html'>x</a></body></html>"),
        ("u2", "<p>one</p>\n<p>two\nlines</p>"),
        ("u3", "<script>skip()</script><div>kept</div>"),
    ]
    df = spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in pages], "url string, html binary"
    )
    out = {r["url"]: r["text"] for r in df.select("url", make_extract_text_udf("ext")("html").alias("text")).collect()}
    for u, h in pages:
        assert out[u] == extract_text(h, clean_ext), u


def test_outlinks_udf(spark):
    html = (
        '<html><body><a href="b.html">b</a><a href="http://other.example/x">x</a>'
        '<a href="javascript:void(0)">no</a><img src="i.png"></body></html>'
    ).encode("utf-8")
    df = spark.createDataFrame([("http://host.example/a.html", html)], "url string, html binary")
    from topicrawler_spark.functions.udfs import extract_outlinks_udf

    rows = df.select(extract_outlinks_udf("html", "url").alias("links")).collect()
    links = [(x["url"], x["hop"]) for x in rows[0]["links"]]
    assert ("http://host.example/b.html", "L") in links
    assert ("http://other.example/x", "L") in links
    assert ("http://host.example/i.png", "E") in links
    assert all(not u.startswith("javascript") for u, _ in links)


def test_perplexity_udf_matches_driver(spark, cat_text):
    from topicrawler_spark.functions.udfs import make_perplexity_udf
    from topicrawler_spark.lm.perplexity import DocumentScorer

    lm = LocalLM.from_texts([cat_text], order=3)
    scorer = DocumentScorer(lm, "kneser-ney")
    texts = [
        "The cat sat on the mat. The cat was happy about it.",
        "qqq zzz www arbitrary gibberish tokens here today.",
        "",
    ]
    bc = spark.sparkContext.broadcast(scorer)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["p"] for r in df.select(make_perplexity_udf(bc)("text").alias("p")).collect()]
    expected = [scorer.score_page_text(t) for t in texts]
    assert got == pytest.approx(expected)
