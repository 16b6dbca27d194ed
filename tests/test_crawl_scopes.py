"""Parity for the scope/host-activation options: SURT-prefix scope,
hygiene rules, TooManyDomains, and precedence-based host activation must
produce identical results in the engine and the simulator."""

from __future__ import annotations

import pytest

from topicrawler_spark.crawl.config import CrawlConfig
from topicrawler_spark.crawl.driver import run_crawl
from topicrawler_spark.crawl.simulator import CrawlSimulator
from topicrawler_spark.datagen import generate_corpus, pages_dataframe, topic_corpus
from topicrawler_spark.functions.surt import surt_prefix_from_url
from topicrawler_spark.lm.local import LocalLM
from topicrawler_spark.lm.perplexity import DocumentScorer


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(n_pages=100, n_hosts=8, n_seeds=3, seed=7)


@pytest.fixture(scope="module")
def scorer():
    lm = LocalLM.from_texts([topic_corpus(42)], order=3)
    return DocumentScorer(lm, "kneser-ney")


def _compare(spark, corpus, scorer, cfg, rounds=3):
    sim = CrawlSimulator(corpus.pages, scorer, cfg)
    sim_state = sim.run(corpus.seeds, rounds)
    pages = pages_dataframe(spark, corpus)
    run = run_crawl(spark, pages, corpus.seeds, scorer, rounds, cfg)
    engine_seen = {r["canon"] for r in run.state.seen.collect()}
    engine_frontier = {r["canon"] for r in run.state.frontier.collect()}
    assert engine_seen == sim_state.seen
    assert engine_frontier == {e.canon for e in sim_state.frontier}


def test_parity_with_host_activation(spark, corpus, scorer):
    cfg = CrawlConfig(order=3, per_host_quota=2, max_hops=8, max_active_hosts=3)
    _compare(spark, corpus, scorer, cfg)


def test_parity_with_surt_scope(spark, corpus, scorer):
    prefixes = tuple(sorted({surt_prefix_from_url(u) for u in corpus.seeds}))
    cfg = CrawlConfig(order=3, per_host_quota=3, max_hops=8, surt_prefixes=prefixes)
    _compare(spark, corpus, scorer, cfg)


def test_parity_with_max_domains(spark, corpus, scorer):
    cfg = CrawlConfig(order=3, per_host_quota=3, max_hops=8, max_domains=2)
    _compare(spark, corpus, scorer, cfg)


def test_surt_forms(spark):
    from pyspark.sql import functions as F

    from topicrawler_spark.functions.surt import surt_form, surt_py

    urls = [
        "http://www.example.com/a/b?c=1",
        "https://a.b.example.org:8443/x",
        "http://single/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["s"] for r in df.select("url", surt_form(F.col("url")).alias("s")).collect()}
    for u in urls:
        assert got[u] == surt_py(u), u
    assert got["http://www.example.com/a/b?c=1"] == "http://(com,example,www,)/a/b?c=1"


def test_hygiene_rules():
    import re

    from topicrawler_spark.functions.surt import PATHOLOGICAL_PATH, TOO_MANY_SEGMENTS

    assert re.match(PATHOLOGICAL_PATH, "http://h.ex/a/b/b/b/x")
    assert not re.match(PATHOLOGICAL_PATH, "http://h.ex/a/b/c/x")
    deep = "http://h.ex" + "/s" * 25
    assert re.match(TOO_MANY_SEGMENTS, deep)
    assert not re.match(TOO_MANY_SEGMENTS, "http://h.ex/a/b/c")
