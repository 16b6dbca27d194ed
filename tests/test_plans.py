"""Physical-plan hygiene: the properties that make the engine viable at
100 TB, asserted on the actual plans (not just hoped for).

- canonicalization / hashing / priority math compile to pure JVM expressions
  (no Python evaluation nodes)
- filters on the pages scan are pushed into the parquet reader
- small dimension joins broadcast
- n-gram counting uses partial (map-side) aggregation
- the heavy html column is pruned from post-extraction plans
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


def _plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_canonicalize_is_jvm_only(spark):
    from topicrawler_spark.functions.canonicalize import canonical_url, host_classkey, url_hash64

    df = spark.createDataFrame([("http://x.example/a",)], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("c"),
        url_hash64(F.col("url")).alias("h"),
        host_classkey(F.col("url")).alias("k"),
    )
    plan = _plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "[codegen id" in plan  # whole-stage codegen covers the projection


def test_priority_math_is_jvm_only(spark):
    from topicrawler_spark.crawl.priority import apply_priority

    df = spark.createDataFrame([(100.0,)], "perp double")
    d, c = apply_priority(F.col("perp"))
    plan = _plan(df.select(d.alias("d"), c.alias("c")))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parquet_filter_pushdown(spark):
    path = os.path.join(TESTDATA, "lineitem.parquet")
    if not os.path.exists(path):
        pytest.skip("testdata unavailable")
    df = spark.read.parquet(path).filter(F.col("l_orderkey") == 1).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_orderkey" in plan.split("PushedFilters")[1][:200]
    # column pruning: the read schema must not include unused wide columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema


def test_quota_join_broadcasts(spark):
    """The per-host quota/budget dimensions must broadcast, never shuffle the
    frontier."""
    frontier = spark.range(0, 1000).select(
        (F.col("id") % 50).cast("string").alias("host"), F.col("id").alias("ord_k")
    )
    quota = spark.createDataFrame([(str(i), 5) for i in range(50)], "host string, quota int")
    joined = frontier.join(F.broadcast(quota), "host", "left")
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan


def test_ngram_count_partial_aggregation(spark):
    from topicrawler_spark.lm.counting import count_ngrams

    sentences = spark.createDataFrame(
        [(["a", "b", "c"],), (["a", "b"],)], "tokens array<string>"
    )
    counts = count_ngrams(sentences, order=2)
    plan = _plan(counts, "simple")
    # partial+final hash aggregation (map-side combine before the shuffle)
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "partial_" in plan


def test_html_pruned_after_extraction(spark):
    """After the extract/outlink projection the binary html column must not
    survive into downstream plans (column pruning through the UDF stage)."""
    from topicrawler_spark.functions.udfs import make_scoring_text_udf

    pages = spark.createDataFrame(
        [("u", bytearray(b"<p>x</p>"))], "url string, html binary"
    )
    out = pages.withColumn("text", make_scoring_text_udf("ext")(F.col("html"))).drop("html").groupBy(
        "text"
    ).count()
    plan = _plan(out)
    exchange_and_after = plan.split("Exchange")[-1]
    assert "html" not in exchange_and_after


def test_seen_antijoin_shape(spark):
    """The seen-set dedup must be a plain equi-anti-join on url_hash."""
    cands = spark.range(0, 100).select(F.col("id").alias("url_hash"))
    seen = spark.range(0, 50).select(F.col("id").alias("url_hash"))
    out = cands.join(seen, "url_hash", "left_anti")
    plan = _plan(out)
    assert "LeftAnti" in plan
