"""The partitioned Bloom URL-seen pre-filter: no false negatives ever,
sane false-positive rate at the default sizing, incremental merge
equivalence, and end-to-end crawl parity (bloom-pre-filtered dedup must
produce the exact crawl the plain anti-join produces)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topicrawler_spark.crawl.bloom import BloomParams, bloom_add, bloom_probe

PARAMS = BloomParams(n_shards=8, shard_bytes=1 << 14, n_hashes=7)


@pytest.fixture(scope="module")
def keys(spark):
    # deterministic spread of 64-bit fingerprints incl. negatives
    return spark.range(0, 5000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("url_hash")
    ).cache()


def test_no_false_negatives(spark, keys):
    bloom = bloom_add(spark, None, keys, PARAMS)
    probed = bloom_probe(keys, bloom, PARAMS)
    assert probed.filter(~F.col("_maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark, keys):
    bloom = bloom_add(spark, None, keys, PARAMS).cache()
    others = spark.range(100000, 110000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    fp = bloom_probe(others, bloom, PARAMS).filter(F.col("_maybe_seen")).count()
    # 5000 keys / 8*16KiB*8 bits ~ 0.2 bits loading -> fpr well under 5%
    assert fp / 10000 < 0.05, fp


def test_incremental_merge_equals_bulk(spark, keys):
    a = keys.filter(F.col("url_hash") % 2 == 0)
    b = keys.filter(F.col("url_hash") % 2 != 0)
    inc = bloom_add(spark, bloom_add(spark, None, a, PARAMS), b, PARAMS)
    bulk = bloom_add(spark, None, keys, PARAMS)
    gi = {r["shard"]: bytes(r["bits"]) for r in inc.collect()}
    gb = {r["shard"]: bytes(r["bits"]) for r in bulk.collect()}
    assert gi == gb


def test_shard_sizes_fixed(spark, keys):
    bloom = bloom_add(spark, None, keys, PARAMS)
    rows = bloom.collect()
    assert 0 < len(rows) <= PARAMS.n_shards
    assert all(len(bytes(r["bits"])) == PARAMS.shard_bytes for r in rows)


def test_crawl_parity_with_bloom(spark):
    """Forcing the bloom regime from round 1 must reproduce the exact
    frontier and seen set of the plain anti-join crawl, and the checkpoint
    must round-trip the filter."""
    from topicrawler_spark.crawl.config import CrawlConfig
    from topicrawler_spark.crawl.driver import run_crawl
    from topicrawler_spark.datagen import generate_corpus, pages_dataframe, topic_corpus
    from topicrawler_spark.lm.local import LocalLM
    from topicrawler_spark.lm.perplexity import DocumentScorer

    corpus = generate_corpus(n_pages=120, n_hosts=8, n_seeds=3, seed=42)
    pages = pages_dataframe(spark, corpus)
    lm = LocalLM.from_texts([topic_corpus(42)], order=3)
    scorer = DocumentScorer(lm, "kneser-ney")
    base = CrawlConfig(order=3, per_host_quota=3, max_hops=10, round_ms=1000,
                       bloom_min_seen=None)
    bloomed = CrawlConfig(order=3, per_host_quota=3, max_hops=10, round_ms=1000,
                          bloom_min_seen=0,
                          bloom_n_shards=8, bloom_shard_bytes=1 << 14)
    plain = run_crawl(spark, pages, corpus.seeds, scorer, 3, base)
    with_bloom = run_crawl(spark, pages, corpus.seeds, scorer, 3, bloomed)
    key = lambda x: (x["canon"], x["directive"], x["precedence"], x["ord_r"], x["ord_k"])
    assert sorted(map(key, plain.state.frontier.collect())) == sorted(
        map(key, with_bloom.state.frontier.collect())
    )
    assert {r["url_hash"] for r in plain.state.seen.collect()} == {
        r["url_hash"] for r in with_bloom.state.seen.collect()
    }
    assert with_bloom.state.bloom is not None


def test_bloom_checkpoint_roundtrip(spark, tmp_path):
    from topicrawler_spark.crawl.config import CrawlConfig
    from topicrawler_spark.crawl.checkpoint import CheckpointStore
    from topicrawler_spark.crawl.driver import run_crawl
    from topicrawler_spark.datagen import generate_corpus, pages_dataframe, topic_corpus
    from topicrawler_spark.lm.local import LocalLM
    from topicrawler_spark.lm.perplexity import DocumentScorer

    corpus = generate_corpus(n_pages=100, n_hosts=6, n_seeds=2, seed=9)
    pages = pages_dataframe(spark, corpus)
    lm = LocalLM.from_texts([topic_corpus(9)], order=3)
    scorer = DocumentScorer(lm, "kneser-ney")
    cfg = CrawlConfig(order=3, per_host_quota=3, max_hops=8,
                      bloom_min_seen=0, bloom_n_shards=8, bloom_shard_bytes=1 << 14)
    ckpt = str(tmp_path / "ck")
    run = run_crawl(spark, pages, corpus.seeds, scorer, 2, cfg, checkpoint_dir=ckpt)
    store = CheckpointStore(ckpt)
    resumed = store.resume(spark)
    assert resumed.bloom is not None
    # resumed filter answers True for every committed seen fingerprint
    probed = bloom_probe(
        resumed.seen.select("url_hash"), resumed.bloom, cfg.bloom_params()
    )
    assert probed.filter(~F.col("_maybe_seen")).count() == 0
    # resuming and extending the crawl keeps working
    more = run_crawl(spark, pages, corpus.seeds, scorer, 3, cfg, checkpoint_dir=ckpt)
    assert more.state.round_no == 3
