"""Byte-balanced scoring bins (round-robin host-size rank + murmur probes).

The per-round scoring repartition assigns each host to bin
``_page_wrank % n_bins`` and places that bin EXACTLY by substituting a
probe int whose HashPartitioning bucket is the target partition. These
tests pin the three load-bearing facts:

- the driver-side murmur3 matches Spark's ``F.hash`` (probe prediction
  would silently misplace every row otherwise),
- probe substitution achieves identity placement bin -> partition,
- ``prepare_pages`` stamps a dense 0-based byte-rank per host.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from topicrawler_spark.crawl.ranking import murmur3_int32, partition_probe_ints


def test_murmur3_int32_matches_spark_hash(spark):
    vals = list(range(64)) + [2**31 - 1, -1, -2**31, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    rows = df.select("v", F.hash("v").alias("h")).collect()
    for r in rows:
        want = r["h"] & 0xFFFFFFFF
        assert murmur3_int32(r["v"]) == want, r["v"]


def _signed_pmod(h: int, n: int) -> int:
    # Spark pmod's the SIGNED int32 hash; Python % is already pmod.
    if h >= 1 << 31:
        h -= 1 << 32
    return h % n


def test_probe_ints_cover_all_partitions():
    # include non-powers-of-two: unsigned-mod bucketing only agrees with
    # Spark's signed pmod when n divides 2^32, so n=6/12/24/100 would catch
    # a regression to the unsigned interpretation
    for n in (2, 6, 8, 12, 24, 32, 100, 128):
        probes = partition_probe_ints(n)
        assert len(probes) == n
        assert sorted(_signed_pmod(murmur3_int32(p), n) for p in probes) == list(range(n))


def test_probe_repartition_is_identity_placement(spark):
    n = 24  # deliberately not a power of two
    probes = partition_probe_ints(n)
    df = spark.createDataFrame(pd.DataFrame({"bin": list(range(n)) * 5}))
    probe_arr = F.array(*[F.lit(p) for p in probes])
    out = df.repartition(
        n, F.element_at(probe_arr, (F.pmod(F.col("bin"), F.lit(n)) + 1).cast("int"))
    )
    got = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("bin")
        .agg(F.collect_set("pid").alias("pids"))
        .collect()
    )
    for r in got:
        assert r["pids"] == [r["bin"]]


def test_prepare_pages_stamps_dense_byte_rank(spark):
    from topicrawler_spark.crawl.round import prepare_pages

    rows = [
        # host a: 2 pages x 300 bytes; host b: 1 page x 1000; host c: 1 x 10
        ("http://a.example/1", "x" * 300),
        ("http://a.example/2", "y" * 300),
        ("http://b.example/1", "z" * 1000),
        ("http://c.example/1", "w" * 10),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    prep = prepare_pages(pages)
    assert "_page_wrank" in prep.columns
    got = {
        r["_page_canon"].split("//")[1][0]: r["_page_wrank"]
        for r in prep.select("_page_canon", "_page_wrank").collect()
    }
    # b (1000) -> rank 0, a (600) -> rank 1, c (10) -> rank 2
    assert got == {"b": 0, "a": 1, "c": 2}


def test_score_bin_count_whole_waves():
    """Data-sized bins always land on whole waves (multiples of slots), so
    the scoring stage never ends on a ragged wave that idles slots."""
    from topicrawler_spark.crawl.round import score_bin_count

    for slots in (2, 6, 8, 24, 32):
        for hint in (0, 1, 499, 1500, 6000, 14441, 18266, 24615, 10**7):
            n = score_bin_count(hint, slots, 1500, 4)
            assert n % slots == 0, (hint, slots, n)
            assert slots <= n <= 4 * slots
    # no hint -> waves cap (already a slot multiple)
    assert score_bin_count(None, 8, 1500, 4) == 32
    # data term dominates at volume: cap reached
    assert score_bin_count(10**7, 8, 1500, 4) == 32
    # quota-bounded rounds collapse to one wave
    assert score_bin_count(500, 8, 1500, 4) == 8
    # the round-5 diagnosis cases: 10 -> 16, 17 -> 24
    assert score_bin_count(14441, 8, 1500, 4) == 16
    assert score_bin_count(24615, 8, 1500, 4) == 24
