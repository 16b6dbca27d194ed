"""Distributed ordering primitives for the frontier.

- ``per_host_top_k``: the politeness admission — per-host top-k by the queue
  key (directive, precedence, ordinal), computed skew-safely: a salted
  pre-rank bounds any single reducer to ``k`` rows per (host, salt) bucket
  before the exact per-host ranking runs on the ~k*n_salt survivors. A naive
  ``Window.partitionBy(host)`` would funnel a 30%-of-the-frontier host
  through one task; with the salt stage the exact window only ever sees
  ``k * n_salt`` rows per host. (The north rule's "salted groupBy".)

- ``zip_with_order``: deterministic dense rank over a global ordering
  without a single-reducer window: range-repartition on the key, rank
  within partitions, add collected per-partition offsets (a classic
  two-phase zipWithIndex, all DataFrame-API).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_host_top_k(
    frontier: DataFrame,
    k_col: str,
    order_cols: list[str],
    host_col: str = "host",
    n_salt: int = 16,
    rank_name: str = "host_rank",
) -> DataFrame:
    """Rows with per-host rank <= row's ``k_col``, plus the rank column."""
    order = [F.col(c).asc() for c in order_cols]
    if n_salt > 1:
        salted = frontier.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salt))
        )
        w1 = Window.partitionBy(host_col, "_salt").orderBy(*order)
        pre = (
            salted.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= F.col(k_col))
            .drop("_salt", "_r1")
        )
    else:
        pre = frontier  # small frontiers: the pre-rank stage is pure overhead
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return pre.withColumn(rank_name, F.row_number().over(w2)).filter(
        F.col(rank_name) <= F.col(k_col)
    )


def zip_with_order(
    df: DataFrame, order_cols: list[str], name: str = "ord_k"
) -> tuple[DataFrame, DataFrame]:
    """Add a dense 1-based rank following the global order of ``order_cols``
    without funneling all rows through one window partition, and WITHOUT any
    driver-side action: range-partition on the key, rank within partitions,
    and derive per-partition offsets from a running-sum window over the tiny
    (n_partitions-row) partition-size aggregate — then broadcast-join them
    back. The whole rank stays one lazy query, so a crawl round remains
    action-free in every regime (the old collect-based offsets added a
    synchronous driver round trip and an extra job launch per round).

    Returns (ranked_df, cached_intermediate); the caller owns unpersisting
    the cached intermediate once downstream state is checkpointed. The cache
    pins the partition layout so the two consumers (local ranks, size
    aggregate) see identical partition ids."""
    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 1)
    keyed = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols]).sortWithinPartitions(
        *[F.col(c) for c in order_cols]
    )
    with_pid = keyed.withColumn("_pid", F.spark_partition_id())
    with_pid.cache()
    w_local = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    local = with_pid.withColumn("_lrank", F.row_number().over(w_local))
    # offsets: exclusive prefix sum of partition sizes — a single-reducer
    # window over at most n_part rows (trivially small by construction)
    sizes = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = sizes.select(
        "_pid", F.coalesce(F.sum("_c").over(w_off), F.lit(0)).cast("long").alias("_off")
    )
    out = (
        local.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(name, (F.col("_off") + F.col("_lrank")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )
    return out, with_pid


def murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's ``Murmur3Hash`` of one IntegerType value (x86_32, one 4-byte
    block, seed 42) — the hash behind ``HashPartitioning``. Re-derived from
    the published MurmurHash3 algorithm so the driver can PREDICT which
    partition a small integer key lands in (see ``partition_probe_ints``).
    Parity with ``F.hash(int)`` is asserted in tests."""
    mask = 0xFFFFFFFF
    k = x & mask
    k = (k * 0xCC9E2D51) & mask
    k = ((k << 15) | (k >> 17)) & mask
    k = (k * 0x1B873593) & mask
    h = (seed & mask) ^ k
    h = ((h << 13) | (h >> 19)) & mask
    h = (h * 5 + 0xE6546B64) & mask
    h ^= 4  # total byte length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    return h


def partition_probe_ints(n: int) -> list[int]:
    """For each target partition 0..n-1, the smallest non-negative int whose
    ``HashPartitioning`` bucket (pmod(murmur3(v), n)) is that partition.

    ``df.repartition(n, col)`` runs the key through murmur3 before the mod,
    so residue-class keys (rank % n) would be scattered with collisions
    (~n/e empty partitions, some doubled — exactly the imbalance being
    fixed). Substituting probe ints makes the placement EXACT: partition i
    receives precisely the rows whose desired bin is i. Cost: one n-element
    int array literal in the plan."""
    probes: list[int] = [-1] * n
    found = 0
    v = 0
    while found < n:
        # HashPartitioning applies pmod to the SIGNED int32 hash; Python's %
        # is already pmod, so reinterpret the unsigned murmur value as signed
        # first. (unsigned % n only agrees when n divides 2^32 — for e.g.
        # n=24 it misplaces most probes and leaves partitions empty.)
        h = murmur3_int32(v)
        if h >= 1 << 31:
            h -= 1 << 32
        r = h % n
        if probes[r] < 0:
            probes[r] = v
            found += 1
        v += 1
    return probes
