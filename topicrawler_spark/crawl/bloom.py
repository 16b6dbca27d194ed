"""Partitioned Bloom filter over the URL-seen set.

The reference's BloomUriUniqFilter (jar!heritrix-engine/.../util/
BloomUriUniqFilter.java:89 — 125M expected insertions, 22 hash functions)
holds ONE in-memory Bloom filter as the whole uniqueness story. At a
10^10-URL frontier a single filter is tens of GB — neither driver- nor
single-executor-sized — so this engine shards it by ``pmod(url_hash,
n_shards)`` into a tiny ``(shard, bits)`` DataFrame whose rows live, build,
merge, and probe WHERE THE KEYS LIVE:

- build/merge: ``cogroup(bloom, keys).applyInPandas`` per shard — each task
  ORs one shard's fixed-size bit array with its new keys; memory per task is
  one shard, never the whole filter.
- probe: ``cogroup(candidates, bloom)`` per shard — candidates hash-shuffle
  to their shard (they shuffle on url_hash for the exact anti-join anyway)
  and each task tests against exactly one shard's bits.

By default the filter is a PRE-filter: definitely-new candidates skip the
exact seen anti-join entirely and only the (tiny) maybe-seen remainder is
confirmed against the seen table — results stay EXACTLY equal to the plain
anti-join while the anti-join's probe side shrinks from |candidates| to
|dups| + fpr·|new|. The reference-faithful mode (``exact_confirm=False``)
drops maybe-seen outright, accepting the same false-positive URL loss
BloomUriUniqFilter accepts.

All bit arithmetic is vectorized numpy over Arrow batches (no per-row
Python); hashes are splitmix64-mixed url_hash64 fingerprints with
double-hashing position generation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

BLOOM_SCHEMA = "shard int, bits binary"

_BIT_LUT = np.left_shift(np.uint8(1), np.arange(8, dtype=np.uint8))


@dataclass(frozen=True)
class BloomParams:
    n_shards: int = 32
    shard_bytes: int = 1 << 20  # 8.4M bits/shard; 32 shards ~ 268M bits total
    n_hashes: int = 7  # ~1% fpr at ~10 bits/key

    @property
    def total_bits(self) -> int:
        return self.n_shards * self.shard_bytes * 8

    @property
    def capacity(self) -> int:
        """Keys at which fill density reaches ~50% (n = m·ln2/k) — the
        optimal load for k hashes. Beyond it the false-positive rate
        degrades past 0.5^k, and with exact-confirm the pre-filter stops
        pruning anything (a cogroup pass per round for zero benefit), so
        the driver rebuilds a larger filter from the seen set."""
        return int(self.total_bits * 0.6931 / self.n_hashes)

    @classmethod
    def for_keys(
        cls,
        n_keys: int,
        bits_per_key: int = 10,
        headroom: int = 4,
        n_hashes: int = 7,
        min_shards: int = 32,
        max_shard_bytes: int = 1 << 23,
    ) -> "BloomParams":
        """Size the sharded filter for ~n_keys current keys with headroom×
        growth: total bits ≥ bits_per_key·n_keys·headroom (so a filter sized
        at activation absorbs ~4× seen-set growth before a rebuild). Per-task
        memory stays bounded: shard size caps at ``max_shard_bytes`` (8 MiB)
        and the shard COUNT scales with the keys — 10^10 seen URLs is ~6k
        8-MiB shards, each an independent cogroup task, never one big array.
        """
        total_bytes = max(n_keys * bits_per_key * headroom // 8, min_shards << 20)
        shard_bytes = 1 << 20
        while shard_bytes < max_shard_bytes and total_bytes // shard_bytes > 4096:
            shard_bytes <<= 1
        n_shards = max(min_shards, -(-total_bytes // shard_bytes))
        return cls(int(n_shards), int(shard_bytes), int(n_hashes))


def shard_of(hash_col: Column, n_shards: int) -> Column:
    return F.pmod(hash_col, F.lit(n_shards)).cast("int")


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: decorrelates the 24|40 host|path fingerprint
    layout before double hashing (uint64 wraparound arithmetic)."""
    z = h + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> list[np.ndarray]:
    z = _mix64(hashes.astype(np.int64).view(np.uint64))
    m = np.uint64(m_bits)
    h1 = z % m
    h2 = ((z >> np.uint64(33)) | np.uint64(1)) % m
    return [(h1 + np.uint64(i) * h2) % m for i in range(k)]


def _set_bits(bits: np.ndarray, hashes: np.ndarray, k: int) -> None:
    for pos in _positions(hashes, bits.size * 8, k):
        np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64), _BIT_LUT[(pos & np.uint64(7)).astype(np.int64)])


def _test_bits(bits: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    out = np.ones(len(hashes), dtype=bool)
    for pos in _positions(hashes, bits.size * 8, k):
        out &= (bits[(pos >> np.uint64(3)).astype(np.int64)] & _BIT_LUT[(pos & np.uint64(7)).astype(np.int64)]) != 0
    return out


def bloom_add(
    spark: SparkSession,
    bloom: DataFrame | None,
    keys: DataFrame,
    params: BloomParams,
    hash_col: str = "url_hash",
) -> DataFrame:
    """OR the keys into the sharded filter (building missing shards).

    Per-shard task memory: one ``shard_bytes`` array + that shard's key
    batch. The result is a plain (shard, bits) DataFrame — at warehouse
    scale an Iceberg overwrite of an n_shards-row table per round."""
    if bloom is None:
        bloom = spark.createDataFrame([], BLOOM_SCHEMA)
    keyed = keys.select(
        shard_of(F.col(hash_col), params.n_shards).alias("shard"),
        F.col(hash_col).alias("h"),
    )
    shard_bytes, k = params.shard_bytes, params.n_hashes

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left):
            shard = int(left["shard"].iloc[0])
            bits = np.frombuffer(left["bits"].iloc[0], dtype=np.uint8).copy()
        else:
            shard = int(right["shard"].iloc[0])
            bits = np.zeros(shard_bytes, dtype=np.uint8)
        if len(right):
            _set_bits(bits, right["h"].to_numpy(dtype=np.int64), k)
        return pd.DataFrame({"shard": [shard], "bits": [bits.tobytes()]})

    return (
        bloom.groupBy("shard")
        .cogroup(keyed.groupBy("shard"))
        .applyInPandas(merge, BLOOM_SCHEMA)
    )


def bloom_probe(
    cands: DataFrame,
    bloom: DataFrame,
    params: BloomParams,
    hash_col: str = "url_hash",
    flag_col: str = "_maybe_seen",
) -> DataFrame:
    """Candidates + a boolean: might this fingerprint be in the filter?

    False is definitive (no false negatives); True needs exact confirmation
    unless running reference-faithful Bloom-only dedup."""
    out_schema = StructType(list(cands.schema.fields) + [StructField(flag_col, BooleanType())])
    shard_bytes, k = params.shard_bytes, params.n_hashes
    keyed = cands.withColumn("_shard", shard_of(F.col(hash_col), params.n_shards))

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        pdf = left.drop(columns=["_shard"])
        if len(right):
            bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
            pdf[flag_col] = _test_bits(bits, left[hash_col].to_numpy(dtype=np.int64), k)
        else:
            pdf[flag_col] = np.zeros(len(pdf), dtype=bool)
        return pdf

    return (
        keyed.groupBy("_shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )
