"""Deduplication families for document corpora.

- exact:         hash-groupBy on normalized text (one shuffle, map-side combine)
- minhash LSH:   shingle -> per-permutation min of affine-transformed xxhash64
                 -> band -> bucket self-join. Signatures are computed entirely
                 JVM-side with explode + groupBy min (no Python in the path).
- simhash:       64-bit weighted bit-vote over token hashes, Hamming buckets
- ngram Jaccard: token shingles, pairwise |A ∩ B| / |A ∪ B| via explode+join

Scale notes: MinHash banding turns O(n^2) similarity into equality joins on
(band_id, band_hash) — the only shuffle keys; bucket skew (a viral shingle
set) is bounded by dropping buckets above ``max_bucket`` (standard practice,
logged, and the pairs they would add are near-certain duplicates of already
found pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# fixed odd constants for the affine permutation family (deterministic runs).
# params stay below 2^31 and hashes are folded to 31 bits first so a*h+b
# never overflows a long (ANSI mode errors on overflow).
_MERSENNE31 = (1 << 31) - 1


def _perm_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE31 - 1) | 1, rng.randrange(0, _MERSENNE31 - 1))
        for _ in range(n_hashes)
    ]


def normalized_text(col: Column) -> Column:
    """Whitespace/case normalization used for exact dedup."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of ids sharing identical normalized text (size > 1)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.xxhash64(normalized_text(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"), F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical normalized text."""
    w = Window.partitionBy(F.xxhash64(normalized_text(F.col(text_col)))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def shingles(text: Column, k: int = 5) -> Column:
    """k-word shingles as an array<string> (empty-safe)."""
    toks = F.split(F.trim(F.lower(F.regexp_replace(text, r"\s+", " "))), " ")
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), n - k + 1), lambda i: F.array_join(F.slice(toks, i, k), " "))
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig: array<long>) — min over shingles of affine-permuted
    xxhash64, all JVM-side."""
    params = _perm_params(n_hashes, seed)
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("shingle"),
    ).select("doc_id", F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE31)).alias("h"))
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE31))).alias(f"m{i}")
            for i, (a, b) in enumerate(params)
        ]
    )
    return mins.select("doc_id", F.array(*[f"m{i}" for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs (a < b) via banded MinHash LSH, with
    the estimated Jaccard similarity from full-signature agreement."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k, seed).cache()
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.array_join(
                        F.transform(F.slice("sig", b * rows_per_band + 1, rows_per_band), lambda x: x.cast("string")),
                        ",",
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    # bound pathological buckets (skew defense); dropped buckets are logged
    bucket_sizes = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("sz"))
    banded = banded.join(
        bucket_sizes.filter(F.col("sz") <= max_bucket).select("band", "band_hash"),
        ["band", "band_hash"],
        "left_semi",
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
            / F.lit(float(n_hashes)),
        )
        .select("a", "b", "est_jaccard")
    )


def _simhash_from_hashes(hashes: Column) -> Column:
    """64-bit SimHash from an array<long> of per-shingle hashes: per-bit
    weighted vote via aggregate (JVM-side). Callers should materialize the
    hash array as a real column first — referencing a hash *expression*
    here would duplicate its subtree 64 times (once per bit) in the plan."""
    bits = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        for i in range(64)
    ]
    out = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.when(b > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i)
        )
    return out


def simhash64(text: Column, shingle_k: int = 2) -> Column:
    """64-bit SimHash of word shingles, as a single column expression.

    Convenience form; prefer the two-step used by ``simhash_pairs`` (hash
    array materialized as a column, then the bit votes) — as one expression
    the shingle+hash subtree is inlined per bit."""
    sh = shingles(text, shingle_k)
    return _simhash_from_hashes(F.transform(sh, lambda s: F.xxhash64(s)))


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 2,
) -> DataFrame:
    """(doc_id, sim): 64-bit SimHash via explode + ONE hash aggregate.

    Each shingle hash row contributes (h>>i)&1 to 64 tiny SUMs (map-side
    partial aggregation, whole-stage codegen); bit i of the signature is
    set iff set-votes*2 > total (i.e. the +-1 vote sum is positive —
    identical to the array-aggregate form, which Catalyst chews seconds of
    analyzer/interpreter time on: 64 lambda traversals per row vs one
    flat pass here).

    Trivially-empty duplicates keep pairing with each other in
    ``simhash_pairs``: NULL text yields the single-``[NULL]`` shingle (so
    every NULL doc shares the constant xxhash64(NULL)=seed signature) and
    empty text the single-``[""]`` shingle. The left join back to the input
    ids is a defensive guard for custom shingle functions that can return an
    empty/NULL array — such docs get sim = 0 instead of being dropped."""
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(shingles(F.col(text_col), shingle_k), lambda s: F.xxhash64(s))
        ).alias("_h"),
    )
    votes = ex.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftrightunsigned("_h", i).bitwiseAND(F.lit(1))).alias(f"_s{i}")
            for i in range(64)
        ],
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.shiftleft(
                F.when(F.col(f"_s{i}") * 2 > F.col("_n"), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long"),
                i,
            )
        )
    sigs = votes.select("doc_id", sim.alias("sim"))
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(sigs, "doc_id", "left").select(
        "doc_id", F.coalesce("sim", F.lit(0).cast("long")).alias("sim")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_k: int = 2,
) -> DataFrame:
    """Near-dup candidates with Hamming distance <= max_hamming, found by
    pigeonhole blocking: the signature is split into max_hamming+1 (rounded
    up to a power-of-two divisor of 64, capped at 16) bit-blocks — any pair
    within the distance budget must agree on at least one whole block."""
    n_blocks = 1
    while n_blocks < max_hamming + 1 and n_blocks < 16:
        n_blocks *= 2
    bits = 64 // n_blocks
    # bits == 64 (max_hamming=0) needs the all-ones mask, which only fits a
    # signed long as -1
    mask = -1 if bits == 64 else (1 << bits) - 1
    sigs = simhash_signatures(df, id_col, text_col, shingle_k).cache()
    blocked = sigs.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("sim", q * bits).bitwiseAND(F.lit(mask)).cast("long")
                    for q in range(n_blocks)
                ]
            )
        ).alias("q", "qv"),
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.q") == F.col("r.q"))
            & (F.col("l.qv") == F.col("r.qv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("a", "b", "hamming")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >=1 shingle:
    |A ∩ B| computed by shingle equi-join, |A ∪ B| = |A|+|B|-∩.

    ``max_shingle_df`` is the skew defense the self-join needs at corpus
    scale: one stop-word shingle shared by 10^6 docs would alone create
    10^12 join rows. Shingles whose document frequency exceeds the cap are
    removed from the shingle *universe* — from both the intersection join
    and the per-doc set sizes — so the reported value stays an exact
    Jaccard over the capped shingle sets (near-dup pairs overwhelmingly
    share rare shingles too, so recall loss is negligible; the cap never
    binds at the oracle-checked test scale)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), F.explode(shingles(F.col(text_col), shingle_k)).alias("s")
    )
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("s")
        )
        sh = sh.join(rare, "s", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l.s") == F.col("r.s")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "a")
        .join(nb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Distributed connected components over a pair graph — the transitive-
    closure half of near-duplicate dedup. Pair finders (``minhash_lsh_pairs``,
    ``ngram_jaccard_pairs``, embedding-cosine joins) emit EDGES; deduping a
    corpus needs the components those edges imply, or A~B, B~C still keeps
    both A and C.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", ACM SoCC 2014) — the
    published at-scale formulation. Each operation is one hash shuffle keyed
    on a node id; the edge set provably contracts to a star forest rooted at
    each component's minimum id in O(log^2 n) rounds (O(log n) in practice),
    and no step ever gathers a whole component into one task — unlike
    driver-side union-find (not distributed) or naive label propagation
    (O(graph diameter) rounds, fatal on chain-shaped near-dup clusters).
    Every iteration ends in ``localCheckpoint`` to cut the exponentially
    growing lineage, and convergence is declared when the edge-set
    signature (count + xor of xxhash64 — the edges are distinct, so xor is
    an order-free set digest with no ANSI overflow) is stable across an
    iteration.

    Returns ``(node, component)`` for every node incident to an edge, where
    ``component`` is the minimum node id in its connected component (the
    canonical representative). Isolated vertices carry no edges and do not
    appear — callers union them back (component = own id).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig: tuple | None = None
    for _ in range(max_iter):
        # large-star: each node u attaches its strictly-larger neighbors to
        # min(Gamma(u) + {u}) — keyed on u, one shuffle (window min)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        w = Window.partitionBy("u")
        e1 = (
            sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: key each edge on its LARGER endpoint; the key and all
        # its (smaller) neighbors attach to the neighborhood minimum
        ek = e1.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        w2 = Window.partitionBy("u")
        star = ek.withColumn("m", F.min("v").over(w2))
        e = (
            star.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(star.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        row = e.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            # fixpoint: e is a star forest, every edge is (node -> root);
            # the roots map to themselves
            members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            roots = (
                e.select(F.col("v").alias("node")).distinct()
                .select("node", F.col("node").alias("component"))
            )
            return members.union(roots)
        prev_sig = sig
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n{2,}",
) -> DataFrame:
    """Explode documents into ``(doc_id, para_idx, para)`` rows — Catalyst
    only (split + posexplode), empty paragraphs dropped. ``sep`` is the
    paragraph-boundary regex (blank line by default)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("para_idx", "para"),
    ).where(F.trim(F.col("para")) != "")


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n{2,}",
) -> DataFrame:
    """Corpus-wide exact dedup below document granularity: every paragraph
    occurrence annotated with its global occurrence count and a ``keep``
    flag — true exactly for the first occurrence of that normalized text,
    by ``(doc_id, para_idx)``. This is the standard boilerplate/line-dedup
    pass of LLM corpus curation (cookie banners, nav bars, repeated headers
    appear in millions of documents; keep one, and the per-document
    duplicate ratio is itself a quality signal).

    Scale shape: groupBy-aggregate on the normalized paragraph (map-side
    partial aggregation collapses a viral boilerplate key to one row per
    map task BEFORE the shuffle — a window over the same key would instead
    gather every occurrence of a hot paragraph into one task), then one
    hash join back on the normalized text; AQE skew-join splits the hot
    build rows at runtime."""
    p = paragraphs(df, id_col, text_col, sep).withColumn(
        "pnorm", normalized_text(F.col("para"))
    )
    agg = p.groupBy("pnorm").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min(F.struct("doc_id", "para_idx")).alias("_first"),
    )
    return p.join(agg, "pnorm").select(
        "doc_id",
        "para_idx",
        "para",
        "n_occurrences",
        (
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("para_idx") == F.col("_first.para_idx"))
        ).alias("keep"),
    )


def paragraph_dedup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n{2,}",
) -> DataFrame:
    """Per-document rollup of ``paragraph_dedup``: paragraph count, how many
    of them are corpus-wide duplicates, how many this document gets to keep
    (it owns the first occurrence), and the duplicate ratio (a standard
    boilerplate-contamination quality signal)."""
    d = paragraph_dedup(df, id_col, text_col, sep)
    is_dup = (F.col("n_occurrences") > 1).cast("long")
    return d.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(is_dup).alias("n_dup_paras"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.round(F.avg(is_dup.cast("double")), 6).alias("dup_ratio"),
    )


def reassemble_kept(dedup: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Keep-first reassembly: each document rebuilt from only its kept
    paragraphs, in original order. One groupBy per doc (documents are
    bounded-size, so the collect_list is too)."""
    return (
        dedup.where(F.col("keep"))
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("text")
        )
    )


def dedup_by_components(
    df: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one canonical row per near-duplicate cluster: given the
    ``(node, component)`` map from ``connected_components``, retain exactly
    the rows whose id IS their component's minimum (the canonical
    representative) plus all rows outside any cluster. One broadcast-or-hash
    join keyed on the id — the standard last step of corpus near-dedup
    (pairs -> components -> keep min)."""
    comp = components.select(
        F.col("node").alias("_dd_id"), F.col("component").alias("_dd_comp")
    )
    return (
        df.join(comp, df[id_col] == F.col("_dd_id"), "left")
        .where(F.col("_dd_comp").isNull() | (F.col("_dd_comp") == df[id_col]))
        .drop("_dd_id", "_dd_comp")
    )
