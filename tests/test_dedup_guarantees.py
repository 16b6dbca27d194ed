"""Quantitative guarantees for the probabilistic dedup operators, measured
against a planted near-duplicate corpus with known ground truth.

MinHash/LSH: with n_hashes=64, bands=16 (4 rows/band) the s-curve gives
P(candidate | jaccard=s) = 1-(1-s^4)^16 — >=0.99 at s>=0.65, <=0.05 at
s<=0.15 — so the test asserts recall against the exact shingle-Jaccard
(computed by the oracle-checked exact twin's definition) and bounds the
estimator error. SimHash: planted high-overlap pairs must land within the
Hamming budget; unrelated pairs (expected Hamming ~32 on 64 bits) must not.
"""

from __future__ import annotations

import random

import pytest


def _make_corpus(seed: int = 7):
    """60 base docs + planted near-dups at ~5%, ~15% and ~50% word mutation.

    Returns (rows, planted) where planted maps (a, b) -> mutation rate."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(800)]
    rows, planted = [], {}
    doc_id = 0
    for base in range(60):
        words = [rng.choice(vocab) for _ in range(120)]
        base_id = doc_id
        rows.append((base_id, " ".join(words)))
        doc_id += 1
        if base < 20:  # plant one near-dup per early base doc
            rate = [0.05, 0.15, 0.5][base % 3]
            mutated = [
                rng.choice(vocab) if rng.random() < rate else w for w in words
            ]
            rows.append((doc_id, " ".join(mutated)))
            planted[(base_id, doc_id)] = rate
            doc_id += 1
    return rows, planted


def _shingle_set(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _true_jaccard(rows, k: int) -> dict[tuple[int, int], float]:
    sets = {i: _shingle_set(t, k) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if inter:
                out[(a, b)] = inter / len(sets[a] | sets[b])
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows, planted = _make_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    yield df, rows, planted
    df.unpersist()


def test_minhash_lsh_recall_and_estimate(spark, corpus):
    """Recall >= 0.95 for true Jaccard >= 0.65 (s-curve says ~1.0), zero
    candidates below 0.05, and |est_jaccard - true| <= 0.15 on hits —
    measured against exact shingle-Jaccard ground truth."""
    from topicrawler_spark.pipeline.dedup import minhash_lsh_pairs

    df, rows, _ = corpus
    k = 3
    truth = _true_jaccard(rows, k)
    got = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(df, n_hashes=64, bands=16, shingle_k=k).collect()
    }
    high = {p for p, j in truth.items() if j >= 0.65}
    assert high, "corpus must plant high-similarity pairs"
    found = high & set(got)
    recall = len(found) / len(high)
    assert recall >= 0.95, (recall, len(high))
    for p in found:
        assert got[p] == pytest.approx(truth[p], abs=0.15), (p, got[p], truth[p])
    for p in got:
        assert truth.get(p, 0.0) > 0.05, (p, "false positive below s-curve floor")


def test_simhash_hamming_guarantee(spark, corpus):
    """Measured separation on the planted corpus: ~5%-mutation pairs sit at
    Hamming 4-12, ~15% at 10-20, ~50% at >=16, and ALL 3140 unrelated pairs
    at >=19 (mean ~32, the random-baseline). At budget 12 the filter must
    recall every 5%-plant with zero unrelated pairs."""
    from topicrawler_spark.pipeline.dedup import simhash_pairs

    df, _, planted = corpus
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_pairs(df, max_hamming=12, shingle_k=2).collect()
    }
    close = {p for p, rate in planted.items() if rate <= 0.05}
    assert close, "corpus must plant close pairs"
    missed = close - set(got)
    assert not missed, missed
    for p, h in got.items():
        assert h <= 12
        assert planted.get(p, 1.0) <= 0.15, (p, "unrelated pair within Hamming 12")


def test_minhash_scurve_rejects_low_similarity(spark, corpus):
    """The ~50%-mutation plants have Jaccard(3-shingles) ~ 0.1 — the banded
    s-curve must make them (and all unrelated pairs) rare: at most 1 of
    them may surface as a candidate."""
    from topicrawler_spark.pipeline.dedup import minhash_lsh_pairs

    df, rows, planted = corpus
    truth = _true_jaccard(rows, 3)
    low = {p for p, rate in planted.items() if rate >= 0.5 and truth.get(p, 0) < 0.2}
    got = set()
    for r in minhash_lsh_pairs(df, n_hashes=64, bands=16, shingle_k=3).collect():
        got.add((r["a"], r["b"]))
    assert len(low & got) <= 1, (low & got)


def test_paragraph_dedup_planted_boilerplate(spark):
    """Planted-boilerplate ground truth for the sub-document dedup pass: a
    shared cookie-banner paragraph in half the docs, a unique body paragraph
    per doc, and one intra-doc repeated paragraph. Keep-first must retain
    exactly one banner occurrence (in the lowest doc_id) and the first copy
    of the repeated paragraph."""
    from topicrawler_spark.pipeline.dedup import (
        paragraph_dedup,
        paragraph_dedup_stats,
        reassemble_kept,
    )

    banner = "Accept all cookies to continue"
    rows = []
    for i in range(6):
        paras = [f"unique body paragraph {i}"]
        if i % 2 == 0:
            paras.insert(0, banner)
        if i == 3:
            paras.append("repeat me")
            paras.append("repeat me")
        rows.append((i, "\n\n".join(paras)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    d = paragraph_dedup(df).collect()
    banner_rows = [r for r in d if r["para"] == banner]
    assert len(banner_rows) == 3
    kept_banner = [r for r in banner_rows if r["keep"]]
    assert [(r["doc_id"], r["para_idx"]) for r in kept_banner] == [(0, 0)]
    assert all(r["n_occurrences"] == 3 for r in banner_rows)
    rep = sorted(
        (r["para_idx"], r["keep"]) for r in d if r["para"] == "repeat me"
    )
    assert rep == [(1, True), (2, False)]

    stats = {r["doc_id"]: r for r in paragraph_dedup_stats(df).collect()}
    assert stats[0]["n_paras"] == 2 and stats[0]["n_dup_paras"] == 1
    assert stats[0]["n_kept"] == 2  # owns the banner's first occurrence
    assert stats[2]["n_kept"] == 1 and stats[2]["n_dup_paras"] == 1
    assert stats[3]["n_paras"] == 3 and stats[3]["n_dup_paras"] == 2
    assert stats[3]["n_kept"] == 2  # body + first "repeat me"
    assert stats[1] and stats[1]["dup_ratio"] == 0.0

    kept_text = {r["doc_id"]: r["text"] for r in reassemble_kept(paragraph_dedup(df)).collect()}
    assert kept_text[0] == f"{banner}\n\nunique body paragraph 0"
    assert kept_text[2] == "unique body paragraph 2"
    assert kept_text[3] == "unique body paragraph 3\n\nrepeat me"


def test_dedup_end_to_end_chain_cluster(spark):
    """pairs -> connected_components -> dedup_by_components on a planted
    CHAIN (A~B, B~C, A!~C): transitive closure must collapse the whole chain
    to its minimum id even though the endpoints never pair directly."""
    from topicrawler_spark.pipeline.dedup import (
        connected_components,
        dedup_by_components,
        ngram_jaccard_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(500)]
    a = [rng.choice(vocab) for _ in range(100)]
    b = a[30:] + [rng.choice(vocab) for _ in range(30)]   # ~0.5 jaccard to a
    c = b[30:] + [rng.choice(vocab) for _ in range(30)]   # ~0.5 to b, ~0.2 to a
    lone = [rng.choice(vocab) for _ in range(100)]
    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c)), (9, " ".join(lone))],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, shingle_k=3, threshold=0.3)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert got == {(1, 2), (2, 3)}  # the chain, no shortcut edge
    comp = connected_components(pairs, "a", "b")
    kept = sorted(r["doc_id"] for r in dedup_by_components(df, comp).collect())
    assert kept == [1, 9]
