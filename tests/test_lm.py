"""LM parity tests.

Golden anchors from the reference test suite:
- perplexity("The quick brown fox" | 2-doc corpus, order 3, MLE) == 2^(1/2)
  (``PerplexityTest.testModelPerplexity``: 1.41421 +- 1e-4)
- every stored ngram of a corpus-built KN/SB model has finite log10 prob
  <= log10(1.001) (``KneserNeyTests``)
"""

from __future__ import annotations

import math
import os

import pytest

from topicrawler_spark.lm.local import LocalLM
from topicrawler_spark.lm.ngrams import ngram_sequence, provider_ngrams, provider_tokenize
from topicrawler_spark.lm.perplexity import DocumentScorer, base_perplexity, sequence_perplexity

CAT = "/root/reference/lt.lm/src/test/resources/cat/cat.txt"
TESTLM_DIR = "/root/reference/lt.ltbot/src/test/resources/testlm"


def test_ngram_sequence_boundary_modes():
    seq = ["a", "b", "c", "d"]
    assert ngram_sequence(seq, 3, 0) == [["a", "b", "c"], ["b", "c", "d"]]
    assert ngram_sequence(["a", "b"], 3, 0) == [["a", "b"]]
    assert ngram_sequence(["a"], 3, 0) == [["a"]]
    assert ngram_sequence(["a", "b"], 3, -1) == []
    assert ngram_sequence(seq, 3, -1) == [["a", "b", "c"], ["b", "c", "d"]]
    # mode 1: left-pad with first element (order-2 copies)
    assert ngram_sequence(["a", "b", "c"], 3, 1) == [["a", "a", "b"], ["a", "b", "c"]]
    # mode 2: growing prefixes
    assert ngram_sequence(seq, 3, 2) == [
        ["a", "b"],
        ["a", "b", "c"],
        ["b", "c", "d"],
    ]


def test_provider_tokenize_tags():
    toks = provider_tokenize("The quick brown fox")
    assert toks == ["<s>", "The", "quick", "brown", "fox", "</s>"]
    assert provider_tokenize("") == []


def test_golden_quick_brown_fox_mle():
    seqs = [
        "The quick brown fox".split(),
        "The quick brown cat".split(),
    ]
    lm = LocalLM.from_token_sequences(seqs, order=3)
    ngrams = ngram_sequence("The quick brown fox".split(), 3, 0)
    perp = sequence_perplexity(lm, lm.mle_log10, ngrams)
    assert abs(perp - 1.41421) < 1e-4
    perp2 = sequence_perplexity(lm, lm.mle_log10, ngram_sequence("The quick brown cat".split(), 3, 0))
    assert abs(perp2 - 1.41421) < 1e-4


def test_mle_unigram_distinct_normalization():
    lm = LocalLM.from_token_sequences([["a", "b", "a"]], order=2)
    # distinct unigrams: a, b -> p(a) = c(a)/num_distinct_unigrams = 2/2
    assert lm.mle_log10(["a"]) == pytest.approx(math.log10(2 / 2))
    assert lm.mle_log10(["b"]) == pytest.approx(math.log10(1 / 2))


def _cat_lm(order: int) -> LocalLM:
    text = open(CAT, encoding="utf-8").read()
    return LocalLM.from_texts([text], order=order)


@pytest.mark.skipif(not os.path.isfile(CAT), reason="reference fixtures unavailable")
@pytest.mark.parametrize("order", [3, 5])
def test_kn_sb_finite_and_bounded_on_cat_corpus(order):
    lm = _cat_lm(order)
    bound = math.log10(1.001)
    kn = lm.scorer("kneser-ney")
    sb = lm.scorer("stupid-backoff")
    assert lm.counts, "corpus produced no counts"
    for g in lm.counts:
        ngram = g.split(" ")
        if len(ngram) > order:
            continue
        for name, score in (("kn", kn), ("sb", sb)):
            lp = score(ngram)
            assert math.isfinite(lp), (name, g, lp)
            assert lp <= bound, (name, g, lp)


@pytest.mark.skipif(not os.path.isfile(CAT), reason="reference fixtures unavailable")
def test_kn_probabilities_sane():
    lm = _cat_lm(3)
    kn = lm.scorer("kneser-ney")
    seen = kn(["the", "cat"]) if "the cat" in lm.counts else None
    unk = kn(["xqzt", "frobnicate", "zzyzx"])
    assert math.isfinite(unk)
    if seen is not None:
        assert seen > unk


@pytest.mark.skipif(not os.path.isdir(TESTLM_DIR), reason="reference fixtures unavailable")
def test_topicality_separation_on_testlm():
    """An in-domain paragraph must score lower perplexity than off-domain
    gibberish — the property the whole crawler relies on."""
    texts = [
        open(os.path.join(TESTLM_DIR, f), encoding="utf-8", errors="replace").read()
        for f in sorted(os.listdir(TESTLM_DIR))
        if f.endswith(".txt")
    ]
    lm = LocalLM.from_texts([t[:100_000] for t in texts], order=3)
    scorer = DocumentScorer(lm, "kneser-ney")
    on_topic = scorer.score_page_text(texts[0][5000:7000])
    off_topic = scorer.score_page_text(
        "zzq gronk flibber vex jupple qwanto blarg snibble vorpal xyzzy plugh. "
        "mimsy borogove rath outgrabe frumious bandersnatch jubjub callay callooh."
    )
    assert 1 < on_topic < off_topic


def test_base_perplexity_and_sentinels():
    lm = LocalLM.from_token_sequences([["a", "b", "c", "d"]], order=3)
    # MLE assigns -inf to the unk ngram -> base falls back to 0.0
    assert base_perplexity(lm, lm.mle_log10) == 0.0
    kn_base = base_perplexity(lm, lm.scorer("kneser-ney"))
    assert math.isfinite(kn_base) and kn_base > 1
    scorer = DocumentScorer(lm, "kneser-ney")
    assert scorer.score_page_text("") == -1.0


def test_document_scorer_sentence_gates():
    lm = LocalLM.from_texts(["The quick brown fox jumps over the lazy dog."], order=3)
    scorer = DocumentScorer(lm, "kneser-ney")
    # single word sentence -> below min words -> no ngrams -> base perp path
    p = scorer.perplexity("Hi.")
    assert p == scorer.base
    p2 = scorer.score_page_text("The quick brown fox jumps over the lazy dog.")
    assert p2 > 1
