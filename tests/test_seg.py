"""Segmentation parity tests (lt.seg semantics)."""

from __future__ import annotations

import pytest

from topicrawler_spark import javachar as jc
from topicrawler_spark.seg import diff_tokenize, filtered_normalized_tokens
from topicrawler_spark.seg.rules import RuleSet, convert_escapes, get_ruleset
from topicrawler_spark.seg.segtypes import SegmentType, infer_type
from topicrawler_spark.seg.sentences import (
    SentenceMaker,
    line_split,
    provider_sentences,
    rule_split,
    trim_and_replace_emptyspace,
)
from topicrawler_spark.seg.tokenizer import empty_space_tokenize, normalize_segment

# the canonical stress string from the reference TokenizerTest
TEST_TEXT = (
    "0815 4711, 007 done. "
    "﻿Hello World... The answer is 42, but what is the question? "
    "I told this joke 3times.h3ll0 w0rld!!! "
    "4711Today is the 1st of Dec. 2014. "
    "Today is the aniversary of Prof. Dr. Stephen W. Hawking. "
    "Is this state-of-the-art? Could this b\ne state-\nof-\r\nthe-art ? "
    "Today is 2014/01/12 or 1.12.14. "
    "\t\n\t\r\n\f\n\t :-) ^^ α α  "
)


def test_javachar_table_spot_checks():
    assert jc.get_type(ord("A")) == jc.UPPERCASE_LETTER
    assert jc.get_type(ord("a")) == jc.LOWERCASE_LETTER
    assert jc.get_type(ord("5")) == jc.DECIMAL_DIGIT_NUMBER
    assert jc.get_type(ord(" ")) == jc.SPACE_SEPARATOR
    assert jc.get_type(0x0A) == jc.CONTROL
    assert jc.get_type(0xFEFF) == jc.FORMAT
    assert jc.get_type(0x00A0) == jc.SPACE_SEPARATOR
    assert jc.get_type(ord("-")) == jc.DASH_PUNCTUATION
    assert jc.get_type(ord("$")) == jc.CURRENCY_SYMBOL
    assert jc.get_type(0xD83D) == jc.SURROGATE
    assert jc.get_type(ord("α")) == jc.LOWERCASE_LETTER


def test_infer_type():
    assert infer_type(frozenset({jc.UPPERCASE_LETTER, jc.LOWERCASE_LETTER})) == SegmentType.WORD
    assert infer_type(frozenset({jc.LOWERCASE_LETTER})) == SegmentType.WORD_LOWERCASE
    assert infer_type(frozenset({jc.UPPERCASE_LETTER})) == SegmentType.WORD_UPPERCASE
    assert infer_type(frozenset({jc.DECIMAL_DIGIT_NUMBER})) == SegmentType.NUMBER
    assert (
        infer_type(frozenset({jc.LOWERCASE_LETTER, jc.DECIMAL_DIGIT_NUMBER}))
        == SegmentType.WORD_WITH_NUMBER
    )
    assert infer_type(frozenset({jc.OTHER_PUNCTUATION})) == SegmentType.PUNCTUATION
    assert infer_type(frozenset({jc.SPACE_SEPARATOR, jc.CONTROL})) == SegmentType.EMPTY_SPACE
    assert infer_type(frozenset({jc.MATH_SYMBOL})) == SegmentType.NON_WORD
    assert (
        infer_type(frozenset({jc.OTHER_PUNCTUATION, jc.MATH_SYMBOL})) == SegmentType.NON_WORD
    )


def test_diff_tokenizer_transitions():
    toks = diff_tokenize("Hello, 42 world w0rld!")
    assert [(t, ty.name) for t, ty in toks] == [
        ("Hello", "WORD"),
        (",", "PUNCTUATION"),
        (" ", "EMPTY_SPACE"),
        ("42", "NUMBER"),
        (" ", "EMPTY_SPACE"),
        ("world", "WORD_LOWERCASE"),
        (" ", "EMPTY_SPACE"),
        ("w0rld", "WORD_WITH_NUMBER"),
        ("!", "PUNCTUATION"),
    ]
    # reconstruction invariant: concatenation == input (up to NUL truncation)
    assert "".join(t for t, _ in diff_tokenize(TEST_TEXT)) == TEST_TEXT


def test_nul_terminates():
    assert "".join(t for t, _ in diff_tokenize("ab\x00cd")) == "ab"
    assert empty_space_tokenize("ab\x00cd")[0][0] == "ab"


def test_astral_chars_do_not_split():
    toks = diff_tokenize("a😀b")
    assert "".join(t for t, _ in toks) == "a😀b"
    # the emoji (two SURROGATE units -> CONTROL-family) separates from letters
    assert toks[0][0] == "a" and toks[1][0] == "😀" and toks[2][0] == "b"


def test_normalization_levels():
    assert normalize_segment("!!!!", SegmentType.NON_WORD, 1) == "!"
    assert normalize_segment("h3ll0", SegmentType.WORD_WITH_NUMBER, 2) == "h0ll0"
    assert normalize_segment("442", SegmentType.NUMBER, 2) == "0"
    assert normalize_segment("...", SegmentType.PUNCTUATION, 3) == "."
    assert normalize_segment("ABC", SegmentType.WORD_UPPERCASE, 4) == "abc"
    # level below threshold leaves text alone
    assert normalize_segment("442", SegmentType.NUMBER, 1) == "442"


def test_filtered_normalized_tokens_default_profile():
    # defaults: filter 5 (words only), normalize 2, mergetypes
    toks = filtered_normalized_tokens("Hello, 42 world w0rld! done")
    assert toks == ["Hello", "world", "done"]


def test_line_split():
    segs = line_split("one\ntwo\n\nthree")
    assert [(t, ty.name) for t, ty in segs] == [
        ("one", "SENTENCE"),
        ("\n", "EMPTY_SPACE"),
        ("two", "SENTENCE"),
        ("\n\n", "EMPTY_SPACE"),
        ("three", "SENTENCE"),
    ]


def test_rule_split_boundaries():
    sents = [s for s, t in rule_split("One sentence. Another one! A third? ") if t == SegmentType.SENTENCE]
    assert sents == ["One sentence. ", "Another one! ", "A third? "]


def test_rule_split_abbreviations_and_lowercase():
    # pre-boundary exception: Mr. / single initial; post rule: lowercase next
    sents = [s for s, t in rule_split("Mr. Smith met A. Miller. They talked. and left. The end.") if t == SegmentType.SENTENCE]
    assert sents[0] == "Mr. Smith met A. Miller. "
    # "talked. and" -> lowercase continuation, no split
    assert sents[1] == "They talked. and left. "
    assert sents[2] == "The end."


def test_rule_split_multidot_and_numbers():
    sents = [s for s, t in rule_split("See the U.S.A. later. It was 1.12.14. Next one.") if t == SegmentType.SENTENCE]
    assert sents[0] == "See the U.S.A. later. "
    assert sents[1] == "It was 1.12.14. Next one."  # digits-with-dots rule blocks


def test_rule_split_year_is_still_blocked_by_digit_rule():
    # the digit rule AND-ed with the positive year rule -> still no split
    # (reference accumulates decisions with &=)
    sents = [s for s, t in rule_split("It happened in 1999. Next sentence came.") if t == SegmentType.SENTENCE]
    assert sents == ["It happened in 1999. Next sentence came."]


def test_post_boundary_exception_month():
    sents = [s for s, t in rule_split("It was the 5th. December was cold.") if t == SegmentType.SENTENCE]
    assert sents == ["It was the 5th. December was cold."]


def test_sentence_maker():
    sm = SentenceMaker(min_length=2)
    out = sm.sentences("Hello World. This is nice.\nOk.")
    assert out == ["Hello World.", "This is nice."]  # "Ok." has 1 word -> dropped
    # readable tokens joined verbatim, spaces collapse to single space
    out2 = sm.sentences("A  B   C. ")
    assert out2 == ["A B C."]


def test_provider_sentences_collapse():
    assert provider_sentences("  The quick\tfox. The end.  ") == [
        "The quick fox.",
        "The end.",
    ]


def test_trim_and_replace_emptyspace_nbsp():
    assert trim_and_replace_emptyspace("a  b  c") == "a b c"


def test_convert_escapes():
    assert convert_escapes(r"\t") == "\t"
    assert convert_escapes(r"\n\n") == "\n\n"
    assert convert_escapes(r" x") == " x"
    assert convert_escapes(r"a\\b") == "a\\b"


def test_ruleset_loader_reads_reference_format(tmp_path):
    d = tmp_path / "rs"
    d.mkdir()
    (d / "boundaries.txt").write_text("# c\n. \n\\t\n", encoding="utf-8")
    (d / "preBoundaryExceptions.txt").write_text("Mr.\n", encoding="utf-8")
    (d / "preBoundaryRules.txt").write_text("- [0-9]+\n", encoding="utf-8")
    (d / "postBoundaryExceptions.txt").write_text("PDF\n", encoding="utf-8")
    (d / "postBoundaryRules.txt").write_text("- [a-z].*\n+ [A-Z].*\n", encoding="utf-8")
    rs = RuleSet.from_files("custom", str(d))
    assert rs.boundaries == frozenset({". ", "\t"})
    assert rs.pre_exceptions == frozenset({"Mr."})
    sents = [s for s, t in rule_split("One two. Three four.", rs) if t == SegmentType.SENTENCE]
    assert sents == ["One two. ", "Three four."]


def test_default_ruleset_cached():
    assert get_ruleset() is get_ruleset("default")
    assert get_ruleset("nonexistent-lang") is get_ruleset("default")
