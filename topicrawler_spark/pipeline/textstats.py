"""Text analysis for corpus curation: language ID, quality scoring, token
counting, document fingerprinting. All pure Catalyst column expressions
except the n-gram language-ID profile scorer (Arrow/numpy UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- token counting ---------------------------------------------------------


def whitespace_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-style pre-tokenizer count: GPT-2-like splits on letter runs,
    digit runs, punctuation runs and leading spaces. An upper-bound proxy for
    LLM token counts without shipping a tokenizer model."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+|\s+"), 0
    )
    # digit runs count one per digit (BPE splits numbers aggressively)
    return F.size(pieces)


# --- quality scoring -----------------------------------------------------------


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Standard curation features: lengths, ratios, repetition signals."""
    t = F.col(text_col)
    words = F.split(F.trim(t), r"\s+")
    n_chars = F.length(t)
    n_words = F.when(F.trim(t) == "", 0).otherwise(F.size(words))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?'\"()\[\]{}-]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n_words > 0, F.size(F.array_distinct(words)) / n_words).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.filter(
            words,
            lambda w: F.lower(w).isin(
                "the", "a", "an", "and", "or", "of", "to", "in", "is", "was",
                "it", "that", "for", "on", "with", "as", "at", "by", "be",
            ),
        )
    )
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    ends_terminal = F.regexp_like(F.trim(t), F.lit(r"[.!?…”\"']$")).cast("int")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_words.alias("q_words"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("q_alpha_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("q_digit_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("q_punct_ratio"),
        (n_upper / F.greatest(n_alpha, F.lit(1))).alias("q_upper_ratio"),
        mean_word_len.alias("q_mean_word_len"),
        uniq_ratio.alias("q_uniq_word_ratio"),
        stop_ratio.alias("q_stopword_ratio"),
        ends_terminal.alias("q_ends_terminal"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A single [0,1] curation score from the features (Gopher-rules-style
    monotone heuristics, not a learned model)."""
    feats = quality_features(df, text_col)
    score = (
        F.when(F.col("q_words") < 5, 0.0)
        .otherwise(
            F.least(
                F.lit(1.0),
                (
                    F.lit(0.25) * F.least(F.col("q_stopword_ratio") * 4, F.lit(1.0))
                    + F.lit(0.25) * F.least(F.col("q_alpha_ratio") * 1.25, F.lit(1.0))
                    + F.lit(0.2) * F.col("q_uniq_word_ratio")
                    + F.lit(0.15)
                    * F.when((F.col("q_mean_word_len") >= 3) & (F.col("q_mean_word_len") <= 10), 1.0).otherwise(0.0)
                    + F.lit(0.15) * F.col("q_ends_terminal")
                ),
            )
        )
    )
    return feats.withColumn("quality", F.round(score, 6))


# --- language identification -----------------------------------------------------


# tiny per-language character trigram profiles (top discriminative trigrams);
# the classifier is cosine-over-counts — a standard n-gram LID heuristic.
_LANG_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", "ed ", " in", "ion", " is", "is ", "at ", "er ", "es "],
    "de": ["er ", " de", "der", "ie ", " di", "die", "sch", "ein", "che", "ich",
           "den", "in ", "te ", " un", "und", "nd ", " be", "ver", "gen", "ung"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "re ",
           "les", " les".strip(), "que", " qu", "ue ", "ait", " et", "et ", "ne ", "eur"],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "es ", "ent",
           " en", "en ", "ue ", "que", " qu", "ción", "ado", "los", " lo", "as "],
}


def make_langid_udf():
    from pyspark.sql.types import StringType

    profiles = {k: set(v) for k, v in _LANG_PROFILES.items()}

    @F.pandas_udf(StringType())
    def langid(text: pd.Series) -> pd.Series:
        def classify(t: str | None) -> str:
            if not t:
                return "und"
            t = " " + t.lower()[:2000] + " "
            grams = [t[i : i + 3] for i in range(len(t) - 2)]
            if not grams:
                return "und"
            best, best_score = "und", 0.0
            for lang, prof in profiles.items():
                hits = sum(1 for g in grams if g in prof)
                score = hits / len(grams)
                if score > best_score:
                    best, best_score = lang, score
            return best if best_score > 0.02 else "und"

        return text.map(classify)

    return langid


# --- fingerprinting ----------------------------------------------------------------


def document_fingerprint(text: Column) -> Column:
    """64-bit content fingerprint of normalized text (xxhash64)."""
    return F.xxhash64(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 9, window: int = 4, out: str = "fingerprints"
) -> DataFrame:
    """Winnowing (MOSS-style) fingerprint sets: min rolling hash per window of
    k-char shingle hashes — robust partial-overlap detection, JVM-side."""
    kg = (
        f"transform(sequence(1, greatest(length({text_col}) - {k} + 1, 1)), "
        f"i -> xxhash64(substring({text_col}, CAST(i AS INT), {k})))"
    )
    fps = (
        f"array_distinct(transform(sequence(1, greatest(size(_kg) - {window} + 1, 1)), "
        f"j -> array_min(slice(_kg, CAST(j AS INT), {window}))))"
    )
    return df.withColumn("_kg", F.expr(kg)).withColumn(out, F.expr(fps)).drop("_kg")
