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


# Per-language character trigram profiles (top discriminative trigrams,
# space-padded, lowercase) — the classic Cavnar-Trenkle-style n-gram LID
# heuristic. 14 Latin-script languages are scored by profile-hit rate; 10
# more are identified by dominant Unicode script (stage 1), for 24 total.
_LANG_PROFILES: dict[str, list[str]] = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", "ed ", " in", "ion", " is", "is ", "at ", "er ", "es "],
    "de": ["er ", " de", "der", "ie ", " di", "die", "sch", "ein", "che", "ich",
           "den", "in ", "te ", " un", "und", "nd ", " be", "ver", "gen", "ung"],
    "fr": [" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "re ",
           "les", "que", " qu", "ue ", "ait", " et", "et ", "ne ", "eur", " pa"],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "es ", "ent",
           " en", "en ", "ue ", "que", " qu", "ado", "los", " lo", "as ", "nte"],
    "pt": [" de", "de ", "os ", "ão ", " do", "do ", " da", "da ", "que", " qu",
           "ue ", " em", "em ", "ção", "ent", " co", "ara", " pa", "res", "uma"],
    "it": [" di", "di ", "to ", " la", "la ", "che", " ch", "he ", "no ", "ato",
           "one", "zio", "ion", "ell", "del", " de", "are", "ta ", " co", "lla"],
    "nl": ["en ", " de", "de ", "et ", " he", "het", "van", " va", "an ", "een",
           " ee", "ijk", "aar", " ge", "oor", "der", " en", "ing", "nde", "ver"],
    "sv": ["en ", "et ", "ar ", " oc", "och", "ch ", "för", " fö", "att", " at",
           "tt ", "som", " so", "om ", "ill", "til", " ti", "ing", " är", "är "],
    "da": ["er ", "en ", "et ", " de", "der", "de ", " og", "og ", " at", "at ",
           " fo", "for", "til", " ti", "ing", "nde", "ede", "ger", " me", "med"],
    "fi": ["en ", "in ", "an ", "on ", "ta ", " on", "ja ", " ja", "sta", "aan",
           "een", "lla", "ssa", "ist", "tä ", "än ", "ksi", "nen", "itt", "ett"],
    "pl": ["ie ", " po", " ni", "nie", "na ", " na", "ch ", "ego", " pr", "rze",
           "ych", "owa", "ani", "go ", "że ", " że", "ej ", "ość", "ać ", " w "],
    "ro": [" de", "de ", "ul ", " în", "în ", " co", "are", "ea ", "le ", "și ",
           " și", "ste", " ca", "tre", "lor", "are", "int", "ntr", " cu", "cu "],
    "tr": ["ler", "lar", "an ", "ın ", "bir", " bi", "ir ", "in ", "ar ", " da",
           "da ", " de", "eri", "ile", " il", "nda", "ası", "ını", "yor", " ka"],
    "id": ["an ", " me", "ng ", "ang", "yan", " ya", "ada", " ad", "kan", "ah ",
           " di", "di ", "nya", "ber", " be", "ata", "eng", "men", "ter", " te"],
}

# stage-1 script ranges (inclusive): dominant non-Latin script -> language
_SCRIPT_RANGES: list[tuple[int, int, str]] = [
    (0x0370, 0x03FF, "el"),
    (0x0400, 0x04FF, "ru"),
    (0x0590, 0x05FF, "he"),
    (0x0600, 0x06FF, "ar"),
    (0x0900, 0x097F, "hi"),
    (0x0E00, 0x0E7F, "th"),
    (0x1100, 0x11FF, "ko"),
    (0x3040, 0x30FF, "ja"),
    (0x4E00, 0x9FFF, "zh"),
    (0xAC00, 0xD7AF, "ko"),
]
# Ukrainian-specific Cyrillic letters distinguishing uk from ru
_UK_CHARS = frozenset([0x0404, 0x0406, 0x0407, 0x0454, 0x0456, 0x0457, 0x0490, 0x0491])

LANGID_LANGUAGES: tuple[str, ...] = tuple(
    sorted(set(_LANG_PROFILES) | {lang for _, _, lang in _SCRIPT_RANGES} | {"uk"})
)


def _tri_hashes(cp: "object") -> "object":
    """Injective uint64 hash of codepoint trigrams (codepoints < 2^21)."""
    import numpy as np

    c = cp.astype(np.uint64)
    return (c[:-2] << np.uint64(42)) ^ (c[1:-1] << np.uint64(21)) ^ c[2:]


def make_langid_udf(max_chars: int = 2000):
    """Vectorized language ID: per Arrow batch, ONE numpy pass hashes every
    character trigram of the (lowercased, truncated) batch text, scores the
    14 Latin-script profiles by sorted-array membership (np.isin +
    per-document bincount), and short-circuits non-Latin scripts by Unicode
    range (10 more languages incl. the uk-vs-ru letter split) — no per-row
    Python in the hot loop."""
    import numpy as np

    from pyspark.sql.types import StringType

    latin_langs = sorted(_LANG_PROFILES)
    prof = {}
    for lang in latin_langs:
        cps = np.array(
            [[ord(ch) for ch in g] for g in _LANG_PROFILES[lang]], dtype=np.uint64
        )
        prof[lang] = np.unique(
            (cps[:, 0] << np.uint64(42)) ^ (cps[:, 1] << np.uint64(21)) ^ cps[:, 2]
        )
    bounds = np.array([lo for lo, _, _ in _SCRIPT_RANGES] + [0x110000], dtype=np.uint32)
    highs = np.array([hi for _, hi, _ in _SCRIPT_RANGES], dtype=np.uint32)
    script_lang = [lang for _, _, lang in _SCRIPT_RANGES]
    uk_chars = np.array(sorted(_UK_CHARS), dtype=np.uint32)

    @F.pandas_udf(StringType())
    def langid(text: pd.Series) -> pd.Series:
        n_docs = len(text)
        if n_docs == 0:
            return pd.Series([], dtype=object)
        # one flat codepoint array for the whole batch, NUL-separated
        # (documents are padded with spaces like the profiles expect)
        clean = [
            " " + str(t).replace("\x00", " ")[:max_chars].lower() + " " if t else "  "
            for t in text
        ]
        joined = "\x00".join(clean) + "\x00"
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        doc_of = np.cumsum(cp == 0) - (cp == 0)  # doc index per codepoint
        out = np.full(n_docs, "und", dtype=object)

        # ---- stage 1: script detection --------------------------------
        idx = np.searchsorted(bounds, cp, side="right") - 1
        in_range = (idx >= 0) & (idx < len(highs))
        in_range[in_range] &= cp[in_range] <= highs[idx[in_range]]
        n_scripts = len(script_lang)
        script_counts = np.bincount(
            doc_of[in_range] * n_scripts + idx[in_range],
            minlength=n_docs * n_scripts,
        ).reshape(n_docs, n_scripts)
        is_letter = (cp > 0x40) & (cp != 0x20)  # crude letter-ish mask
        letters = np.bincount(doc_of[is_letter], minlength=n_docs).astype(np.float64)
        top_script = script_counts.argmax(axis=1)
        top_count = script_counts.max(axis=1)
        scripted = top_count > 0.3 * np.maximum(letters, 1.0)
        uk_hits = np.bincount(doc_of[np.isin(cp, uk_chars)], minlength=n_docs)
        for d in np.flatnonzero(scripted):
            lang = script_lang[top_script[d]]
            if lang == "ru" and uk_hits[d] > 0:
                lang = "uk"
            # CJK ideographs with any kana present read as Japanese
            if lang == "zh" and script_counts[d][script_lang.index("ja")] > 0:
                lang = "ja"
            out[d] = lang

        # ---- stage 2: Latin trigram profiles --------------------------
        if len(cp) >= 3:
            h = _tri_hashes(cp)
            tri_doc = doc_of[: len(h)]
            valid = (cp[:-2] != 0) & (cp[1:-1] != 0) & (cp[2:] != 0)
            h, tri_doc = h[valid], tri_doc[valid]
            grams = np.bincount(tri_doc, minlength=n_docs).astype(np.float64)
            grams = np.maximum(grams, 1.0)
            scores = np.zeros((n_docs, len(latin_langs)))
            for li, lang in enumerate(latin_langs):
                member = np.isin(h, prof[lang], assume_unique=False)
                scores[:, li] = (
                    np.bincount(tri_doc[member], minlength=n_docs) / grams
                )
            best = scores.argmax(axis=1)
            best_score = scores.max(axis=1)
            lat = (~scripted) & (best_score > 0.02) & (letters > 0)
            for d in np.flatnonzero(lat):
                out[d] = latin_langs[best[d]]
        return pd.Series(out)

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
