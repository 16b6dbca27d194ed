"""n-gram sequence generation (lt.lm provider semantics).

- sentence tags: ``<s>`` / ``</s>`` inserted per ``insertSentenceTags``
  (default 3 = both; ``AbstractStringProvider.tokenizeSentence``)
- boundary handling modes (``LMProviderUtils.getNgramSequence``):
  -1 = drop sequences shorter than the order
   0 = keep one short n-gram for short sequences (default)
   1 = left-pad with the first element
   2 = grow 2..order-1 prefixes before sliding
"""

from __future__ import annotations

from topicrawler_spark.seg.sentences import provider_sentences
from topicrawler_spark.seg.tokenizer import filtered_normalized_tokens

SEQUENCE_START = "<s>"
SEQUENCE_END = "</s>"
UNKNOWN_WORD = "<unk>"


def ngram_sequence(seq: list[str], order: int, boundary_mode: int = 0) -> list[list[str]]:
    if not seq:
        return []
    if boundary_mode == 1:
        seq = [seq[0]] * (order - 2) + seq
    if boundary_mode == -1 and len(seq) < order:
        return []
    if len(seq) == 1 or (len(seq) <= order and boundary_mode < 2):
        return [list(seq)]
    l = len(seq)
    o = min(l, order)
    n = l - o + 1
    out: list[list[str]] = []
    if boundary_mode == 2:
        for i in range(o - 2):
            out.append(list(seq[0 : i + 2]))
    for j in range(l - o + 1):
        out.append(list(seq[j : j + o]))
    del n
    return out


def provider_tokenize(
    sentence: str,
    insert_tags: int = 3,
    level_filter: int = 5,
    level_normalize: int = 2,
    mergetypes: bool = True,
    mergetokens: bool = False,
) -> list[str]:
    """LM tokenization of one sentence incl. sentence tags."""
    tokens = filtered_normalized_tokens(
        sentence, level_filter, level_normalize, mergetypes, mergetokens
    )
    if insert_tags <= 0 or not tokens:
        return tokens
    out: list[str] = []
    if insert_tags % 2 == 1:
        out.append(SEQUENCE_START)
    out.extend(tokens)
    if insert_tags > 1:
        out.append(SEQUENCE_END)
    return out


def provider_ngrams(
    text: str,
    order: int,
    language_code: str = "default",
    boundary_mode: int = 0,
    insert_tags: int = 3,
) -> list[list[str]]:
    """``LtSegProvider.getNgrams``: split -> tokenize(+tags) -> ngram windows,
    concatenated across sentences."""
    out: list[list[str]] = []
    for sentence in provider_sentences(text, language_code):
        tokens = provider_tokenize(sentence, insert_tags)
        if not tokens:
            continue
        out.extend(ngram_sequence(tokens, order, boundary_mode))
    return out
