"""Sentence splitting (lt.seg ``LineSplitter`` + ``RuleSplitter`` semantics)
and the two sentence pipelines built on them:

- ``SentenceMaker``  — the crawler writer/scorer variant
  (``lt.ltbot/.../writer/SentenceMakerJava8.java:64-86``): line split ->
  rule split -> re-join readable tokens verbatim (spaces for EMPTY_SPACE),
  drop sentences with fewer than ``min_length`` words.
- ``provider_sentences`` — the LM provider variant
  (``lt.lm/.../service/LtSegProvider.java:94-123``): whitespace-collapse the
  text, rule split, whitespace-collapse each sentence.
"""

from __future__ import annotations

import re

from topicrawler_spark.seg.rules import RuleSet, get_ruleset
from topicrawler_spark.seg.segtypes import (
    SegmentType,
    char_is_empty_space,
    char_is_line_separator,
)
from topicrawler_spark.seg.tokenizer import diff_tokenize, empty_space_tokenize

# lt.utilities StringUtils: [\s ]+ with Java \s (ASCII)
_EMPTYSPACE_RUN = re.compile("[ \\t\\n\\x0b\\f\\r ]+")
_EMPTYSPACE_LEAD = re.compile("^[ \\t\\n\\x0b\\f\\r ]+")
_EMPTYSPACE_TRAIL = re.compile("[ \\t\\n\\x0b\\f\\r ]+$")


def trim_and_replace_emptyspace(text: str, replacement: str = " ") -> str:
    """lt.utilities ``StringUtils.trim_and_replace_emptyspace``."""
    text = _EMPTYSPACE_LEAD.sub("", _EMPTYSPACE_TRAIL.sub("", text))
    return _EMPTYSPACE_RUN.sub(replacement, text)


def line_split(text: str) -> list[tuple[str, SegmentType]]:
    """Alternating runs of line-separators (EMPTY_SPACE) and line content
    (SENTENCE) — ``LineSplitter.java:35-73``."""
    if not text:
        return []
    out: list[tuple[str, SegmentType]] = []
    start = 0
    cur_is_nl = char_is_line_separator(ord(text[0]))
    for i in range(1, len(text)):
        is_nl = char_is_line_separator(ord(text[i]))
        if is_nl != cur_is_nl:
            out.append((text[start:i], SegmentType.EMPTY_SPACE if cur_is_nl else SegmentType.SENTENCE))
            start = i
            cur_is_nl = is_nl
    out.append((text[start:], SegmentType.EMPTY_SPACE if cur_is_nl else SegmentType.SENTENCE))
    return out


def rule_split(text: str, rules: RuleSet | str = "default") -> list[tuple[str, SegmentType]]:
    """Boundary-rule sentence splitting — ``RuleSplitter.java:43-115``.

    After each appended character, if the accumulated text ends with a
    boundary entry AND the look-back checks (abbreviation list on the last
    token incl. boundary; regex rules on the text before the boundary) AND
    the look-ahead checks (next approximate token not in the continuation
    list; regex rules) all pass, the sentence ends (boundary included).
    A NUL character terminates splitting, like the reference's read loop.
    """
    if isinstance(rules, str):
        rules = get_ruleset(rules)
    nul = text.find("\x00")
    if nul >= 0:
        text = text[:nul]
    out: list[tuple[str, SegmentType]] = []
    n = len(text)
    i = 0
    max_b = rules._max_boundary_len
    while i < n:
        start = i
        first_is_newline = char_is_line_separator(ord(text[i]))
        is_empty = first_is_newline
        end = None
        while i < n:
            ch = text[i]
            i += 1
            is_empty = is_empty and char_is_empty_space(ord(ch))
            # boundary suffix check on a bounded window (the reference caps
            # the suffix window at 100 chars; entries are far shorter)
            lo = max(start, i - max_b)
            suffix = rules.suffix_as_boundary(text[lo:i])
            if suffix is not None:
                seg = text[start:i]
                if rules.pre_list_complete(seg) and rules.pre_rules_complete(
                    seg[: len(seg) - len(suffix)]
                ):
                    nxt = _next_approximate_token(text, i)
                    if (
                        nxt is None
                        or (
                            rules.post_list_complete(nxt)
                            and rules.post_rules_complete(nxt)
                        )
                    ):
                        end = i
                        break
            if is_empty and i < n and not char_is_line_separator(ord(text[i])):
                end = i
                break
        if end is None:
            end = n
        seg = text[start:end]
        out.append((seg, SegmentType.EMPTY_SPACE if is_empty else SegmentType.SENTENCE))
        i = end
    return out


def _next_approximate_token(text: str, pos: int) -> str | None:
    """First EmptySpaceTokenizer segment of the remaining text (lookahead)."""
    if pos >= len(text):
        return None
    # tokenizing just a bounded window is enough: the first segment ends at
    # the first space/non-space transition
    window = text[pos : pos + 1000]
    toks = empty_space_tokenize(window)
    return toks[0][0] if toks else None


class SentenceMaker:
    """Crawler-side sentence production (SentenceMakerJava8 semantics).

    Per-line results are memoized (bounded, cleared wholesale at the cap):
    sentence production is a pure function of the line + ruleset, and web
    pages repeat whole boilerplate lines (site chrome) across a host, so
    the rule-split + tokenize work is skipped on repeats with results
    exactly identical.
    """

    def __init__(
        self, min_length: int = 2, language_code: str = "default", line_cache_max: int = 200_000
    ) -> None:
        self.min_length = min_length
        self.language_code = language_code
        self._line_cache_max = line_cache_max
        self._cache: dict[str, list[str]] = {}

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_cache"] = {}
        return state

    def sentences(self, text: str) -> list[str]:
        out: list[str] = []
        for line, lt in line_split(text):
            if lt != SegmentType.SENTENCE:
                continue
            hit = self._cache.get(line)
            if hit is None:
                hit = self._line_sentences(line)
                if len(self._cache) >= self._line_cache_max:
                    self._cache.clear()
                self._cache[line] = hit
            out.extend(hit)
        return out

    def _line_sentences(self, line: str) -> list[str]:
        rules = get_ruleset(self.language_code)
        out: list[str] = []
        for sent, st in rule_split(line, rules):
            if st != SegmentType.SENTENCE:
                continue
            words = 0
            parts: list[str] = []
            for tok, tt in diff_tokenize(sent):
                if tt in (SegmentType.WORD, SegmentType.WORD_UPPERCASE, SegmentType.WORD_LOWERCASE):
                    words += 1
                if tt == SegmentType.EMPTY_SPACE:
                    parts.append(" ")
                elif tt in (
                    SegmentType.WORD, SegmentType.NUMBER, SegmentType.WORD_WITH_NUMBER,
                    SegmentType.WORD_UPPERCASE, SegmentType.WORD_LOWERCASE, SegmentType.PUNCTUATION,
                ):
                    parts.append(tok)
            joined = _java_trim("".join(parts))
            if words < self.min_length or not joined:
                continue
            out.append(joined)
        return out


def provider_sentences(text: str, rules: RuleSet | str = "default", onedocperline: bool = False) -> list[str]:
    """LM-provider sentence splitting (LtSegProvider.splitSentences)."""
    if isinstance(rules, str):
        rules = get_ruleset(rules)
    out: list[str] = []

    def split_into(chunk: str) -> None:
        chunk = trim_and_replace_emptyspace(chunk, " ")
        for seg, st in rule_split(chunk, rules):
            if st != SegmentType.SENTENCE:
                continue
            s = trim_and_replace_emptyspace(seg, " ")
            if s:
                out.append(s)

    if onedocperline:
        for line in text.splitlines():
            split_into(line)
    else:
        split_into(text)
    return out


def _java_trim(s: str) -> str:
    i, j = 0, len(s)
    while i < j and ord(s[i]) <= 0x20:
        i += 1
    while j > i and ord(s[j - 1]) <= 0x20:
        j -= 1
    return s[i:j]
