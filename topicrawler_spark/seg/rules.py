"""Sentence-boundary rule sets (lt.seg RuleSet mechanism).

The mechanism is a faithful port of the reference rule engine
(``BoundaryList`` / ``PreBoundaryListProcessor`` / ``PreBoundaryRulesProcessor``
/ ``PostBoundaryListProcessor`` / ``PostBoundaryRulesProcessor``,
lt.seg/.../sentence/rules/): a suffix-matched boundary list, an
abbreviation exception list checked against the last whitespace-delimited
token, regex rules AND-ed over the last/first token.

The *default data* below is our own curated set covering the same semantic
space (sentence-final punctuation + closing quotes + whitespace variants;
common English/German abbreviations; the lowercase-continuation and
multi-dot-abbreviation regex rules). Richer lists in the reference's file
format (one entry per line, ``#`` comments, java escapes) can be loaded with
``RuleSet.from_files`` — the engine is data-driven, exactly like the
reference.

Deviation (documented): where several boundary entries match a suffix the
reference picks an arbitrary HashSet-iteration winner; we deterministically
pick the longest match.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from functools import lru_cache

from topicrawler_spark import javachar as jc
from topicrawler_spark.seg.segtypes import char_is_empty_space

# --- default boundary list ----------------------------------------------------

_FINAL_PUNCT = [".", "!", "?", "؟"]
_CLOSING_QUOTES = ['"', "'", "`", "»", "«", "“"]
_TRAILERS = [" ", "\n", "\t", "\r\n"]

DEFAULT_BOUNDARIES: frozenset[str] = frozenset(
    {"\t", "\x08", "\x0c", "\n\n", "\r\n\r\n"}
    | {p + q for p in _FINAL_PUNCT for q in _CLOSING_QUOTES}
    | {p + s for p in _FINAL_PUNCT for s in _TRAILERS}
)

# --- default abbreviation exception lists --------------------------------------

# words that must not END a sentence (checked against the last token,
# boundary included). Curated common English + German abbreviations.
DEFAULT_PRE_EXCEPTIONS: frozenset[str] = frozenset(
    """
    Mr. Mrs. Ms. Dr. Prof. Sr. Jr. St. Rev. Gen. Rep. Sen. Gov. Capt. Sgt.
    Lt. Col. Maj. Adm. Hon. Pres. Supt. Det. Insp. Mt. Ft. Co. Corp. Inc.
    Ltd. LLC. Dept. Univ. Assn. Bros. Ph.D. M.D. B.A. M.A. D.C. U.S. U.K.
    U.N. E.U. i.e. e.g. cf. al. etc. vs. v. viz. Jan. Feb. Mar. Apr. Jun.
    Jul. Aug. Sep. Sept. Oct. Nov. Dec. Mon. Tue. Tues. Wed. Thu. Thur.
    Thurs. Fri. Sat. Sun. approx. dept. est. min. max. misc. no. No. nos.
    pp. p. ca. cm. mm. km. kg. mg. lb. oz. sq. hr. hrs. sec. fig. Fig.
    figs. ed. eds. rev. vol. vols. op. cit. ibid. id. inst. pseud. trans.
    ch. chs. sec. secs. art. arts. par. pars. Abb. Abs. Abt. Anl. Anm.
    Art. Aufl. Bd. Bde. bzgl. bzw. ca. dgl. Dipl. Dr. einschl. entspr.
    evtl. exkl. geb. gegr. ggf. ggfs. Hr. Hrn. Hrsg. inkl. insb. Kap.
    Mio. Mrd. Nr. o.g. od. Pfd. S. s.o. s.u. sog. Str. Tel. u.a. u.U.
    usw. u.v.m. v.a. vgl. z.B. z.T. zzgl. zit. Zi. Ziff.
    """.split()
)

# words that must not FOLLOW a sentence ending (month names, file extensions
# and similar continuations; checked against the first following token).
DEFAULT_POST_EXCEPTIONS: frozenset[str] = frozenset(
    """
    TXT EXE PDF DOC HTML January February March April May June July August
    September October November December Januar Februar März Mai Juni Juli
    Oktober Dezember Jan. Feb. Mrz. Apr. Jun. Jul. Aug. Sep. Sept. Oct.
    Okt. Nov. Dec. Dez. Platz Spieltag Jahrzehnt Jahrhundert Jahrtausend Mal
    """.split()
)

# --- regex rules ----------------------------------------------------------------

# Java \p{M} / \P{M}: build explicit char classes from the Java type tables
# so plain `re` can evaluate them.
_MARK_TYPES = (jc.NON_SPACING_MARK, jc.ENCLOSING_MARK, jc.COMBINING_SPACING_MARK)


@lru_cache(maxsize=1)
def _mark_class() -> str:
    table = jc.types_array()
    import numpy as np

    is_mark = np.isin(table, _MARK_TYPES)
    # find ranges
    idx = np.nonzero(is_mark)[0]
    if len(idx) == 0:
        return ""
    parts = []
    start = prev = int(idx[0])
    for v in idx[1:]:
        v = int(v)
        if v == prev + 1:
            prev = v
            continue
        parts.append((start, prev))
        start = prev = v
    parts.append((start, prev))
    cls = []
    for a, b in parts:
        if b > 0x10FFF0:
            b = 0x10FFFF
        cls.append(re.escape(chr(a)) + ("-" + re.escape(chr(b)) if b > a else ""))
    return "".join(cls)


def _translate_java_regex(pattern: str) -> str:
    """Translate the \\p{M}/\\P{M} constructs used by the reference rules."""
    mark = _mark_class()
    pattern = pattern.replace(r"\p{M}", f"[{mark}]")
    pattern = pattern.replace(r"\P{M}", f"[^{mark}]")
    return pattern


def _compile_rules(rules: list[tuple[str, bool]]) -> list[tuple[re.Pattern, bool]]:
    return [(re.compile(_translate_java_regex(p)), d) for p, d in rules]


# Pre-boundary regex rules (decision False = "not a sentence end").
DEFAULT_PRE_RULES: list[tuple[str, bool]] = [
    (r"\P{M}\p{M}*", False),  # single letter before boundary (A. Miller)
    (r".*\P{M}\p{M}*\.\P{M}\p{M}*.*", False),  # multi-dot abbreviations (i.e., U.S.A.)
    (r"(http://)?www[a-zA-Z/\.]*", False),  # urls
    (r"[1-2][0-9][0-9][0-9]", True),  # years
    (r"[0-9\.-]+", False),  # digits with dots/hyphens
]

# Post-boundary regex rules.
DEFAULT_POST_RULES: list[tuple[str, bool]] = [
    (r"[a-z][a-zA-Z]*[\.!?]?", False),  # lowercase continuation
    (r"[\.!?,;:]+", False),  # more boundary chars
]


# --- rule evaluation -------------------------------------------------------------


def _rtrim_empty_space(text: str) -> tuple[int, int]:
    """(begin, end) of the last whitespace-delimited token, Java-style scan."""
    end = len(text)
    while end > 0 and char_is_empty_space(ord(text[end - 1])):
        end -= 1
    begin = end
    while begin > 0 and not char_is_empty_space(ord(text[begin - 1])):
        begin -= 1
    return begin, end


def last_token(text: str) -> str:
    b, e = _rtrim_empty_space(text)
    return text[b:e]


@dataclass
class RuleSet:
    name: str = "default"
    boundaries: frozenset[str] = DEFAULT_BOUNDARIES
    pre_exceptions: frozenset[str] = DEFAULT_PRE_EXCEPTIONS
    post_exceptions: frozenset[str] = DEFAULT_POST_EXCEPTIONS
    pre_rules: list = field(default_factory=lambda: list(DEFAULT_PRE_RULES))
    post_rules: list = field(default_factory=lambda: list(DEFAULT_POST_RULES))

    def __post_init__(self) -> None:
        self._max_boundary_len = max((len(b) for b in self.boundaries), default=0)
        # index boundaries by their final character for O(1) rejection of the
        # overwhelmingly common non-boundary positions
        by_last: dict[str, list[str]] = {}
        for b in self.boundaries:
            by_last.setdefault(b[-1], []).append(b)
        for v in by_last.values():
            v.sort(key=len, reverse=True)
        self._boundaries_by_last = by_last
        self._pre_compiled = _compile_rules(self.pre_rules)
        self._post_compiled = _compile_rules(self.post_rules)

    # boundary list -----------------------------------------------------

    def suffix_as_boundary(self, text: str) -> str | None:
        """Longest boundary entry that is a suffix of ``text`` (None if none)."""
        if not text:
            return None
        cands = self._boundaries_by_last.get(text[-1])
        if not cands:
            return None
        for b in cands:
            if text.endswith(b):
                return b
        return None

    # lookback ----------------------------------------------------------

    def pre_list_complete(self, text_with_boundary: str) -> bool:
        return last_token(text_with_boundary) not in self.pre_exceptions

    def pre_rules_complete(self, text_before_boundary: str) -> bool:
        if not text_before_boundary:
            return True
        tok = last_token(text_before_boundary)
        result = True
        for pat, decision in self._pre_compiled:
            if pat.fullmatch(tok):
                result = result and decision
        return result

    # lookahead -----------------------------------------------------------

    def post_list_complete(self, next_token: str) -> bool:
        return next_token not in self.post_exceptions

    def post_rules_complete(self, next_token: str) -> bool:
        result = True
        for pat, decision in self._post_compiled:
            if pat.fullmatch(next_token):
                result = result and decision
        return result

    # loading external rule files (reference file format) -------------------

    @staticmethod
    def from_files(name: str, directory: str) -> "RuleSet":
        def read_list(fname: str) -> frozenset[str]:
            path = os.path.join(directory, fname)
            entries = set()
            with open(path, encoding="utf-8-sig") as f:
                for line in f:
                    line = line.rstrip("\r\n")
                    if line and not line.startswith("#"):
                        entries.add(convert_escapes(line))
            return frozenset(entries)

        def read_rules(fname: str) -> list[tuple[str, bool]]:
            path = os.path.join(directory, fname)
            rules: list[tuple[str, bool]] = []
            with open(path, encoding="utf-8-sig") as f:
                for line in f:
                    line = line.rstrip("\r\n")
                    if not line or line.startswith("#"):
                        continue
                    if line[:2] in ("+ ", "- "):
                        rules.append((line[2:], line[0] == "+"))
            return rules

        return RuleSet(
            name=name,
            boundaries=read_list("boundaries.txt"),
            pre_exceptions=read_list("preBoundaryExceptions.txt"),
            post_exceptions=read_list("postBoundaryExceptions.txt"),
            pre_rules=read_rules("preBoundaryRules.txt"),
            post_rules=read_rules("postBoundaryRules.txt"),
        )


def convert_escapes(line: str) -> str:
    """Java-escape conversion used by the reference rule files
    (``SegmentationUtils.convert``): \\uXXXX, \\t, \\r, \\n, \\f, \\<other>."""
    out: list[str] = []
    i = 0
    while i < len(line):
        c = line[i]
        i += 1
        if c == "\\" and i < len(line):
            c = line[i]
            i += 1
            if c == "u":
                out.append(chr(int(line[i : i + 4], 16)))
                i += 4
            else:
                out.append({"t": "\t", "r": "\r", "n": "\n", "f": "\f"}.get(c, c))
        else:
            out.append(c)
    return "".join(out)


_DEFAULT_RULESET: RuleSet | None = None
_RULESETS: dict[str, RuleSet] = {}


def get_ruleset(name: str = "default") -> RuleSet:
    global _DEFAULT_RULESET
    if name in _RULESETS:
        return _RULESETS[name]
    if _DEFAULT_RULESET is None:
        _DEFAULT_RULESET = RuleSet()
    return _DEFAULT_RULESET


def register_ruleset(rs: RuleSet) -> None:
    _RULESETS[rs.name] = rs
