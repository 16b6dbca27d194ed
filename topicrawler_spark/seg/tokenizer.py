"""Tokenizers (lt.seg ``DiffTokenizer`` / ``EmptySpaceTokenizer`` semantics).

DiffTokenizer emits a new segment whenever the character stream transitions
between empty-space and non-empty-space, or into/out of the
letters+digits class (``WORD_WITH_NUMBER.allowedCharacterTypes``) — re-derived
from ``DiffTokenizer.java:55-93``. A NUL character terminates tokenization
(the reference's read loop runs ``while (cp > 0)``).

Classification uses Java char types at UTF-16 granularity (astral chars are
two SURROGATE units and thus never split internally). The implementation is
vectorized with numpy so it stays fast inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from topicrawler_spark import javachar as jc
from topicrawler_spark.seg.segtypes import (
    EMPTY_SPACE_TYPES,
    READABLE,
    WORD_WITH_NUMBER_TYPES,
    WORDLIKE,
    SegmentType,
    infer_type,
)

_N_TYPES = 32
_SPACE_LUT = np.zeros(_N_TYPES, dtype=bool)
for _t in EMPTY_SPACE_TYPES:
    _SPACE_LUT[_t] = True
_WWN_LUT = np.zeros(_N_TYPES, dtype=bool)
for _t in WORD_WITH_NUMBER_TYPES:
    _WWN_LUT[_t] = True


def _char_types(text: str) -> np.ndarray:
    """Java char type per python char (astral chars classified SURROGATE)."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    types = jc.types_array()[np.minimum(cps, 0x10FFFF)].astype(np.int8)
    astral = cps > 0xFFFF
    if astral.any():
        types = np.where(astral, np.int8(jc.SURROGATE), types)
    return types


_mask_memo: dict[int, SegmentType] = {}


def _type_for_mask(mask: int) -> SegmentType:
    """Segment type for a bitmask of char types (bit i <=> type i present)."""
    st = _mask_memo.get(mask)
    if st is None:
        types = frozenset(i for i in range(_N_TYPES) if mask & (1 << i))
        st = infer_type(types)
        _mask_memo[mask] = st
    return st


def _segments(text: str, types: np.ndarray, cuts: np.ndarray) -> list[tuple[str, SegmentType]]:
    """Slice + classify segments; one vectorized OR-reduce for the types."""
    bits = np.left_shift(np.int64(1), types.astype(np.int64))
    masks = np.bitwise_or.reduceat(bits, cuts[:-1])
    ends = cuts[1:]
    out: list[tuple[str, SegmentType]] = []
    for i in range(len(masks)):
        a = int(cuts[i])
        b = int(ends[i])
        out.append((text[a:b], _type_for_mask(int(masks[i]))))
    return out


def diff_tokenize(text: str) -> list[tuple[str, SegmentType]]:
    """All segments of the text as (segment_text, type), in order."""
    nul = text.find("\x00")
    if nul >= 0:
        text = text[:nul]
    if not text:
        return []
    types = _char_types(text)
    space = _SPACE_LUT[types]
    wwn = _WWN_LUT[types]
    if len(text) == 1:
        cuts = np.array([0, 1])
    else:
        brk = np.nonzero((space[:-1] != space[1:]) | (wwn[:-1] != wwn[1:]))[0] + 1
        cuts = np.concatenate(([0], brk, [len(text)]))
    return _segments(text, types, cuts)


def empty_space_tokenize(text: str) -> list[tuple[str, SegmentType]]:
    """Segments split only at space/non-space transitions
    (``EmptySpaceTokenizer.java:55-85``; NUL terminates)."""
    nul = text.find("\x00")
    if nul >= 0:
        text = text[:nul]
    if not text:
        return []
    types = _char_types(text)
    space = _SPACE_LUT[types]
    if len(text) == 1:
        cuts = np.array([0, 1])
    else:
        brk = np.nonzero(space[:-1] != space[1:])[0] + 1
        cuts = np.concatenate(([0], brk, [len(text)]))
    return _segments(text, types, cuts)


# ---------------------------------------------------------------------------
# filter / normalize / merge pipeline (ITokenizer.filteredAndNormalizedTokens)
# ---------------------------------------------------------------------------


def normalize_segment(text: str, st: SegmentType, level: int) -> str:
    """``Segment.asNormalizedString`` levels 0-4."""
    result = text
    if level >= 1 and st == SegmentType.NON_WORD:
        # collapse consecutive identical codepoints
        out: list[str] = []
        for ch in text:
            if not out or out[-1] != ch:
                out.append(ch)
        result = "".join(out)
    if level >= 2:
        if st == SegmentType.WORD_WITH_NUMBER:
            out = []
            for ch in text:
                if jc.is_digit(ord(ch)):
                    if not out or out[-1] != "0":
                        out.append("0")
                else:
                    out.append(ch)
            result = "".join(out)
        elif st == SegmentType.NUMBER:
            result = "0"
    if level >= 3 and st in (SegmentType.EMPTY_SPACE, SegmentType.PUNCTUATION):
        result = st.symbol
    if level >= 4:
        result = result.lower()
    return result


def filtered_segments(
    segments: list[tuple[str, SegmentType]], level: int, mergetypes: bool
) -> list[tuple[str, SegmentType]]:
    """``ITokenizer.filteredSegments`` levels 0-5 + consecutive-type merge."""
    out = segments
    # level >= 1 would drop CONTROL, but infer() never yields it for tokens
    if level >= 2:
        out = [s for s in out if s[1] != SegmentType.EMPTY_SPACE]
    if level >= 3:
        out = [s for s in out if s[1] in READABLE]
    if level >= 4:
        out = [s for s in out if s[1] != SegmentType.PUNCTUATION]
    if level >= 5:
        out = [
            s
            for s in out
            if s[1] not in (SegmentType.NUMBER, SegmentType.WORD_WITH_NUMBER)
        ]
    if mergetypes:
        merged: list[tuple[str, SegmentType]] = []
        last_type: SegmentType | None = None
        for s in out:
            st = s[1]
            if last_type is not None and st == last_type and not (
                st in WORDLIKE or st == SegmentType.WORD_WITH_NUMBER
            ):
                continue  # drop consecutive same-type non-word segments
            last_type = st
            merged.append(s)
        out = merged
    return out


def filtered_normalized_tokens(
    text: str,
    level_filter: int = 5,
    level_normalize: int = 2,
    mergetypes: bool = True,
    mergetokens: bool = False,
) -> list[str]:
    """The LM tokenization used throughout the reference at its defaults
    (``Properties``: tokenfilter=5, tokennormalize=2, merge=1)."""
    segs = filtered_segments(diff_tokenize(text), level_filter, mergetypes)
    tokens = [normalize_segment(t, st, level_normalize) for t, st in segs]
    if mergetokens:
        merged: list[str] = []
        for t in tokens:
            if not merged or merged[-1] != t:
                merged.append(t)
        tokens = merged
    return tokens
