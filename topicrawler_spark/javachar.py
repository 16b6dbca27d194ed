"""Java ``Character.getType`` parity layer.

The reference segmenter (lt.seg) classifies characters with Java's
``Character.getType(int)`` (see reference ``lt.seg/.../SegmentType.java:156-174``,
``SegmentationUtils.java:199-205``). Python's ``unicodedata.category`` differs
from Java's tables on a number of codepoints and tracks a different Unicode
version, so for exact parity we ship a run-length-encoded dump of
``Character.getType`` for all codepoints 0..0x10FFFF, generated once with the
local JDK (see ``scripts/gen_chartypes.md``). Lookup is O(log n) via bisect on
~3.9k runs; a 256-entry direct table accelerates ASCII/Latin-1.
"""

from __future__ import annotations

import bisect
import gzip
import os

# Java Character type constants (java.lang.Character)
UNASSIGNED = 0
UPPERCASE_LETTER = 1
LOWERCASE_LETTER = 2
TITLECASE_LETTER = 3
MODIFIER_LETTER = 4
OTHER_LETTER = 5
NON_SPACING_MARK = 6
ENCLOSING_MARK = 7
COMBINING_SPACING_MARK = 8
DECIMAL_DIGIT_NUMBER = 9
LETTER_NUMBER = 10
OTHER_NUMBER = 11
SPACE_SEPARATOR = 12
LINE_SEPARATOR = 13
PARAGRAPH_SEPARATOR = 14
CONTROL = 15
FORMAT = 16
PRIVATE_USE = 18
SURROGATE = 19
DASH_PUNCTUATION = 20
START_PUNCTUATION = 21
END_PUNCTUATION = 22
CONNECTOR_PUNCTUATION = 23
OTHER_PUNCTUATION = 24
MATH_SYMBOL = 25
CURRENCY_SYMBOL = 26
MODIFIER_SYMBOL = 27
OTHER_SYMBOL = 28
INITIAL_QUOTE_PUNCTUATION = 29
FINAL_QUOTE_PUNCTUATION = 30

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "resources", "java_chartypes.tsv.gz")

_starts: list[int] = []
_types: list[int] = []
_ascii: list[int] = []


def _load() -> None:
    global _starts, _types, _ascii
    if _starts:
        return
    starts: list[int] = []
    types: list[int] = []
    with gzip.open(_TABLE_PATH, "rt") as f:
        for line in f:
            s, t = line.split("\t")
            starts.append(int(s))
            types.append(int(t))
    _starts = starts
    _types = types
    _ascii = [_lookup(cp) for cp in range(256)]


def _lookup(cp: int) -> int:
    i = bisect.bisect_right(_starts, cp) - 1
    return _types[i]


def get_type(cp: int) -> int:
    """Java ``Character.getType(cp)`` for a codepoint / UTF-16 unit value."""
    if not _starts:
        _load()
    if 0 <= cp < 256:
        return _ascii[cp]
    if cp < 0 or cp > 0x10FFFF:
        return UNASSIGNED
    return _lookup(cp)


def is_digit(cp: int) -> bool:
    """Java ``Character.isDigit``: type == DECIMAL_DIGIT_NUMBER."""
    return get_type(cp) == DECIMAL_DIGIT_NUMBER


_np_table = None


def types_array():
    """Full 0..0x10FFFF -> Java char-type lookup table as a numpy uint8 array.

    ~1 MB, built once per process; enables vectorized classification of whole
    documents inside pandas UDFs instead of per-char Python calls.
    """
    global _np_table
    if _np_table is None:
        import numpy as np

        if not _starts:
            _load()
        table = np.zeros(0x110000, dtype=np.uint8)
        bounds = _starts + [0x110000]
        for i, t in enumerate(_types):
            table[bounds[i] : bounds[i + 1]] = t
        _np_table = table
    return _np_table


def utf16_units(text: str) -> list[int]:
    """The string as Java sees it: a sequence of UTF-16 code-unit values.

    The reference tokenizers consume ``Reader.read()`` which yields UTF-16
    units, not codepoints (``DiffTokenizer.java:67-77``); astral characters
    appear as surrogate pairs classified as ``SURROGATE``. We reproduce that.
    """
    out: list[int] = []
    for ch in text:
        cp = ord(ch)
        if cp > 0xFFFF:
            cp -= 0x10000
            out.append(0xD800 + (cp >> 10))
            out.append(0xDC00 + (cp & 0x3FF))
        else:
            out.append(cp)
    return out
