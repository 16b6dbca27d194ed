"""UTF-8 "dirty character" cleaners.

Parity targets (reference, studied not copied):
- ``lt.ltbot/.../text/UTF8CleanerMin.java:26-59``  — BOM + U+FFFD -> U+00BF
- ``lt.ltbot/.../text/UTF8CleanerExt.java:26-129`` — ~100 codepoints -> U+00BF

The reference replaces *UTF-16 code units* (Java chars), so lone surrogates
U+D83C/U+D83D in the Ext list split astral pairs. We reproduce that by
transforming at the UTF-16 level.

The production scorer chain uses the Min cleaner by default
(``DecesiveValueProducerPerplexity`` constructor) while the shipped crawl
profile configures Ext for the scorer and Min for the writers; both are
exposed here.
"""

from __future__ import annotations

REPLACEMENT = "¿"  # ¿

MIN_DIRTY = (0xFEFF, 0xFFFD)

EXT_DIRTY = tuple(
    list(range(0x0001, 0x0009))  # C0 controls 01-08
    + list(range(0x000E, 0x0020))  # C0 controls 0E-1F
    + [0x007F, 0x0081, 0x0082, 0x0083, 0x0084, 0x0086, 0x0087, 0x0088, 0x0089,
       0x008A, 0x008B, 0x008C, 0x008D, 0x008E, 0x008F, 0x0090, 0x0095, 0x0098,
       0x0099, 0x009A, 0x009B, 0x009C, 0x009D, 0x009E, 0x009F,
       0x09F3, 0x0D03, 0x0F9D, 0x0D4D, 0x17DB,
       0x200C, 0x2010, 0x2011, 0x2012, 0x202F,
       0x20A1, 0x20A2, 0x20A3, 0x20A5, 0x20A6, 0x20A7, 0x20A8, 0x20A9, 0x20AA,
       0x20AB, 0x20AD, 0x20AE, 0x20AF, 0x20B0, 0x20B3, 0x20B4, 0x20B5,
       0x2160, 0x2161, 0x2162, 0x2163, 0x2164, 0x2165, 0x2166, 0x2167, 0x2168,
       0xD83C, 0xD83D,
       0xE716, 0xE776, 0xF020, 0xF044, 0xF074,
       0xFEFF, 0xFFFC, 0xFFFD]
)

_MIN_TABLE = {cp: REPLACEMENT for cp in MIN_DIRTY}
_EXT_BMP_TABLE = {cp: REPLACEMENT for cp in EXT_DIRTY if not 0xD800 <= cp <= 0xDFFF}
_EXT_SURROGATES = frozenset(cp for cp in EXT_DIRTY if 0xD800 <= cp <= 0xDFFF)


def clean_min(text: str) -> str:
    """UTF8CleanerMin.clean — replace BOM and U+FFFD with U+00BF."""
    return text.translate(_MIN_TABLE)


def clean_ext(text: str) -> str:
    """UTF8CleanerExt.clean — replace the extended dirty set with U+00BF.

    Operates per UTF-16 unit when the text contains astral characters so the
    lone-surrogate entries (U+D83C/U+D83D) behave exactly as in Java.
    """
    cleaned = text.translate(_EXT_BMP_TABLE)
    if any(ord(c) > 0xFFFF for c in cleaned):
        units = []
        for ch in cleaned:
            cp = ord(ch)
            if cp > 0xFFFF:
                cp -= 0x10000
                hi, lo = 0xD800 + (cp >> 10), 0xDC00 + (cp & 0x3FF)
                units.append(REPLACEMENT if hi in _EXT_SURROGATES else chr(hi))
                units.append(chr(lo))
            else:
                units.append(ch)
        # lone low surrogates survive in Java; keep them via surrogatepass
        cleaned = "".join(units)
    return cleaned


CLEANERS = {"min": clean_min, "ext": clean_ext}
