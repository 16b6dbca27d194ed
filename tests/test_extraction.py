"""Golden tests for the HTML->text extraction pipeline (byte-identical contract).

The goldens in ``tests/golden/extract/html_fixtures.json`` are the extraction
results of the reference test pages (clean -> jsoup-text -> clean -> trailing
strip), derived from the jsoup 1.7.3 semantics documented in
``topicrawler_spark/functions/jsouptext.py`` and hand-verified against the
traversal rules for every fixture.
"""

from __future__ import annotations

import json
import os

import pytest

from topicrawler_spark.functions.cleaning import REPLACEMENT, clean_ext, clean_min
from topicrawler_spark.functions.jsouptext import (
    abbreviate,
    abbreviated_plaintext,
    extract_text,
    get_plaintext,
    java_trim,
    soup_text,
)

HERE = os.path.dirname(os.path.abspath(__file__))
HTML_DIR = "/root/reference/lt.ltbot/src/test/resources/html"


def _golden() -> dict[str, str]:
    with open(os.path.join(HERE, "golden", "extract", "html_fixtures.json")) as f:
        return json.load(f)


@pytest.mark.skipif(not os.path.isdir(HTML_DIR), reason="reference fixtures unavailable")
def test_reference_html_fixtures_byte_identical():
    golden = _golden()
    for name, expected in golden.items():
        html = open(os.path.join(HTML_DIR, name), encoding="utf-8").read()
        assert extract_text(html) == expected, name


def test_index_html_trace():
    # independently hand-derived from the jsoup text() rules
    html = (
        "<html>\n <body>\n\t<p>\n\t\tHello!\n\t</p>\n"
        ' \t<a href="a.html">ab</a>\n </body>\n</html>'
    )
    assert extract_text(html) == "Hello!\n ab"


def test_block_spacing_and_inline():
    assert soup_text("<div>a</div><div>b</div>") == "a b"
    assert soup_text("<span>a</span><span>b</span>") == "ab"
    assert soup_text("one<br>two") == "one two"
    assert soup_text("<p>x   y\t\nz</p>") == "x y z"


def test_script_style_excluded():
    assert soup_text("<p>a</p><script>var x=1;</script><p>b</p>") == "a b"
    assert soup_text("<style>p{}</style><p>c</p>") == "c"


def test_preserve_whitespace_pre():
    assert soup_text("<pre>a  b\nc</pre>") == "a  b\nc"


def test_title_included():
    assert soup_text("<html><head><title>T</title></head><body>B</body></html>") == "T B"


def test_entities_decoded():
    assert soup_text("<p>a&amp;b &lt;c&gt;</p>") == "a&b <c>"


def test_p_newline_preserved():
    # </p> injects br2nl -> newline survives normalization
    assert get_plaintext("<p>one</p><p>two</p>") == "one\n two"


def test_trailing_ws_java_regex():
    # (?m)\s+$ with Java semantics: eats the whitespace run ending before a
    # line terminator, NBSP untouched (Java \s is ASCII-only)
    assert get_plaintext("<p>a</p>\n \n\n b") == "a\n b"
    s = "x "
    assert java_trim(s) == s  # NBSP > U+0020 -> not trimmed


def test_cleaners():
    assert clean_min("a﻿b�c") == f"a{REPLACEMENT}b{REPLACEMENT}c"
    assert clean_min("aⅠb") == "aⅠb"  # roman numeral: Min keeps
    assert clean_ext("aⅠb") == f"a{REPLACEMENT}b"  # Ext replaces
    assert clean_ext("\x01\x1f\x7f\x81") == REPLACEMENT * 4
    assert clean_ext("hello") == "hello"


@pytest.mark.skipif(
    not os.path.isfile("/root/reference/lt.ltbot/src/test/resources/untokenizable.txt"),
    reason="reference fixtures unavailable",
)
def test_untokenizable_fixture_clean_idempotent():
    raw = open(
        "/root/reference/lt.ltbot/src/test/resources/untokenizable.txt", encoding="utf-8", errors="replace"
    ).read()
    once_min, twice_min = clean_min(raw), clean_min(clean_min(raw))
    assert once_min == twice_min
    once_ext = clean_ext(raw)
    assert clean_ext(once_ext) == once_ext
    for ch in once_ext:
        assert ord(ch) not in (0xFEFF, 0xFFFD)


def test_abbreviate_commons_lang():
    assert abbreviate("abcdefghijklmno", 10) == "abcdefg..."
    assert abbreviate("short", 10) == "short"
    assert abbreviated_plaintext("a  b\t\nc") == "a b c"


def test_error_fallback_never_raises():
    # pathological markup must not raise
    bad = "<p><a href='x" + "<" * 100 + "\x00<di v<<>"
    assert isinstance(extract_text(bad), str)
