"""Outlink extraction (ExtractorHTML-equivalent, navigational subset).

Heritrix's ExtractorHTML (as configured by the reference crawl profile:
no javascript extraction, no form actions, frames treated as navigational
links) discovers: ``a/area/link @href``, ``frame/iframe @src``, meta-refresh
targets, and embed resources (img/script/embed src) as 'E' hops. We extract
the same link classes with an HTMLParser pass, resolve against the document
base (honoring ``<base href>``), drop fragments and non-fetchable schemes.

Returned as (url, hop_type) where hop_type is 'L' (navlink) or 'E' (embed),
matching the hop-path letters used in the reference's frontier records.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

_SKIP_SCHEMES = re.compile(r"(?i)^(javascript|mailto|data|tel|ftp|file|about|vbscript):")
_META_REFRESH_URL = re.compile(r"(?i)url\s*=\s*([^;,\s]+)")

_NAV_ATTRS = {("a", "href"), ("area", "href"), ("link", "href"), ("frame", "src"), ("iframe", "src")}
_EMBED_ATTRS = {("img", "src"), ("embed", "src"), ("script", "src"), ("source", "src")}


class _LinkParser(HTMLParser):
    def __init__(self, base_url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.links: list[tuple[str, str]] = []

    def _emit(self, raw: str, hop: str) -> None:
        raw = raw.strip()
        if not raw or _SKIP_SCHEMES.match(raw):
            return
        try:
            absolute = urljoin(self.base, raw)
        except ValueError:
            return
        absolute, _ = urldefrag(absolute)
        if absolute.startswith(("http://", "https://")):
            self.links.append((absolute, hop))

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "base" and d.get("href"):
            try:
                self.base = urljoin(self.base, d["href"].strip())
            except ValueError:
                pass
            return
        if tag == "meta" and (d.get("http-equiv") or "").lower() == "refresh":
            m = _META_REFRESH_URL.search(d.get("content") or "")
            if m:
                self._emit(m.group(1).strip("'\""), "R")
            return
        for (t, attr), hop in [(x, "L") for x in _NAV_ATTRS] + [(x, "E") for x in _EMBED_ATTRS]:
            if tag == t and d.get(attr):
                self._emit(d[attr], hop)

    handle_startendtag = handle_starttag


def extract_outlinks(html: str, base_url: str) -> list[tuple[str, str]]:
    """All discovered (absolute_url, hop_type) pairs, document order, deduped."""
    p = _LinkParser(base_url)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    seen: set[str] = set()
    out: list[tuple[str, str]] = []
    for url, hop in p.links:
        if url not in seen:
            seen.add(url)
            out.append((url, hop))
    return out
