"""URL canonicalization, host class-key, and 64-bit URL fingerprints.

Pure Catalyst column expressions — no Python in the hot path. These run on
every discovered outlink (the widest dataflow in the crawl), so they must
stay inside whole-stage codegen.

Semantics re-derived from the reference's canonicalization policy (Heritrix
3.2.0 defaults as configured by the crawl profile; studied not copied):

order of rules (``RulesCanonicalizationPolicy.getDefaultRules``):
  1. LowercaseRule            — whole-URL lowercase
  2. StripUserinfoRule        — ``scheme://user:pass@`` -> ``scheme://``
  3. StripWWWNRule            — ``www[0-9]*.`` after scheme (only if a path follows)
  4. StripSessionIDs          — jsessionid/phpsessid/sid/ASPSESSIONIDxxxxxxxx
  5. StripSessionCFIDs        — CFID=...&CFTOKEN=...
  6. FixupQueryString         — trailing '?', '?&', trailing '&'

host class-key (``HostnameQueueAssignmentPolicy.getCoreKey``): authority minus
userinfo; https without explicit port gets ``:443`` appended; ``:`` -> ``#``.

64-bit fingerprint (``BdbUriUniqFilter.createKey``): high 24 bits fingerprint
scheme+authority, low 40 bits fingerprint the full canonical URL. We keep the
*layout* (so per-host locality of the seen-set is preserved — keys of one
authority share a 24-bit prefix, which buckets/partitions cleanly) but use
Spark's built-in xxhash64 as the hash function.

A pure-Python mirror of each expression lives in ``canonicalize_py`` /
``host_classkey_py`` for the reference crawl simulator; a property test pins
Spark == Python on randomized URLs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# rule regexes (Java originals are case-insensitive where noted)
_RE_USERINFO = r"^((?:(?:https?)|(?:ftps?))://)(?:[^/]+@)(.*)$"
_RE_WWWN = r"^(https?://)(?:www[0-9]*\.)([^/]*/.+)$"
_RE_SESSIONID = r"^(.+)(?:(?:(?:jsessionid)|(?:phpsessid))=[0-9a-zA-Z]{32})(?:&(.*))?$"
_RE_SID = r"^(.+)(?:sid=[0-9a-zA-Z]{32})(?:&(.*))?$"
_RE_ASPSESSION = r"^(.+)(?:ASPSESSIONID[a-zA-Z]{8}=[a-zA-Z]{24})(?:&(.*))?$"
_RE_CFID = r"^(.+)(?:cfid=[^&]+&cftoken=[^&]+(?:jsession=[^&]+)?)(?:&(.*))?$"


def _strip_match(col: Column, pattern: str, case_insensitive: bool = True) -> Column:
    """Replicate BaseRule.doStripRegexMatch: if the whole URL matches, keep
    group(1)+group(2), else leave unchanged.

    Expressed as ONE anchored regexp_replace so the rule chain stays a
    *linear* expression tree (a when/extract/extract formulation references
    its input three times per rule — seven stacked rules would blow the tree
    up 3^7-fold and stall whole-stage codegen)."""
    pat = ("(?i)" if case_insensitive else "") + pattern
    return F.regexp_replace(col, pat, "$1$2")


# FixupQueryString branch patterns. Java picks exactly ONE branch based on the
# last '?' (which must not be at position 0):
#   trailing '?'                         -> strip it
#   last '?' immediately followed by '&' -> drop the '&' ("?&" at very end: both)
#   else, trailing '&'                   -> strip it
_FIX_Q_TRAILING = r"^(.+)\?$"
_FIX_QAMP_END = r"^(.+)\?&$"
_FIX_QAMP_MID = r"^(.+\?)&([^?]*)$"  # [^?] forces the matched '?' to be the last
_FIX_AMP_END = r"^(.+\?.*)&$"


def fixup_query_string(c: Column) -> Column:
    """FixupQueryString as a single-branch conditional (mirrors Java's elif).

    One flat when-chain over the same input — the input expression is
    referenced a constant number of times (no recursive nesting)."""
    return (
        F.when(c.rlike(_FIX_Q_TRAILING), F.regexp_replace(c, _FIX_Q_TRAILING, "$1"))
        .when(c.rlike(_FIX_QAMP_END), F.regexp_replace(c, _FIX_QAMP_END, "$1"))
        .when(c.rlike(_FIX_QAMP_MID), F.regexp_replace(c, _FIX_QAMP_MID, "$1$2"))
        .when(c.rlike(_FIX_AMP_END), F.regexp_replace(c, _FIX_AMP_END, "$1"))
        .otherwise(c)
    )


def canonical_url(url: Column) -> Column:
    """Apply the full default canonicalization rule chain as column exprs."""
    c = F.lower(url)  # LowercaseRule
    c = _strip_match(c, _RE_USERINFO)  # StripUserinfoRule
    c = _strip_match(c, _RE_WWWN)  # StripWWWNRule
    c = _strip_match(c, _RE_SESSIONID)  # StripSessionIDs
    c = _strip_match(c, _RE_SID)
    c = _strip_match(c, _RE_ASPSESSION)
    c = _strip_match(c, _RE_CFID)  # StripSessionCFIDs
    return fixup_query_string(c)


def scheme_authority(url: Column) -> Column:
    """``scheme://authority`` prefix (everything before the 3rd '/'), like
    BdbUriUniqFilter.calcSchemeAuthorityKeyBytes."""
    m = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*://[^/]*)", 1)
    return F.when(m != "", m).otherwise(url)


def url_hash64(canonical: Column) -> Column:
    """64-bit URL fingerprint: 24-bit FP(scheme+authority) || 40-bit FP(url).

    Same two-level layout as the reference seen-set key so that all URLs of
    one authority share a 24-bit prefix; built on xxhash64 (JVM-side).
    """
    auth_fp = F.shiftleft(
        F.xxhash64(scheme_authority(canonical)).bitwiseAND(F.lit(0xFFFFFF)), 40
    )
    url_fp = F.shiftrightunsigned(F.xxhash64(canonical), 24)
    return auth_fp.bitwiseOR(url_fp).alias("url_hash")


def host_classkey(url: Column) -> Column:
    """Per-host frontier queue key (HostnameQueueAssignmentPolicy semantics)."""
    scheme = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*)://", 1)
    auth = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/]*)", 1)
    needs_port = (scheme == "https") & ~auth.rlike(r".+:[0-9]+$")
    keyed = F.when(needs_port, F.concat(auth, F.lit(":443"))).otherwise(auth)
    return F.translate(keyed, ":", "#")


def second_level_domain(host: Column) -> Column:
    """2nd-level domain (TooManyDomainsDecideRule.java:54-59 semantics):
    substring from the second-to-last dot."""
    nohash = F.regexp_replace(host, r"#[0-9]+$", "")
    return F.regexp_extract(nohash, r"([^.]+\.[^.]+)$", 1)


# ---------------------------------------------------------------------------
# Pure-Python mirrors (used by the crawl simulator and for property testing)
# ---------------------------------------------------------------------------

_PY_RULES = [
    re.compile("(?i)" + _RE_USERINFO, re.DOTALL),
    re.compile("(?i)" + _RE_WWWN, re.DOTALL),
    re.compile("(?i)" + _RE_SESSIONID, re.DOTALL),
    re.compile("(?i)" + _RE_SID, re.DOTALL),
    re.compile("(?i)" + _RE_ASPSESSION, re.DOTALL),
    re.compile("(?i)" + _RE_CFID, re.DOTALL),
]


def canonicalize_py(url: str) -> str:
    c = url.lower()
    for rule in _PY_RULES:
        m = rule.match(c)
        if m:
            c = (m.group(1) or "") + (m.group(2) or "")
    # FixupQueryString (direct port of the single-branch Java logic)
    idx = c.rfind("?")
    if idx > 0:
        if idx == len(c) - 1:
            c = c[:-1]
        elif c[idx + 1] == "&":
            if len(c) == idx + 2:
                c = c[:-2]
            else:
                c = c[: idx + 1] + c[idx + 2 :]
        elif c.endswith("&"):
            c = c[:-1]
    return c


def host_classkey_py(url: str) -> str:
    m = re.match(r"^([a-z][a-z0-9+.-]*)://(?:[^/@]*@)?([^/]*)", url)
    if not m:
        return ""
    scheme, auth = m.group(1), m.group(2)
    if scheme == "https" and not re.search(r".+:[0-9]+$", auth):
        auth += ":443"
    return auth.replace(":", "#")


def second_level_domain_py(host: str) -> str:
    host = re.sub(r"#[0-9]+$", "", host)
    m = re.search(r"([^.]+\.[^.]+)$", host)
    return m.group(1) if m else ""
