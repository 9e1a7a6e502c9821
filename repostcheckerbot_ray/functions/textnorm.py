"""Text canonicalization + tokenization (pure, no Ray).

The canonicalizer reproduces the reference's whitespace-stripping invariant
(`canonical(s)` at /root/reference/database.py:45-46 and the inline
`.replace('\\n','').replace('\\r','').replace(' ','')` at database.py:126):
remove every character ``c`` for which ``c.isspace()`` is true. This is the
byte-identity target of the north rule: pipeline output per url must equal
``canonicalize(extract_text(html))`` exactly, at any batch size/parallelism.

The sentinel predicate reproduces the reference's text-validity check
(/root/reference/database.py:364, 727).
"""

from __future__ import annotations

import functools
import sys

# Sentinels the reference treats as "no usable text" (database.py:364, 727).
TEXT_SENTINELS = frozenset({"", "&#x200B;", "[removed]", "[deleted]"})


# Every Unicode codepoint for which str.isspace() is true (CPython 3.x
# Unicode database; pinned as a constant so worker processes skip the 1.1M
# codepoint scan at startup — test_functions verifies it against the full
# scan, keeping the bit-for-bit ``c.isspace()`` contract).
_WHITESPACE_CODEPOINTS = (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x85, 0xA0,
    0x1680, 0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
    0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
)


@functools.lru_cache(maxsize=1)
def _whitespace_chars() -> str:
    return "".join(map(chr, _WHITESPACE_CODEPOINTS))


# RE2 character class over EXACTLY the isspace() codepoints, shared by the
# engine's Arrow regex kernels AND the DuckDB oracles (both embed RE2, so
# tokenization is engine-level identical on both sides). The engine uses
# these instead of Arrow's utf8_split_whitespace / utf8_trim_whitespace:
# the Unicode-property kernels were observed returning NONDETERMINISTIC
# results for non-ASCII whitespace (U+00A0 intermittently not treated as a
# split point) inside Ray map workers on this host — same bytes, same
# kernel, different result per call (round-5; caught by
# tests/test_curation_properties.py once non-ASCII whitespace entered the
# Hypothesis strategy). An explicit codepoint class compiled by RE2 has no
# lazy Unicode-table dependency and cannot flake.
_WS_HEX = "".join(f"\\x{{{c:x}}}" for c in _WHITESPACE_CODEPOINTS)
WS_REGEX_CLASS = f"[{_WS_HEX}]"      # one whitespace char
NONWS_RUN_REGEX = f"[^{_WS_HEX}]+"   # one token = maximal non-whitespace run


def _whitespace_chars_full_scan() -> str:
    """The authoritative definition; used only by tests to pin the constant."""
    return "".join(c for c in map(chr, range(sys.maxunicode + 1)) if c.isspace())


@functools.lru_cache(maxsize=1)
def _ws_translate_table() -> dict[int, None]:
    return {ord(c): None for c in _whitespace_chars()}


def canonicalize(s: str) -> str:
    """Remove every isspace() character. C-speed via str.translate."""
    return s.translate(_ws_translate_table())


def canonicalize_oracle(s: str) -> str:
    """Byte-identity oracle: the literal per-char definition, used only in
    tests to pin down `canonicalize` (FIXTURES.md section 3)."""
    return "".join(c for c in s if not c.isspace())


def is_valid_text(s: str | None) -> bool:
    """B2 predicate (database.py:364): usable self-text?"""
    return s is not None and s not in TEXT_SENTINELS


def tokenize(s: str) -> list[str]:
    """Whitespace tokenization, lowercased — the shingling alphabet.

    Runs BEFORE canonicalization (canonical text has no separators left).
    """
    return s.lower().split()


def normalize_url(url: str) -> str:
    """B6 (database.py:467-481): strip the youtube share suffix; generalized
    with fragment strip + lowercased scheme/host."""
    url = url.replace("&feature=youtu.be", "")
    frag = url.find("#")
    if frag >= 0:
        url = url[:frag]
    scheme_end = url.find("://")
    if scheme_end > 0:
        host_end = url.find("/", scheme_end + 3)
        if host_end < 0:
            host_end = len(url)
        url = url[:host_end].lower() + url[host_end:]
    return url
