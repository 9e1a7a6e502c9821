"""Text-analysis primitives for large-scale training-data pipelines
(language-ID, quality scoring, token counting, document fingerprinting).

These extend the reference's capability set (which only fingerprints and
matches) with the standard corpus-curation operators; each is exposed as a
Ray stage in stages/textops.py and a `queries()` entry in __ray_entry__.py.
Pure functions here — no Ray.
"""

from __future__ import annotations

import re

import numpy as np

from .fingerprint import _MASK64, U64, splitmix64, token_hash_array

# Tiny seeded stopword profiles for n-gram/stopword language ID. Heuristic
# by design (no models in this environment); deterministic.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that for on with as are".split()),
    "de": frozenset("der die das und ist nicht ich du mit von zu den ein eine".split()),
    "fr": frozenset("le la les et de des un une est pas je vous dans pour".split()),
    "es": frozenset("el la los las y de que un una es no en por para con".split()),
}

# \s is deliberately ASCII (re.ASCII) so the Python definition, Arrow's
# pc.count_substring_regex and DuckDB's regexp_extract_all (both RE2, where
# \s is ASCII-only) agree byte-for-byte on any input, incl. Unicode spaces.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"
_BPEISH_RE = re.compile(BPEISH_PATTERN, re.ASCII)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_STOP_EN = LANG_PROFILES["en"]


def lang_id(tokens: list[str]) -> tuple[str, float]:
    """(language, confidence) by stopword-profile overlap; 'und' when no
    profile scores (confidence = margin of best over total hits)."""
    if not tokens:
        return "und", 0.0
    hits = {lang: sum(1 for t in tokens if t in prof) for lang, prof in LANG_PROFILES.items()}
    total = sum(hits.values())
    if total == 0:
        return "und", 0.0
    best = max(hits, key=lambda k: (hits[k], k))
    return best, hits[best] / total


def token_count_whitespace(text: str) -> int:
    return len(text.split())


def token_count_bpeish(text: str) -> int:
    """BPE-ish pre-tokenizer count: alpha runs, digit runs, single symbols."""
    return len(_BPEISH_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword quality signals (per-doc)."""
    n_chars = len(text)
    toks = text.lower().split()
    n_tokens = len(toks)
    n_punct = len(_PUNCT_RE.findall(text))
    n_stop = sum(1 for t in toks if t in _STOP_EN)
    mean_tok = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    uniq_ratio = (len(set(toks)) / n_tokens) if n_tokens else 0.0
    return {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "n_punct": float(n_punct),
        "n_stopwords": float(n_stop),
        "mean_token_len": mean_tok,
        "unique_token_ratio": uniq_ratio,
    }


def quality_score(f: dict[str, float]) -> float:
    """Scalar [0,1] quality score from features (monotone, deterministic)."""
    if f["n_tokens"] == 0:
        return 0.0
    length_ok = min(f["n_tokens"] / 50.0, 1.0)
    punct_ok = 1.0 / (1.0 + f["n_punct"] / max(f["n_tokens"], 1.0))
    diversity = f["unique_token_ratio"]
    return round(0.4 * length_ok + 0.3 * punct_ok + 0.3 * diversity, 6)


def doc_fingerprint(text: str) -> int:
    """64-bit rolling-hash document fingerprint over the token stream
    (order-sensitive, whitespace-insensitive)."""
    toks = text.lower().split()
    if not toks:
        return 0
    th = token_hash_array(toks)
    acc = U64(len(toks))
    m = U64(0x100000001B3)  # FNV-ish odd multiplier
    for v in th:
        acc = (acc * m + v) & _MASK64
    return int(splitmix64(np.array([acc], dtype=np.uint64))[0])
