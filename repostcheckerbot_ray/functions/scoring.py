"""Pairwise similarity scoring — the semantics to preserve (SURVEY.md 2.F).

F1  text        : difflib.SequenceMatcher(None, a, b).ratio(); match iff
                  10 - ratio*10 < thresh; pct = ratio*100
                  (/root/reference/database.py:395-405, 637-647)
F2  payload     : Hamming distance on 64-bit fingerprints; match iff
                  d < thresh; pct = (thresh - d)/thresh*100
                  (/root/reference/database.py:592-603)
F3  chunk lists : for each original chunk, min Hamming vs all probe chunks,
                  then mean; same threshold/pct as F2
                  (/root/reference/database.py:215-227, 449-460)
F4  exact       : fingerprint equality -> pct = 100
                  (/root/reference/database.py:371-388)

difflib is stdlib, so F1 reproduces the reference's ratio values exactly.
Default threshold 5 (/root/reference/config.py:17).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np

DEFAULT_THRESHOLD = 5.0

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def seq_ratio(a: str, b: str) -> float:
    """F1 core: exact SequenceMatcher ratio (same values as the reference)."""
    return SequenceMatcher(None, a, b).ratio()


def text_match(ratio: float, thresh: float = DEFAULT_THRESHOLD) -> bool:
    """Reference predicate: `10 - ratio*10 < thresh` (database.py:396)."""
    return 10.0 - ratio * 10.0 < thresh


def seq_score_or_none(ta: str, tb: str, thresh: float = DEFAULT_THRESHOLD) -> float | None:
    """F1 in one call: pct (ratio*100) when the pair matches, else None.

    Prunes with ``quick_ratio()`` first — an O(n) UPPER bound on ``ratio()``
    (difflib contract), so a pair whose bound already fails the threshold
    cannot match and skipping the O(n²) ratio() there is exact."""
    sm = SequenceMatcher(None, ta, tb)
    if not text_match(sm.quick_ratio(), thresh):
        return None
    r = sm.ratio()
    return text_pct(r) if text_match(r, thresh) else None


def text_pct(ratio: float) -> float:
    return ratio * 100.0


def ratio_upper_bound(len_a: int, len_b: int) -> float:
    """SequenceMatcher.ratio() <= 2*min(la,lb)/(la+lb) (its real_quick_ratio
    bound) — an exact prefilter: pairs whose bound already fails the
    threshold cannot match, so skipping them loses zero recall."""
    if len_a + len_b == 0:
        return 1.0
    return 2.0 * min(len_a, len_b) / (len_a + len_b)


def hamming64(a: int, b: int) -> int:
    """F2 core: bit difference of two 64-bit fingerprints."""
    return int(a ^ b).bit_count()


def popcount64(x: np.ndarray) -> np.ndarray:
    """Elementwise popcount of a uint64 array (bytewise table lookup)."""
    by = x.view(np.uint8).reshape(len(x), 8)
    return _POP8[by].sum(axis=1, dtype=np.uint16)


def hamming64_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(len(a), len(b)) uint16 Hamming matrix for uint64 arrays, vectorized
    (XOR then bytewise popcount lookup)."""
    x = np.bitwise_xor(a[:, None], b[None, :])
    by = x.view(np.uint8).reshape(len(a), len(b), 8)
    return _POP8[by].sum(axis=2, dtype=np.uint16)


def hamming_match(distance: float, thresh: float = DEFAULT_THRESHOLD) -> bool:
    """Reference predicate: `d < thresh` (database.py:594)."""
    return distance < thresh


def hamming_pct(distance: float, thresh: float = DEFAULT_THRESHOLD) -> float:
    """Reference pct: `(thresh - d)/thresh*100` (database.py:600)."""
    return (thresh - distance) / thresh * 100.0


def chunk_list_distance(a: np.ndarray, b: np.ndarray) -> float:
    """F3/E2: mean over a-chunks of (min Hamming vs all b-chunks) —
    the reference's hash_vid_difference (database.py:215-227), batch form."""
    if len(a) == 0 or len(b) == 0:
        return 64.0
    return float(hamming64_matrix(a, b).min(axis=1).mean())


def jaccard(tokens_a: set, tokens_b: set) -> float:
    """Exact Jaccard on sets (LSH verification step)."""
    if not tokens_a and not tokens_b:
        return 1.0
    inter = len(tokens_a & tokens_b)
    union = len(tokens_a) + len(tokens_b) - inter
    return inter / union if union else 0.0
