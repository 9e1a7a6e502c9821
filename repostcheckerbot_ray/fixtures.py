"""Deterministic synthetic web-page corpus generator (FIXTURES.md contract).

Produces the three tables the tests and benchmarks run on:

- ``pages(url, warc_ts, html, text, lang)`` — the input-hint schema;
- ``labeled_pairs(url_a, url_b, is_duplicate, kind)`` — ground truth for the
  pairwise-F1 >= 0.99 gate;
- ``extraction_oracle(url, text_norm)`` — expected canonical text per url
  (byte-identity gate: pipeline output must equal this at any batch size /
  parallelism level).

Document families per FIXTURES.md section 1: original, exact repost,
whitespace repost, near repost (1-3 token substitutions), payload repost
(.png url, binary payload within Hamming threshold), chunked/gif repost
(frame-list payload, F3 path), url-fallback rows, hard negatives (shared
10-token prefix, ratio < 0.5 — must be *rejected* by the scorer), a
hot-band family (one boilerplate text repeated many times — exercises
exact-group capping / hot-band salting), TTL-expired rows, and exact-URL
duplicate rows (D1 dedup). Seeded; no wall clock; no external data.
"""

from __future__ import annotations

import itertools
import os
import random
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.extract import extract_text
from .functions.fingerprint import payload_hash64
from .functions.scoring import hamming64, seq_ratio
from .functions.textnorm import canonicalize, is_valid_text

EPOCH_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

def _make_html(text: str) -> bytes:
    # script/style bodies are decoys: if extraction fails to strip them the
    # canonical text changes and the exact-match / byte-identity tests fail.
    return (
        "<html><head><title></title><style>p{color:#333;margin:0}</style></head>"
        "<body><p>" + text + "</p><script>var tracked = {\"x\": 1};</script></body></html>"
    ).encode("utf-8")


@dataclass
class FixtureSpec:
    seed: int = 42
    n_text_families: int = 40       # each: original + exact + whitespace + near
    n_payload_families: int = 12    # each: original + bitflip repost
    n_chunked_families: int = 8     # each: original + frame-edit repost
    n_imagetext_families: int = 6   # same embedded text, payloads far apart
    n_negatives: int = 120          # unrelated singleton docs
    n_hard_negative_pairs: int = 12  # shared prefix, must NOT match
    hot_band_copies: int = 50       # boilerplate exact copies (hot key)
    n_ttl_expired: int = 6
    n_url_dups: int = 4             # extra rows duplicating an existing url
    n_url_fallback: int = 6         # no text, no payload url -> url modality
    langs: tuple = ("en", "de", "fr", "es")
    lo_tokens: int = 50     # doc length range; bench uses longer, more
    hi_tokens: int = 300    # Common-Crawl-like pages
    # fast=True skips the per-edit SequenceMatcher verification during
    # generation (bench-scale corpora; 1-3 substitutions of a 50-300 token
    # doc are provably within the ratio threshold anyway) and emits no
    # within-family labeled pairs for the O(n²) hot family.
    fast: bool = False


@dataclass
class Fixture:
    pages: pa.Table
    labeled_pairs: pa.Table
    extraction_oracle: pa.Table
    spec: FixtureSpec = field(default_factory=FixtureSpec)


def _vocab(rng: random.Random, n: int = 600) -> list[str]:
    cons, vow = "bcdfghjklmnpqrstvwz", "aeiou"
    words = set()
    while len(words) < n:
        w = "".join(
            rng.choice(cons) + rng.choice(vow) for _ in range(rng.randint(2, 5))
        )
        words.add(w)
    return sorted(words)


# keyed by (first word, length) + identity check — id() alone can collide
# when a GC'd list's address is reused by a different vocab
_VOCAB_ARR: dict[tuple, tuple] = {}


def _text(rng: random.Random, vocab: list[str], lo: int = 50, hi: int = 300) -> str:
    """Seeded doc text; numpy-vectorized (the generator is called ~1M times
    for bench corpora — per-token random.choice would dominate)."""
    key = (vocab[0], len(vocab))
    hit = _VOCAB_ARR.get(key)
    if hit is None or hit[0] is not vocab:
        arr = np.array(vocab, dtype=object)
        _VOCAB_ARR[key] = (vocab, arr)  # holds the list ref -> id stays live
    else:
        arr = hit[1]
    r = np.random.RandomState(rng.getrandbits(31))
    n = r.randint(lo, hi + 1)
    return " ".join(arr[r.randint(0, len(arr), n)])


def _whitespace_jitter(rng: random.Random, text: str) -> str:
    toks = text.split(" ")
    seps = [rng.choice(["  ", " \n", "\t ", " ", "\r\n ", "  "]) for _ in toks[:-1]]
    return "".join(t + s for t, s in zip(toks, seps)) + toks[-1]


def _near_edit(rng: random.Random, vocab: list[str], text: str, fast: bool = False) -> str:
    """1-3 token substitutions; retried until SequenceMatcher ratio on the
    canonical forms stays above the match threshold (ratio > 0.5 with lots of
    margin) — FIXTURES.md 'near repost'. fast=True trusts the construction
    (≤3 of ≥50 tokens changed → ratio ≥ ~0.9) and skips the O(len²) check."""
    toks = text.split(" ")
    for _ in range(20):
        cand = list(toks)
        for pos in rng.sample(range(len(cand)), k=rng.randint(1, 3)):
            cand[pos] = rng.choice(vocab)
        out = " ".join(cand)
        if fast or seq_ratio(canonicalize(text), canonicalize(out)) > 0.8:
            return out
    return text  # degenerate fallback; still a valid (exact) duplicate


def _payload(rng: random.Random, n: int = 2048) -> bytes:
    return np.random.RandomState(rng.getrandbits(31)).bytes(n)


def _payload_variant(rng: random.Random, data: bytes, max_hamming: int = 4) -> bytes:
    """Flip a few bytes until the 64-bit payload hash stays within
    max_hamming bits (FIXTURES.md 'payload repost': < threshold)."""
    base_h = payload_hash64(data)
    for n_flips in (1, 1, 2, 2, 3):
        arr = bytearray(data)
        for _ in range(n_flips):
            i = rng.randrange(len(arr))
            arr[i] ^= 1 << rng.randrange(8)
        cand = bytes(arr)
        if 0 < hamming64(payload_hash64(cand), base_h) <= max_hamming:
            return cand
    return data  # exact copy fallback (still a duplicate, via exact path)


def _chunked_payload(rng: random.Random, n_frames: int = 8, frame: int = 256) -> bytes:
    return _payload(rng, n_frames * frame)


def _chunked_variant(rng: random.Random, data: bytes, frame: int = 256) -> bytes:
    """Replace one full frame with random bytes: F3 min-mean distance =
    (64-ish)/n_frames — well under threshold 5 for >= 16 frames... the
    reference averages per-original-frame minima, so one changed frame out
    of n contributes ~32/n; with n=8 frames that is ~4 < 5."""
    arr = bytearray(data)
    n_frames = len(data) // frame
    victim = rng.randrange(n_frames)
    for i in range(victim * frame, (victim + 1) * frame):
        arr[i] = rng.getrandbits(8)
    return bytes(arr)


def generate(spec: FixtureSpec | None = None) -> Fixture:
    spec = spec or FixtureSpec()
    rng = random.Random(spec.seed)
    vocab = _vocab(rng)

    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str] = []
    pos_pairs: list[tuple[str, str, str]] = []   # (a, b, kind), a<b
    neg_pairs: list[tuple[str, str, str]] = []

    t_counter = itertools.count()

    def add_row(url: str, text: str | None, html: bytes | None, lang: str, ts_us: int | None = None) -> str:
        urls.append(url)
        ts.append(ts_us if ts_us is not None else EPOCH_BASE_US + next(t_counter) * 60_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        return url

    def family_pairs(members: list[str], kind: str) -> None:
        for a, b in itertools.combinations(sorted(members), 2):
            pos_pairs.append((a, b, kind))

    # --- text families: original + exact + whitespace + near -------------
    for f in range(spec.n_text_families):
        lang = spec.langs[f % len(spec.langs)]
        base = _text(rng, vocab, spec.lo_tokens, spec.hi_tokens)
        members = []
        u0 = add_row(f"https://sitet{f}.example/orig", base, _make_html(base), lang)
        members.append(u0)
        # exact repost: identical text+html, different url, later ts
        members.append(add_row(f"https://sitet{f}.example/exact", base, _make_html(base), lang))
        # whitespace repost: null text column -> must be extracted from html
        wj = _whitespace_jitter(rng, base)
        members.append(add_row(f"https://sitet{f}.example/ws", None, _make_html(wj), lang))
        # near repost: 1-3 token substitutions, via text column
        ne = _near_edit(rng, vocab, base, fast=spec.fast)
        members.append(add_row(f"https://sitet{f}.example/near", ne, _make_html(ne), lang))
        family_pairs(members, "text")

    # --- payload families (.png url -> payload modality) -----------------
    for f in range(spec.n_payload_families):
        data = _payload(rng)
        u0 = add_row(f"https://sitep{f}.example/img-orig.png", None, data, "en")
        var = _payload_variant(rng, data)
        u1 = add_row(f"https://sitep{f}.example/img-repost.png", None, var, "en")
        family_pairs([u0, u1], "payload")

    # --- imagetext families (.png url, SAME embedded text, payload hashes
    # far apart): linked only via the ImageText dual channel — the
    # reference fingerprints an image post's OCR text in addition to its
    # dhash and matches on it (database.py:748-751, 631-647) -------------
    for f in range(spec.n_imagetext_families):
        txt = _text(rng, vocab, spec.lo_tokens, spec.hi_tokens)

        def _it_html(blob_seed: int) -> bytes:
            blob = np.random.RandomState(blob_seed).bytes(1024).hex()
            return ("<html><body><p>" + txt + "</p><!-- " + blob
                    + " --></body></html>").encode("utf-8")

        h0 = _it_html(rng.getrandbits(31))
        for _ in range(20):
            h1 = _it_html(rng.getrandbits(31))
            if spec.fast or hamming64(payload_hash64(h0), payload_hash64(h1)) > 8:
                break
        u0 = add_row(f"https://siteit{f}.example/a.png", None, h0, "en")
        u1 = add_row(f"https://siteit{f}.example/b.png", None, h1, "en")
        family_pairs([u0, u1], "imagetext")

    # --- chunked families (.gif url -> frame-list modality) --------------
    for f in range(spec.n_chunked_families):
        data = _chunked_payload(rng)
        u0 = add_row(f"https://siteg{f}.example/anim-orig.gif", None, data, "en")
        var = _chunked_variant(rng, data)
        u1 = add_row(f"https://siteg{f}.example/anim-repost.gif", None, var, "en")
        family_pairs([u0, u1], "chunked")

    # --- negatives (singletons) ------------------------------------------
    neg_urls = []
    for f in range(spec.n_negatives):
        t = _text(rng, vocab, spec.lo_tokens, spec.hi_tokens)
        neg_urls.append(
            add_row(f"https://siten{f}.example/doc", t if f % 3 else None, _make_html(t), spec.langs[f % 4])
        )
    for i in range(0, len(neg_urls) - 1, 7):
        a, b = sorted((neg_urls[i], neg_urls[i + 1]))
        neg_pairs.append((a, b, "negative"))

    # --- hard negatives: shared 10-token prefix, divergent tails ---------
    for f in range(spec.n_hard_negative_pairs):
        prefix = _text(rng, vocab, 10, 10)
        a_txt = prefix + " " + _text(rng, vocab, 60, 90)
        b_txt = prefix + " " + _text(rng, vocab, 60, 90)
        if not spec.fast:
            assert seq_ratio(canonicalize(a_txt), canonicalize(b_txt)) < 0.5
        ua = add_row(f"https://siteh{f}.example/a", a_txt, _make_html(a_txt), "en")
        ub = add_row(f"https://siteh{f}.example/b", b_txt, _make_html(b_txt), "en")
        a, b = sorted((ua, ub))
        neg_pairs.append((a, b, "hard_negative"))

    # --- hot band: boilerplate repeated N times (hot blocking key) -------
    boiler = _text(rng, vocab, 80, 80)
    hot_members = [
        add_row(f"https://sitehot.example/copy{i}", boiler, _make_html(boiler), "en")
        for i in range(spec.hot_band_copies)
    ]
    if not spec.fast:  # O(n²) label rows; bench corpora skip them
        family_pairs(hot_members, "hot_exact")

    # --- TTL-expired rows (old warc_ts; singletons) ----------------------
    for f in range(spec.n_ttl_expired):
        t = _text(rng, vocab)
        add_row(
            f"https://siteold{f}.example/doc", t, _make_html(t), "en",
            ts_us=EPOCH_BASE_US - (400 + f) * 86_400_000_000,  # >400 days before base
        )

    # --- url-modality fallback rows (no text, unparseable-as-text html) --
    for f in range(spec.n_url_fallback):
        add_row(f"https://siteu{f}.example/thing", None, b"", "en")

    # --- exact-URL duplicate rows (D1: keep min warc_ts) -----------------
    for f in range(spec.n_url_dups):
        src = f * 13 % len(urls)
        add_row(urls[src], texts[src], htmls[src], langs[src])

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )

    pairs = sorted(set((a, b, True, k) for a, b, k in pos_pairs)) + sorted(
        set((a, b, False, k) for a, b, k in neg_pairs)
    )
    labeled = pa.table(
        {
            "url_a": pa.array([p[0] for p in pairs]),
            "url_b": pa.array([p[1] for p in pairs]),
            "is_duplicate": pa.array([p[2] for p in pairs]),
            "kind": pa.array([p[3] for p in pairs]),
        }
    )

    if spec.fast:  # oracle costs one extract per row; bench corpora skip it
        oracle = pa.table({"url": pa.array([], pa.string()),
                           "text_norm": pa.array([], pa.string())})
    else:
        oracle = _build_oracle(urls, ts, texts, htmls)
    return Fixture(pages=pages, labeled_pairs=labeled, extraction_oracle=oracle, spec=spec)


def _build_oracle(urls, ts, texts, htmls) -> pa.Table:  # noqa: ANN001
    """Expected canonical text per surviving url (pure-Python oracle,
    FIXTURES.md section 3): D1 keeps the min-warc_ts row per url; text rule =
    canonicalize(text if valid else extract_text(html))."""
    best: dict[str, tuple[int, str]] = {}
    for url, t_us, text, html in zip(urls, ts, texts, htmls):
        norm = canonicalize(text) if is_valid_text(text) else canonicalize(extract_text(html))
        cur = best.get(url)
        if cur is None or t_us < cur[0]:
            best[url] = (t_us, norm)
    items = sorted(best.items())
    return pa.table(
        {
            "url": pa.array([k for k, _ in items]),
            "text_norm": pa.array([v[1] for _, v in items]),
        }
    )


def write_fixture(out_dir: str, spec: FixtureSpec | None = None, shards: int = 4) -> Fixture:
    """Write pages (sharded — shards are the checkpoint/resume partition
    unit), labeled_pairs and extraction_oracle under out_dir."""
    fx = generate(spec)
    os.makedirs(f"{out_dir}/pages", exist_ok=True)
    n = fx.pages.num_rows
    per = (n + shards - 1) // shards
    for s in range(shards):
        part = fx.pages.slice(s * per, per)
        if part.num_rows:
            pq.write_table(part, f"{out_dir}/pages/part-{s:05d}.parquet")
    pq.write_table(fx.labeled_pairs, f"{out_dir}/labeled_pairs.parquet")
    pq.write_table(fx.extraction_oracle, f"{out_dir}/extraction_oracle.parquet")
    return fx


def bench_spec(scale: int = 1, seed: int = 42) -> FixtureSpec:
    """Scaled-up spec for benchmarks (same generator, same seed discipline).
    ~3.9k pages per unit of scale."""
    return FixtureSpec(
        seed=seed,
        n_text_families=400 * scale,
        n_payload_families=60 * scale,
        n_chunked_families=30 * scale,
        n_imagetext_families=20 * scale,
        n_negatives=2000 * scale,
        n_hard_negative_pairs=60 * scale,
        hot_band_copies=200,
        n_ttl_expired=20,
        n_url_dups=40,
        n_url_fallback=20,
        lo_tokens=100,
        hi_tokens=500,
        fast=True,
    )
