"""Stage 1 — fingerprint extraction (the reference's add_post dispatch, batch form).

One ``map_batches`` actor-pool pass over the pages table produces the compact
*fingerprint relation* every later stage runs on; the heavy ``html`` payload
is dropped here, so all downstream shuffles move only hashes + normalized
text, never raw pages.

Reference parity (SURVEY.md §2.B/2.C):

- modality dispatch B1 (/root/reference/database.py:727-753): usable text →
  "text"; gif-url B4 → "chunked" (per-frame hash list ≙ hash_gif/hash_vid,
  database.py:134-212); png/jpg-url B5 → "payload" (single 64-bit hash ≙
  hash_img, database.py:70-108); else extractable html text → "text"; else
  → "url" (raw-link fallback, database.py:747-753).
- text validity B2 (database.py:364): sentinels '&#x200B;', '', '[removed]',
  '[deleted]'.
- canonicalization B7 (database.py:45-46, 126): strip every isspace() char.
  ``text_norm`` is computed for EVERY row by the fixed rule
  ``canonicalize(text if valid else extract_text(html))`` — the per-row
  byte-identity invariant the north rule pins (any batch size, any
  parallelism: pure per-row function, no shared mutable state).

Scale notes: the actor pool amortizes parser construction and the
token-hash cache across batches (``__init__`` once per actor); per-batch
work is a Python loop over rows only where the kernel is inherently
per-string (HTML parse, tokenize); minhash/simhash inner math is numpy.
``part = hash64(url) % num_parts`` is the checkpoint/resume partition key.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.extract import ReusableExtractor
from ..functions.fingerprint import (
    NUM_BANDS,
    chunk_hashes,
    fingerprint_text_many,
    payload_hash64,
)
from ..functions.textnorm import canonicalize, is_valid_text, normalize_url, tokenize

FINGERPRINT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        # B11 provenance tag (≙ the reference's Location column: which scan
        # found the post, top/hot/new — /root/reference/database.py:754-759).
        # Comes from the input's `source` column when present, else the
        # run's source_tag literal.
        ("source", pa.string()),
        ("modality", pa.string()),
        ("text_norm", pa.string()),
        ("text_len", pa.uint32()),
        ("n_tokens", pa.uint32()),
        ("content_hash", pa.string()),  # hex sha256 — the exact-match key (D2)
        # 64-bit fold of content_hash (first 16 hex chars), computed ONCE at
        # fingerprint time so the per-run edge explode never re-parses hex
        ("chash64", pa.uint64()),
        ("simhash", pa.uint64()),
        ("band_keys", pa.list_(pa.uint64())),  # NUM_BANDS MinHash-LSH keys ("text" only)
        ("payload_hash", pa.uint64()),
        ("chunk_hashes", pa.list_(pa.uint64())),
        ("part", pa.int32()),
    ]
)


def _is_gif_url(url: str) -> bool:
    """B4 (database.py:496, 736)."""
    return "gif" in url and not (url.endswith("gifv") or "gifs" in url)


def _is_img_url(url: str) -> bool:
    """B5 (database.py:551, 742)."""
    return "png" in url or "jpg" in url


class FingerprintBatcher:
    """Warmed actor: HTML parser + token-hash cache built once per actor."""

    def __init__(self, num_parts: int = 16, source_tag: str = "new",
                 text_in_image: bool = True) -> None:
        from ..pipelines import _pin_arrow_threads

        _pin_arrow_threads()
        self._extractor = ReusableExtractor()
        self._tok_cache: dict[str, int] = {}
        self._num_parts = num_parts
        self._source_tag = source_tag
        # ≙ sub_settings[8] BOT_TEXT_IN_IMAGE (/root/reference/config.py:18):
        # when False, image/gif posts are matched on payload hashes ONLY —
        # their extracted text never enters the text band/simhash channel
        self._text_in_image = text_in_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        htmls = batch["html"].to_pylist()
        ts = batch["warc_ts"]
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
        if "source" in batch.column_names:
            sources = batch["source"]
        else:
            sources = pa.array([self._source_tag] * len(urls), pa.string())

        n = len(urls)
        modality = [""] * n
        text_norm = [""] * n
        text_len = np.zeros(n, dtype=np.uint32)
        n_tokens = np.zeros(n, dtype=np.uint32)
        content_hash = [""] * n
        ch64 = np.zeros(n, dtype=np.uint64)
        simhash = np.zeros(n, dtype=np.uint64)
        payload_hash = np.zeros(n, dtype=np.uint64)
        chashes: list[list[int]] = [[] for _ in range(n)]

        # text channel — for "text" docs AND for payload/chunked docs with
        # extractable text (the reference's ImageText secondary channel:
        # image posts are ALSO fingerprinted and matched on their OCR'd
        # text, database.py:748-751, 631-647). Two images with identical
        # embedded text but distant payload hashes still pair via these
        # bands. Token lists are collected here and fingerprinted in ONE
        # batched numpy pass below (fingerprint_text_many — bit-identical
        # to the per-doc chain, pinned by test_functions).
        text_rows: list[int] = []
        token_lists: list[list[str]] = []

        # url→part in ONE vectorized pass (stages.pair_join.str_hash64 — the
        # engine's single string partition hash; was per-row blake2b)
        from .pair_join import str_hash64

        part = (str_hash64(urls) % np.uint64(self._num_parts)).astype(np.int32)

        for i in range(n):
            url, text, html = urls[i], texts[i], htmls[i]
            valid = is_valid_text(text)
            raw = text if valid else self._extractor.extract(html)
            tn = canonicalize(raw)
            text_norm[i] = tn
            text_len[i] = len(tn)

            if valid:
                mod = "text"
            elif _is_gif_url(url):
                mod = "chunked"
            elif _is_img_url(url):
                mod = "payload"
            elif tn:
                mod = "text"
            else:
                mod = "url"
            modality[i] = mod

            if mod == "text":
                content_hash[i] = hashlib.sha256(tn.encode("utf-8")).hexdigest()
            elif mod == "chunked":
                data = bytes(html) if html is not None else b""
                chashes[i] = [int(c) for c in chunk_hashes(data)]
                content_hash[i] = hashlib.sha256(data).hexdigest()
            elif mod == "payload":
                data = bytes(html) if html is not None else b""
                payload_hash[i] = payload_hash64(data)
                content_hash[i] = hashlib.sha256(data).hexdigest()
            else:  # url fallback: exact-match only (database.py:747-753)
                content_hash[i] = hashlib.sha256(
                    ("url:" + normalize_url(url)).encode("utf-8")
                ).hexdigest()

            ch64[i] = int(content_hash[i][:16], 16)

            if tn and (mod == "text"
                       or (self._text_in_image
                           and mod in ("payload", "chunked"))):
                text_rows.append(i)
                token_lists.append(tokenize(raw))

        # batched text fingerprints + zero-copy list<u64> band-key column
        bk_offsets = np.zeros(n + 1, dtype=np.int32)
        if text_rows:
            rows = np.asarray(text_rows, dtype=np.int64)
            lens, sims, bks = fingerprint_text_many(token_lists, self._tok_cache)
            n_tokens[rows] = lens.astype(np.uint32)
            simhash[rows] = sims
            has_bk = np.zeros(n, dtype=np.int32)
            has_bk[rows] = NUM_BANDS
            np.cumsum(has_bk, out=bk_offsets[1:])
            bk_values = pa.array(bks.ravel(), pa.uint64())
        else:
            bk_values = pa.array([], pa.uint64())
        band_col = pa.ListArray.from_arrays(pa.array(bk_offsets, pa.int32()), bk_values)

        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts,
                "lang": pa.array(langs, pa.string()),
                "source": sources,
                "modality": pa.array(modality, pa.string()),
                "text_norm": pa.array(text_norm, pa.string()),
                "text_len": pa.array(text_len),
                "n_tokens": pa.array(n_tokens),
                "content_hash": pa.array(content_hash, pa.string()),
                "chash64": pa.array(ch64),
                "simhash": pa.array(simhash),
                "band_keys": band_col,
                "payload_hash": pa.array(payload_hash),
                "chunk_hashes": pa.array(chashes, pa.list_(pa.uint64())),
                "part": pa.array(part),
            },
            schema=FINGERPRINT_SCHEMA,
        )


def fingerprint_dataset(pages_ds, *, num_parts: int = 16, batch_size: int = 512,
                        concurrency=4, num_cpus: float = 1.0):  # noqa: ANN001
    """pages Dataset -> fingerprint Dataset (map-only; html dropped here)."""
    return pages_ds.map_batches(
        FingerprintBatcher,
        fn_constructor_kwargs={"num_parts": num_parts},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
