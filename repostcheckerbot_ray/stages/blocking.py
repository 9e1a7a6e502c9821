"""Stage 2 — dedup + blocking (the shuffles; SURVEY.md §2.D/§4).

Three keyed exchanges, each replacing one of the reference's SQLite lookups:

- **URL identity dedup (D1)** — ``groupby(url)`` keep the min-``warc_ts`` row
  (first-writer-wins, /root/reference/database.py:328-358). Runs on the
  compact fingerprint relation, not raw pages, so the shuffle moves hashes
  and normalized text only.
- **Exact-fingerprint match (D2)** — ``groupby(content_hash)``; every group
  of size > 1 is an exact duplicate set (score 100,
  database.py:366-388 et al.). Emits **star edges** to the min-url member
  instead of all-pairs: same transitive closure, O(n) instead of O(n²) per
  group — this is what makes giant boilerplate groups (the hot-key case)
  safe without salting, because a 10⁶-copy group emits 10⁶−1 edges, not
  5·10¹¹.
- **Candidate generation (D3 blocking)** — the reference's O(N) fuzzy
  full-table scan (database.py:389-405) becomes LSH blocking:
  text modality explodes to one row per MinHash band key; payload modality
  to one row per 8-bit SimHash band (pigeonhole: Hamming < 5 ⇒ some band of
  8 equal); chunked modality to one row per chunk hash (a true F3 match at
  threshold 5 shares ≥ 1 identical frame hash in practice — same recall
  argument as the reference's exact-frame prepass). Oversized fuzzy blocks
  are capped deterministically inside the scorer (see scoring_stage) with a
  metric row recording the drop — never silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.fingerprint import simhash_band_keys_64

PAYLOAD_BANDS = 8

_LIGHT_COLS = ["url", "content_hash", "simhash", "text_len"]


def dedup_by_url(fingerprints_ds):  # noqa: ANN001
    """D1: one row per url — the min-warc_ts row wins (database.py:328-358)."""

    def keep_first(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        return group.sort_by([("warc_ts", "ascending"), ("content_hash", "ascending")]).slice(0, 1)

    return fingerprints_ds.groupby("url").map_groups(keep_first, batch_format="pyarrow")


def exact_star_edges(fingerprints_ds):  # noqa: ANN001
    """D2/F4: groups sharing content_hash -> star edges at score 100."""

    def star(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_edges()
        urls = sorted(group["url"].to_pylist())
        hub = urls[0]
        return pa.table(
            {
                "url_a": pa.array([hub] * (n - 1), pa.string()),
                "url_b": pa.array(urls[1:], pa.string()),
                "score": pa.array([100.0] * (n - 1), pa.float64()),
                "kind": pa.array(["exact"] * (n - 1), pa.string()),
            }
        )

    return fingerprints_ds.groupby("content_hash").map_groups(star, batch_format="pyarrow")


def _empty_edges() -> pa.Table:
    return pa.table(
        {
            "url_a": pa.array([], pa.string()),
            "url_b": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "kind": pa.array([], pa.string()),
        }
    )


def explode_text_bands(fingerprints_ds):  # noqa: ANN001
    """One light row per (minhash band key, doc) for text modality.

    Carries only url/content_hash/simhash/text_len — never text itself —
    so the band shuffle is O(docs × bands × ~50 B), not O(corpus bytes).
    """

    def explode(batch: pa.Table) -> pa.Table:
        mask = np.asarray(batch["modality"].to_numpy(zero_copy_only=False) == "text")
        t = batch.filter(pa.array(mask))
        if t.num_rows == 0:
            return _empty_band_rows()
        bands = t["band_keys"].combine_chunks()
        counts = bands.value_lengths().to_numpy(zero_copy_only=False)
        flat = bands.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.repeat(np.arange(t.num_rows), counts)
        cols = {c: t[c].take(pa.array(idx)) for c in _LIGHT_COLS}
        cols["band_key"] = pa.array(flat, pa.uint64())
        return pa.table(cols)

    return fingerprints_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _empty_band_rows() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "content_hash": pa.array([], pa.string()),
            "simhash": pa.array([], pa.uint64()),
            "text_len": pa.array([], pa.uint32()),
            "band_key": pa.array([], pa.uint64()),
        }
    )


def explode_payload_bands(fingerprints_ds):  # noqa: ANN001
    """One row per (8-bit simhash band, doc) for payload modality.

    band_key folds (band_index, band_bits) so different bit positions never
    collide; payload_hash rides along — verification happens in-group, no
    second lookup needed.
    """

    def explode(batch: pa.Table) -> pa.Table:
        mask = np.asarray(batch["modality"].to_numpy(zero_copy_only=False) == "payload")
        t = batch.filter(pa.array(mask))
        urls, hashes, keys = [], [], []
        for url, ph in zip(t["url"].to_pylist(), t["payload_hash"].to_pylist()):
            for b_idx, b_val in enumerate(simhash_band_keys_64(ph, PAYLOAD_BANDS)):
                urls.append(url)
                hashes.append(ph)
                keys.append((b_idx << 56) | b_val)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "payload_hash": pa.array(hashes, pa.uint64()),
                "band_key": pa.array(keys, pa.uint64()),
            }
        )

    return fingerprints_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def explode_chunk_bands(fingerprints_ds):  # noqa: ANN001
    """One row per (chunk hash, doc) for chunked modality; the full (small)
    chunk list rides along for in-group F3 scoring."""

    def explode(batch: pa.Table) -> pa.Table:
        mask = np.asarray(batch["modality"].to_numpy(zero_copy_only=False) == "chunked")
        t = batch.filter(pa.array(mask))
        urls, lists, keys = [], [], []
        for url, ch in zip(t["url"].to_pylist(), t["chunk_hashes"].to_pylist()):
            uniq = sorted(set(ch))
            for c in uniq:
                urls.append(url)
                lists.append(ch)
                keys.append(c)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "chunk_hashes": pa.array(lists, pa.list_(pa.uint64())),
                "band_key": pa.array(keys, pa.uint64()),
            }
        )

    return fingerprints_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
