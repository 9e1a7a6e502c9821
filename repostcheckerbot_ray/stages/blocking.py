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


# --------------------------------------------------------------------------
# Unified block-row relation: ALL modalities share ONE keyed exchange.
#
# Each fingerprint row explodes to light rows (url, kind, band_key, carried
# verification fields); band_key is kind-salted so the four key spaces can
# never collide, and a single groupby(band_key) feeds a per-kind dispatcher
# scorer (scoring_stage.make_unified_scorer). This folds what would be four
# all-to-all shuffles (exact D2 / text D3 / payload F2 / chunked F3) into
# one — at cluster scale the number of exchanges dominates, not per-row math.
# --------------------------------------------------------------------------

from ..functions.fingerprint import splitmix64 as _splitmix64  # noqa: E402

_KIND_SALT = {
    "e": np.uint64(0xE0E0E0E0E0E0E0E0),
    "t": np.uint64(0x7171717171717171),
    "p": np.uint64(0x9A9A9A9A9A9A9A9A),
    "c": np.uint64(0xC5C5C5C5C5C5C5C5),
}

BLOCK_ROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("kind", pa.string()),
        ("band_key", pa.uint64()),
        ("content_hash", pa.string()),   # full hash — "e" rows only
        ("chash64", pa.uint64()),        # 64-bit fold — dedup key on "t" rows
        ("simhash", pa.uint64()),
        ("text_len", pa.uint32()),
        ("payload_hash", pa.uint64()),
        ("chunk_hashes", pa.list_(pa.uint64())),
        # delta runs: False = persisted-history row. A band run with no new
        # member is SKIPPED by the scorer (its pairs already exist in the
        # history edge relation) — delta cost ∝ delta + touched blocks,
        # not corpus (reference resolves only the new post, app.py:147-158).
        ("is_new", pa.bool_()),
        ("part", pa.int32()),
    ]
)


def _salted(kind: str, value: int) -> int:
    return int(_splitmix64(np.array([np.uint64(value) ^ _KIND_SALT[kind]],
                                    dtype=np.uint64))[0])


def explode_block_rows(fingerprints_ds, num_parts: int = 16,
                       keep_keys_ref=None):  # noqa: ANN001
    """fingerprints -> unified light block rows (single pass, no shuffle).

    Carries ``part = band_key % num_parts``: the edge stage groups by PART
    (few, large groups) and scans sorted band-key runs inside each part —
    grouping by raw band_key would mean millions of mostly-singleton groups
    whose per-group dispatch overhead dwarfs the real work.

    Vectorized: the dominant text-band explosion (NUM_BANDS rows per doc) is
    a numpy repeat/take; the per-kind salting is one splitmix64 pass per
    sub-table.

    ``keep_keys_ref`` (delta runs): ray.put ref to a SORTED uint64 array of
    salted band keys the delta touches. History rows (is_new=False) whose
    key misses the set are dropped BEFORE their Arrow rows are built —
    fusing the delta band prune into the explode, so a 100-TB history never
    materializes its untouched band rows even transiently (was: explode
    everything, filter in a second map). New rows always pass.
    """

    def salted_vec(kind: str, vals: np.ndarray) -> np.ndarray:
        return _splitmix64(vals.astype(np.uint64) ^ _KIND_SALT[kind])

    def _subtable(urls, kind, band, ch=None, ch64=None, sim=None, tl=None, ph=None, ck=None, new=None):  # noqa: ANN001
        n = len(band)
        return pa.table(
            {
                "url": urls,
                "kind": pa.array([kind] * n, pa.string()),
                "band_key": pa.array(band),
                "content_hash": ch if ch is not None else pa.array([""] * n, pa.string()),
                "chash64": pa.array(ch64 if ch64 is not None else np.zeros(n, np.uint64)),
                "simhash": pa.array(sim if sim is not None else np.zeros(n, np.uint64)),
                "text_len": pa.array(tl if tl is not None else np.zeros(n, np.uint32)),
                "payload_hash": pa.array(ph if ph is not None else np.zeros(n, np.uint64)),
                "chunk_hashes": ck if ck is not None else pa.array([[]] * n, pa.list_(pa.uint64())),
                "is_new": pa.array(new if new is not None else np.ones(n, bool)),
                "part": pa.array((band % np.uint64(num_parts)).astype(np.int32)),
            },
            schema=BLOCK_ROW_SCHEMA,
        )

    def explode(batch: pa.Table) -> pa.Table:
        mods = np.asarray(batch["modality"].to_numpy(zero_copy_only=False))
        isnew_all = (batch["is_new"].to_numpy(zero_copy_only=False)
                     if "is_new" in batch.column_names
                     else np.ones(batch.num_rows, dtype=bool))
        keep_keys = None
        if keep_keys_ref is not None:
            if isinstance(keep_keys_ref, np.ndarray):  # tests / local
                keep_keys = keep_keys_ref
            else:
                import ray

                keep_keys = ray.get(keep_keys_ref)

        def row_mask(band: np.ndarray, new: np.ndarray):
            """Rows to keep: new always; history only on a key hit.
            searchsorted membership — O(n log m), no re-sort of the
            broadcast set (np.isin sorts both sides per call)."""
            if keep_keys is None or bool(new.all()):
                return None  # keep everything
            if len(keep_keys) == 0:
                return new
            pos = np.searchsorted(keep_keys, band)
            pos[pos == len(keep_keys)] = 0
            return new | (keep_keys[pos] == band)

        out = []

        # exact rows — every doc; key folds the hash's first 16 hex chars
        # (equality re-checked inside the group, so a collision only costs a
        # wasted compare). The fold is stored in the fingerprint schema at
        # fingerprint time (computed once per doc EVER); the hex re-parse
        # below only covers pre-chash64 relations (generic callers).
        if "chash64" in batch.column_names:
            ch64_all = (batch["chash64"].to_numpy(zero_copy_only=False)
                        .astype(np.uint64))
        else:
            chl = batch["content_hash"].to_pylist()
            ch64_all = np.array([int(c[:16], 16) for c in chl], dtype=np.uint64)
        e_band = salted_vec("e", ch64_all)
        m = row_mask(e_band, isnew_all)
        if m is None:
            out.append(_subtable(batch["url"], "e", e_band,
                                 ch=batch["content_hash"],
                                 ch64=ch64_all, new=isnew_all))
        elif m.any():
            sel = pa.array(m)
            out.append(_subtable(
                batch["url"].filter(sel), "e", e_band[m],
                ch=batch["content_hash"].filter(sel),
                ch64=ch64_all[m], new=isnew_all[m]))

        # text rows — NUM_BANDS per doc, fully vectorized. Any doc carrying
        # bands participates: "text" docs plus payload/chunked docs with
        # extractable text (ImageText dual channel, database.py:748-751)
        all_counts = batch["band_keys"].combine_chunks().value_lengths()
        t_mask_np = all_counts.to_numpy(zero_copy_only=False) > 0
        t = batch.filter(pa.array(t_mask_np))
        ch64_t = ch64_all[t_mask_np]
        isnew_t = isnew_all[t_mask_np]
        if t.num_rows:
            # batch-level combiner: duplicate contents share ALL band keys,
            # and the scorer pairs only one REPRESENTATIVE per distinct
            # chash64 per band run (min url — exact members reach the
            # cluster through the "e" star edges). Dropping same-chash64
            # rows here, keeping the min-url one, shrinks the exchange by
            # the duplicate share (hot boilerplate families collapse to ~1
            # row per batch) and cannot change edges: the global-min url is
            # also the min within its own batch, so the scorer still picks
            # the same representative.
            # Collision stance (same as the scorer's per-run rep dedup,
            # scoring_stage.py ~:405): a 64-bit fold collision between two
            # genuinely DIFFERENT documents collapses them to one text-band
            # representative — here for the whole batch, there per band run.
            # Either way the collision can only DROP a would-be candidate
            # pair (p ≈ 2⁻⁶⁴ per pair), never emit a wrong edge: every edge
            # is re-verified downstream (exact hash equality in-group for
            # "e", SequenceMatcher text verify for "t"). A combiner-level
            # tie-break on the full content_hash would not help because "t"
            # block rows carry only the fold — the scorer would re-collapse
            # by chash64 anyway.
            import pandas as pd

            if len(np.unique(ch64_t)) < len(ch64_t):
                urls_t = np.asarray(t["url"].to_pylist(), dtype=object)
                order = pd.DataFrame({"c": ch64_t, "u": urls_t}).sort_values(
                    ["c", "u"], kind="stable").index.to_numpy()
                cs = ch64_t[order]
                first = np.r_[True, cs[1:] != cs[:-1]]
                sel = np.sort(order[first])
                t = t.take(pa.array(sel))
                ch64_t = ch64_t[sel]
                isnew_t = isnew_t[sel]
            bands = t["band_keys"].combine_chunks()
            counts = bands.value_lengths().to_numpy(zero_copy_only=False)
            flat = bands.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            rep_idx = np.repeat(np.arange(t.num_rows), counts)
            t_band = salted_vec("t", flat)
            m = row_mask(t_band, isnew_t[rep_idx])
            if m is not None:
                rep_idx, t_band = rep_idx[m], t_band[m]
            if len(rep_idx):
                idx = pa.array(rep_idx)
                out.append(_subtable(
                    t["url"].take(idx), "t", t_band,
                    ch64=ch64_t[rep_idx],
                    sim=t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)[rep_idx],
                    tl=t["text_len"].to_numpy(zero_copy_only=False).astype(np.uint32)[rep_idx],
                    new=isnew_t[rep_idx],
                ))

        # payload rows — PAYLOAD_BANDS per doc, vectorized per band index
        p_mask_np = mods == "payload"
        p = batch.filter(pa.array(p_mask_np))
        if p.num_rows:
            ph = p["payload_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            p_new = isnew_all[p_mask_np]
            width = 64 // PAYLOAD_BANDS
            mask_bits = np.uint64((1 << width) - 1)
            for b_idx in range(PAYLOAD_BANDS):
                band_vals = ((ph >> np.uint64(b_idx * width)) & mask_bits) | (
                    np.uint64(b_idx) << np.uint64(56))
                p_band = salted_vec("p", band_vals)
                m = row_mask(p_band, p_new)
                if m is None:
                    out.append(_subtable(p["url"], "p", p_band,
                                         ph=ph, new=p_new))
                elif m.any():
                    out.append(_subtable(p["url"].filter(pa.array(m)), "p",
                                         p_band[m], ph=ph[m], new=p_new[m]))

        # chunked rows — one per distinct chunk hash (few docs; python loop)
        c_mask_np = mods == "chunked"
        c = batch.filter(pa.array(c_mask_np))
        if c.num_rows:
            c_new = isnew_all[c_mask_np]
            urls, keys, lists, news = [], [], [], []
            for i, (u, chs) in enumerate(zip(c["url"].to_pylist(),
                                             c["chunk_hashes"].to_pylist())):
                for cv in sorted(set(chs)):
                    urls.append(u)
                    keys.append(cv)
                    lists.append(chs)
                    news.append(bool(c_new[i]))
            c_band = salted_vec("c", np.array(keys, dtype=np.uint64))
            news_np = np.array(news, dtype=bool)
            m = row_mask(c_band, news_np)
            if m is not None and not bool(m.all()):
                urls = [u for u, k in zip(urls, m) if k]
                lists = [v for v, k in zip(lists, m) if k]
                c_band, news_np = c_band[m], news_np[m]
            if len(c_band):
                out.append(_subtable(
                    pa.array(urls, pa.string()), "c", c_band,
                    ck=pa.array(lists, pa.list_(pa.uint64())),
                    new=news_np,
                ))

        if not out:  # every row pruned (all-history batch, no touched band)
            return BLOCK_ROW_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return fingerprints_ds.map_batches(explode, batch_format="pyarrow",
                                       zero_copy_batch=True)
