"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship repost pipeline; `queries()` exposes one entry
per implemented operator family from SURVEY.md §2 (+ the training-data ops);
`oracle_sql()` gives the DuckDB-equivalent SQL for every relationally
expressible query. Non-SQL-expressible ops (LSH internals, heuristic
scoring, approximate ANN, the flagship pipeline itself) are rows-only by
design and noted as such.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pyarrow as pa

from repostcheckerbot_ray.pipelines import corpus_ops, embedding_ops

_Q_IDS = "0, 1, 2, 3"
_SHIFT = corpus_ops.COPY_SHIFT

# SQL mirrors of the B7 whitespace canonicalizer and B2 sentinel predicate,
# derived from the SAME constants the engine uses (functions.textnorm) so
# the repost_exact_edges oracle cannot drift from the fingerprint dispatch.
from repostcheckerbot_ray.functions.textnorm import (  # noqa: E402
    NONWS_RUN_REGEX,
    TEXT_SENTINELS,
    WS_REGEX_CLASS,
)

_WS_RE = WS_REGEX_CLASS   # explicit isspace() class, shared with the engine
_NONWS_RE = NONWS_RUN_REGEX  # one token = maximal non-whitespace run
_SENTINELS_SQL = ", ".join(
    "'" + s.replace("'", "''") + "'" for s in sorted(TEXT_SENTINELS))

# Brute-force O(n²) token-trigram Jaccard ≥ 0.8 pair set (shared by the
# ngram_jaccard_pairs and minhash_dedup_clusters oracles). Mirrors
# corpus_ops._shingle_set exactly: lowercase, whitespace-split, strict
# 3-grams, DISTINCT shingles.
_TRI_PAIRS_CTE = (
    "toks AS ("
    "  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok,"
    "         generate_subscripts(string_split(lower(text), ' '), 1) AS pos"
    "  FROM documents),"
    "tri AS ("
    "  SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS sh"
    "  FROM toks a"
    "  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1"
    "  JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),"
    "sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),"
    "inter AS ("
    "  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i"
    "  FROM tri x JOIN tri y ON x.sh = y.sh AND x.doc_id < y.doc_id"
    "  GROUP BY x.doc_id, y.doc_id),"
    "pairs AS ("
    "  SELECT id_a, id_b FROM inter"
    "  JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b"
    "  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8)"
)


def _simhash_cte() -> str | None:
    """VALUES-CTE of (doc_id, simhash) for the simhash_dedup_clusters
    oracle, computed by the SAME sketch function the Ray pipeline uses
    (functions.fingerprint.fingerprint_text_many — itself pinned
    bit-identical to the per-doc chain by tests/test_functions.py).

    The sketch is Python-hash-based and not SQL-expressible, so it enters
    the oracle as shared INPUT; everything the distributed pipeline could
    get wrong — 16-bit-band blocking recall, max_block sharding, in-group
    Hamming verification, transitive-closure labeling — is then checked by
    DuckDB's independent brute-force O(n²) ``bit_count(xor(a,b))`` pair scan
    plus recursive-CTE closure. The driver compares Ray vs oracle at
    sf=0.01 (driver contract); override with GRAFT_ORACLE_SF_DIR."""
    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as _pq

    from repostcheckerbot_ray.functions.fingerprint import fingerprint_text_many

    t = _pq.read_table(path, columns=["doc_id", "text"])
    if t.num_rows == 0:  # "VALUES ()" is a parse error — no oracle then
        return None
    cache: dict = {}
    _, sims, _ = fingerprint_text_many(
        [x.lower().split() for x in t["text"].to_pylist()], cache,
        want_bands=False)
    rows = ",".join(f"({i},{int(s)}::UBIGINT)"
                    for i, s in zip(t["doc_id"].to_pylist(), sims.tolist()))
    return f"sims(doc_id, simhash) AS (SELECT * FROM (VALUES {rows}) v)"


def _payload_cte() -> str | None:
    """VALUES-CTE of (url, payload_hash, content_hash) for every
    payload-modality page of the synthetic corpus, computed by the SAME
    dispatch constants and hash functions the fingerprint stage uses
    (fingerprint_stage dispatch order: valid text → text, gif url →
    chunked, img url → payload; functions.fingerprint.payload_hash64 —
    itself unit-pinned). The sketches enter the oracle as shared INPUT
    (the _simhash_cte pattern); everything the distributed pipeline could
    get wrong — 8×8-bit band blocking recall (pigeonhole-lossless at
    threshold 5 < 8 bands), in-part Hamming verification, D4 keep-max
    against the exact star edges — is then checked by DuckDB's independent
    brute-force O(n²) ``bit_count(xor)`` pair scan (reference F2,
    /root/reference/database.py:585-603).

    Corpus-coherence note: _corpus_dir writes the SAME deterministic
    default-spec corpus for every tag, so the queries() side (tag from its
    sf_dir) and this CTE (tag from GRAFT_ORACLE_SF_DIR) always see
    identical pages even if the tags differ."""
    import hashlib

    from repostcheckerbot_ray.functions.fingerprint import payload_hash64
    from repostcheckerbot_ray.functions.textnorm import is_valid_text
    from repostcheckerbot_ray.stages.fingerprint_stage import (
        _is_gif_url,
        _is_img_url,
    )

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    import glob

    import pyarrow.parquet as _pq

    rows = []
    for f in sorted(glob.glob(os.path.join(d, "pages", "*.parquet"))):
        t = _pq.read_table(f, columns=["url", "text", "html"])
        for url, text, html in zip(t["url"].to_pylist(), t["text"].to_pylist(),
                                   t["html"].to_pylist()):
            if is_valid_text(text) or _is_gif_url(url) or not _is_img_url(url):
                continue
            data = bytes(html) if html is not None else b""
            u = url.replace("'", "''")
            rows.append(f"('{u}',{payload_hash64(data)}::UBIGINT,"
                        f"'{hashlib.sha256(data).hexdigest()}')")
    if not rows:
        return None
    return ("pl(url, ph, chash) AS (SELECT * FROM (VALUES "
            + ",".join(rows) + ") v)")


def _chunked_cte() -> str | None:
    """VALUES-CTEs for the chunked (video/gif, F3) oracle over the synthetic
    corpus: ``ck(url, idx, h)`` — one row per chunk-hash occurrence (the
    engine's min-mean distance counts duplicate frames) — and
    ``cd(url, chash)`` — one row per chunked doc for the exact-star
    resolution. Same dispatch/sketch sharing and corpus-coherence contract
    as _payload_cte: the chunk hashes enter as shared INPUT
    (functions.fingerprint.chunk_hashes, unit-pinned); chunk-hash blocking
    recall, the per-pair min-mean Hamming, the F3 predicate and D4 keep-max
    are what DuckDB independently re-derives (reference F3,
    /root/reference/database.py:215-227, 451)."""
    import glob
    import hashlib

    import pyarrow.parquet as _pq

    from repostcheckerbot_ray.functions.fingerprint import chunk_hashes
    from repostcheckerbot_ray.functions.textnorm import is_valid_text
    from repostcheckerbot_ray.stages.fingerprint_stage import _is_gif_url

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    ck_rows, cd_rows = [], []
    for f in sorted(glob.glob(os.path.join(d, "pages", "*.parquet"))):
        t = _pq.read_table(f, columns=["url", "text", "html"])
        for url, text, html in zip(t["url"].to_pylist(), t["text"].to_pylist(),
                                   t["html"].to_pylist()):
            # the fingerprint dispatch: valid text wins, then gif → chunked
            if is_valid_text(text) or not _is_gif_url(url):
                continue
            data = bytes(html) if html is not None else b""
            u = url.replace("'", "''")
            cd_rows.append(f"('{u}','{hashlib.sha256(data).hexdigest()}')")
            for i, h in enumerate(chunk_hashes(data)):
                ck_rows.append(f"('{u}',{i},{int(h)}::UBIGINT)")
    if not ck_rows:
        return None
    return ("ck(url, idx, h) AS (SELECT * FROM (VALUES "
            + ",".join(ck_rows) + ") v),"
            "cd(url, chash) AS (SELECT * FROM (VALUES "
            + ",".join(cd_rows) + ") w)")


def _corpus_dir(tag: str) -> str:
    """Deterministic synthetic pages corpus (FIXTURES.md) cached under /tmp —
    the input-hint-shaped table for flagship/multimodal queries."""
    from repostcheckerbot_ray.fixtures import write_fixture

    d = f"/tmp/rcb_corpus_v3_{tag}"
    marker = os.path.join(d, "pages", "part-00000.parquet")
    if not os.path.exists(marker):
        write_fixture(d)
    return d


def _flagship(sf_dir: str) -> dict:
    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    return run_repost_pipeline(f"{d}/pages", f"/tmp/rcb_out_{tag}", RepostConfig())


def _docs_as_pages(sf_dir: str, with_copies: bool = False):
    """`documents` adapted to the pages schema (url/warc_ts/html/text/lang):
    url = 'doc://' || doc_id, warc_ts = epoch + doc_id minutes, html = b''.
    ``with_copies`` unions an id-shifted EXACT copy (corpus_ops.with_copies
    semantics) so the corpus carries SQL-predictable exact duplicates."""
    import pyarrow.compute as pc

    from repostcheckerbot_ray.pipelines.corpus_ops import _read, with_copies as _wc

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    if with_copies:
        docs = _wc(docs)

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        urls = pc.binary_join_element_wise(
            pa.array(["doc://"] * batch.num_rows), pc.cast(ids, pa.string()), ""
        )
        base = 1_704_067_200_000_000
        ts = pc.add(pc.multiply(pc.cast(ids, pa.int64()), 60_000_000), base)
        return pa.table(
            {
                "url": urls,
                "warc_ts": pc.cast(ts, pa.timestamp("us")),
                "html": pa.array([b""] * batch.num_rows, pa.binary()),
                "text": batch["text"],
                "lang": batch["lang"],
            }
        )

    return docs.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)


def entry() -> Any:
    """Flagship pipeline over sf0.001 `documents` adapted to the pages
    schema (url/warc_ts/html/text/lang) — returns the clusters Dataset."""
    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

    pages = _docs_as_pages("/root/testdata/sf0.001")
    res = run_repost_pipeline(pages, "/tmp/rcb_entry_out", RepostConfig(),
                              write_outputs=False)
    return res["clusters"]


def _repost_exact_edges(sf_dir: str) -> Any:
    """The flagship's EXACT-match edge relation (D2/F4) over `documents` ∪
    id-shifted exact copy adapted to pages — the SQL-expressible slice of
    the edge family: per duplicated content key, star edges from the hub
    (min url) to every other member, score 100 (reference semantics
    /root/reference/database.py:366-388: new post linked to the stored
    exact match). Runs the REAL pipeline (fingerprint dispatch → band
    exchange → star edges → D4 dedup) and filters kind='exact'; the DuckDB
    oracle independently rebuilds the content-key grouping (whitespace
    canonicalization B7 + sentinel dispatch B2 mirrored in SQL)."""
    import pyarrow.compute as pc

    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    pages = _docs_as_pages(sf_dir, with_copies=True)
    res = run_repost_pipeline(pages, f"/tmp/rcb_exact_edges_{tag}",
                              RepostConfig(), write_outputs=False)
    return res["edges"].map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "exact"))
                   .select(["url_a", "url_b", "score"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _repost_payload_edges(sf_dir: str) -> Any:
    """The flagship's PAYLOAD edge slice (F2) over the synthetic corpus:
    the REAL pipeline (payload_hash64 fingerprints → 8×8-bit band exchange
    → in-part Hamming < 5 verification → D4 keep-max) filtered to
    kind='payload'. The DuckDB oracle brute-forces ALL O(n²) payload pairs
    over the shared sketch CTE and independently removes the exact-star
    pairs that D4 resolves to kind='exact' — equality proves band blocking
    loses nothing at threshold 5 and keep-max picks the right kind.
    Runs with text_in_image=False (≙ the reference's BOT_TEXT_IN_IMAGE
    sub-setting off, /root/reference/config.py:18): image posts match on
    payload hashes ONLY. With it on (the flagship default), the extractor
    pulls byte-garbage "text" out of the random payload fixtures, the
    near-identical variants then SequenceMatcher-score ~99 in the text
    channel, and D4 keep-max rightly resolves every payload pair to
    kind='text' — the payload slice would be empty and text-dependent.
    Off, the slice is exactly the SQL-expressible F2 relation."""
    import pyarrow.compute as pc

    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    res = run_repost_pipeline(
        f"{d}/pages", f"/tmp/rcb_payload_edges_{tag}",
        RepostConfig(text_in_image=False), write_outputs=False)
    return res["edges"].map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "payload"))
                   .select(["url_a", "url_b", "score"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _repost_chunked_edges(sf_dir: str) -> Any:
    """The flagship's CHUNKED edge slice (F3, the reference's video path)
    over the synthetic corpus: the REAL pipeline (per-chunk hash lists →
    chunk-hash blocking → in-part min-mean Hamming < 5 verification → D4
    keep-max) filtered to kind='chunked'. The DuckDB oracle brute-forces
    ALL O(n²) chunked pairs over the shared chunk-hash CTE — equality
    proves shared-chunk blocking loses nothing at threshold 5 (a min-mean
    < 5 over 64-bit hashes forces ≳84% of the smaller-url doc's chunks to
    sit within ~5 bits of some counterpart, and two INDEPENDENT chunk
    hashes land that close with p ≈ 6e-13 — so every true pair shares an
    identical chunk) and that D4 resolves identical-bytes pairs to the
    exact channel. text_in_image=False for the same reason as the payload
    slice: the gif docs' byte-garbage extracted text must not reroute the
    pairs through the text channel."""
    import pyarrow.compute as pc

    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    res = run_repost_pipeline(
        f"{d}/pages", f"/tmp/rcb_chunked_edges_{tag}",
        RepostConfig(text_in_image=False), write_outputs=False)
    return res["edges"].map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "chunked"))
                   .select(["url_a", "url_b", "score"]),
        batch_format="pyarrow", zero_copy_batch=True)


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {
        # relational ops (SQL-oracled)
        "exact_dedup_by_key": corpus_ops.exact_dedup_by_key,      # D1/E3
        "exact_dedup_text": corpus_ops.exact_dedup_text,          # E3+E7
        "lang_counts": corpus_ops.lang_counts,                    # E1
        "source_doc_stats": corpus_ops.source_doc_stats,          # partial-agg
        "top_k_longest": corpus_ops.top_k_longest,                # E6
        "top_k_per_source": corpus_ops.top_k_per_source,          # grouped top-k
        "source_length_quantiles": corpus_ops.source_length_quantiles,  # exact group quantiles
        "token_counts": corpus_ops.token_counts,                  # text analysis
        "char_counts": corpus_ops.char_counts,
        "bpe_token_counts": corpus_ops.bpe_token_counts,
        "ttl_filter_events": corpus_ops.ttl_filter_events,        # B9/E5
        "repetition_stats": corpus_ops.repetition_stats,          # quality
        "event_window_counts": corpus_ops.event_window_counts,    # windowed agg
        "session_counts": corpus_ops.session_counts,              # session windows
        "asof_join_events": corpus_ops.asof_join_events,          # temporal as-of join
        "hopping_window_counts": corpus_ops.hopping_window_counts,  # sliding windows
        "range_join_events": corpus_ops.range_join_events,        # bounded range join
        "window_dedup_events": corpus_ops.window_dedup_events,    # streaming debounce
        # dedup family (cluster outputs SQL-predictable via exact-copy union)
        "minhash_dedup_clusters": corpus_ops.minhash_dedup_clusters,  # E4/D3
        "minhash_dedup_keep_first": corpus_ops.minhash_dedup_keep_first,
        "simhash_dedup_clusters": corpus_ops.simhash_dedup_clusters,
        # training-data curation family (SQL-oracled)
        "contamination_check": corpus_ops.contamination_check,  # decontam join
        "top_terms_per_lang": corpus_ops.top_terms_per_lang,    # vocab profile
        "length_band_filter": corpus_ops.length_band_filter,    # quantile trim
        # similarity search
        "knn_cosine": lambda sf: embedding_ops.knn_brute_force(sf),
        "embedding_dup_pairs": lambda sf: embedding_ops.embedding_dup_pairs(sf),
        # anti-join / predicate / reclassification family (SQL-oracled)
        "tombstone_anti_join": corpus_ops.tombstone_anti_join,   # D5
        "lang_filter": lambda sf: corpus_ops.lang_filter(sf),    # B3
        "source_reclassify": corpus_ops.source_reclassify,       # A6/D6
        "url_normalize": corpus_ops.url_normalize,               # B6
        # rows-only (non-SQL-expressible: heuristic / approximate / pipeline)
        "text_analysis": corpus_ops.text_analysis,
        "length_quantiles_sketch": corpus_ops.length_quantiles_sketch,  # ±2% gate
        "ngram_jaccard_pairs": lambda sf: corpus_ops.ngram_jaccard_pairs(sf),
        "knn_ivf": lambda sf: embedding_ops.knn_ivf(sf),
        "knn_lsh": lambda sf: embedding_ops.knn_lsh(sf),
        # driver-visible recall gates for the approximate ANN paths: each
        # runs the approximate index AND the exact brute-force scan in one
        # callable, emits per-query recall@10, and RAISES below the
        # corpus-calibrated floor (same floors as tests/test_entry.py) —
        # a recall regression fails the driver's rows-only check loudly
        # instead of silently shipping a worse index
        "knn_ivf_recall": lambda sf: _knn_recall(sf, "ivf", floor=0.5),
        "knn_lsh_recall": lambda sf: _knn_recall(sf, "lsh", floor=0.4),
        "repost_clusters": lambda sf: _flagship(sf)["clusters"],
        "repost_edges": lambda sf: _flagship(sf)["edges"],
        "repost_exact_edges": _repost_exact_edges,       # D2/F4, SQL-oracled
        "repost_payload_edges": _repost_payload_edges,   # F2, SQL-oracled
        "repost_chunked_edges": _repost_chunked_edges,   # F3, SQL-oracled
        "repost_delta_clusters": _repost_delta,                  # A2/§2.G
        "media_features": _media_features,
        "media_features_meta": _media_features_meta,     # SQL-oracled slice
    }
    return q


def _knn_recall(sf_dir: str, which: str, floor: float) -> Any:
    """Per-query recall@10 of an approximate ANN index vs the exact
    brute-force scan (the already-oracled knn_cosine), plus an AGGREGATE
    floor assertion: overall recall (|approx ∩ exact| / |exact|) must meet
    the corpus-calibrated floor or this callable raises — making the
    approximation quality visible to (and enforced by) the driver's
    correctness run, not just pytest."""
    import pandas as pd

    brute = embedding_ops.knn_brute_force(sf_dir).to_pandas()
    approx = (embedding_ops.knn_ivf(sf_dir) if which == "ivf"
              else embedding_ops.knn_lsh(sf_dir)).to_pandas()
    b = set(zip(brute["query_id"], brute["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    overall = len(b & a) / len(b) if b else 0.0
    assert overall >= floor, (
        f"knn_{which} overall recall {overall:.3f} < floor {floor}")
    rows = []
    for qid, grp in brute.groupby("query_id"):
        want = set(grp["neighbor_id"])
        got = {n for q, n in a if q == qid}
        rows.append((int(qid), len(want & got) / len(want) if want else 0.0))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "recall_at_10": pa.array([r[1] for r in rows], pa.float64()),
    })


def _repost_delta(sf_dir: str) -> Any:
    """Delta-run clusters over the synthetic corpus: history = first half of
    the page shards, delta = the rest; history fingerprints come from its
    checkpoint, never recomputed (pinned equal to the full recompute by
    tests/test_delta.py)."""
    import glob
    import shutil

    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_delta, run_repost_pipeline

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    root = f"/tmp/rcb_delta_{tag}"
    shards = sorted(glob.glob(f"{d}/pages/*.parquet"))
    hist_pages = os.path.join(root, "hist_pages")
    delta_pages = os.path.join(root, "delta_pages")
    if not os.path.isdir(delta_pages):
        os.makedirs(hist_pages, exist_ok=True)
        os.makedirs(delta_pages, exist_ok=True)
        for s in shards[: len(shards) // 2]:
            shutil.copy(s, hist_pages)
        for s in shards[len(shards) // 2:]:
            shutil.copy(s, delta_pages)
    cfg = RepostConfig()
    # history WITH outputs so the delta run takes the optimized path
    # (history-edge reuse + pure-history band-run skipping)
    run_repost_pipeline(hist_pages, f"{root}/out_hist", cfg)
    res = run_repost_delta(f"{root}/out_hist", delta_pages,
                           f"{root}/out_delta", cfg, write_outputs=False)
    return res["clusters"]


def _media_features(sf_dir: str) -> Any:
    import ray.data as rd

    from repostcheckerbot_ray.stages.multimodal import media_features

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    pages = rd.read_parquet(f"{_corpus_dir(tag)}/pages", columns=["url", "html"])
    return media_features(pages)


def _media_features_meta(sf_dir: str) -> Any:
    """The SQL-expressible slice of media_features: every column except the
    float stub embedding — n_bytes, payload_hash, and the stub-decoded
    width/height/n_frames, whose derivations (64 + hash bit-fields;
    ceil(n_bytes/256) frames) the DuckDB oracle recomputes independently
    from a shared (url, n_bytes, payload_hash) VALUES CTE. Verifies the
    actor-pool stage computes the documented functions over EVERY corpus
    row with the exact schema (the feature projection stays rows-only —
    float32 matmul is not SQL-reproducible bit-exactly)."""
    return _media_features(sf_dir).map_batches(
        lambda t: t.select(["url", "n_bytes", "payload_hash", "width",
                            "height", "n_frames"]),
        batch_format="pyarrow", zero_copy_batch=True)


def _media_meta_cte() -> str | None:
    """VALUES-CTE (url, n_bytes, ph) over the synthetic corpus — shared
    input for the media_features_meta oracle (same pattern/corpus-coherence
    note as _payload_cte; payload_hash64 is the shared sketch function,
    unit-pinned)."""
    import glob

    import pyarrow.parquet as _pq

    from repostcheckerbot_ray.functions.fingerprint import payload_hash64

    sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    d = _corpus_dir(tag)
    rows = []
    for f in sorted(glob.glob(os.path.join(d, "pages", "*.parquet"))):
        t = _pq.read_table(f, columns=["url", "html"])
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            data = bytes(html) if html is not None else b""
            u = url.replace("'", "''")
            rows.append(f"('{u}',{len(data)},"
                        f"{payload_hash64(data)}::UBIGINT)")
    if not rows:
        return None
    return ("mm(url, n_bytes, ph) AS (SELECT * FROM (VALUES "
            + ",".join(rows) + ") v)")


def oracle_sql() -> dict[str, str]:
    out = {}
    _sims = _simhash_cte()
    if _sims is not None:
        # brute-force O(n²) Hamming pair scan + recursive-CTE closure over
        # the shared simhash sketch column (see _simhash_cte docstring) —
        # same contract as the minhash_dedup_clusters oracle: equality
        # proves blocking recall AND transitive labeling end-to-end.
        out["simhash_dedup_clusters"] = (
            "WITH RECURSIVE " + _sims + ","
            "pairs AS ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b"
            "  FROM sims a JOIN sims b ON a.doc_id < b.doc_id"
            "  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),"
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs"
            "          UNION ALL SELECT id_b, id_a FROM pairs),"
            "reach(src, dst) AS ("
            "  SELECT a, b FROM edges"
            "  UNION"
            "  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst) "
            "SELECT d.doc_id,"
            "  LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id "
            "FROM documents d LEFT JOIN reach r ON r.src = d.doc_id "
            "GROUP BY d.doc_id "
            # corpus guard: the sims VALUES-CTE was computed from
            # GRAFT_ORACLE_SF_DIR at SQL-gen time; if the harness runs the
            # paired query at a DIFFERENT sf, the doc_id sets diverge and
            # this poison row makes the compare FAIL LOUDLY instead of
            # silently joining the wrong corpus
            "UNION ALL SELECT -1 AS doc_id, -1 AS cluster_id WHERE "
            "(SELECT COUNT(*) FROM documents) <> (SELECT COUNT(*) FROM sims)"
            " OR EXISTS (SELECT 1 FROM documents d LEFT JOIN sims s"
            "            ON s.doc_id = d.doc_id WHERE s.doc_id IS NULL)"
        )
    _pl = _payload_cte()
    if _pl is not None:
        # brute-force O(n²) Hamming pair scan over the shared payload
        # sketches, minus the exact-star pairs D4 resolves to kind='exact'
        # (hub = min url per identical-bytes group; member-member pairs of
        # such a group stay payload at d=0 → score 100, matching keep-max)
        out["repost_payload_edges"] = (
            "WITH " + _pl + ","
            "pairs AS ("
            "  SELECT a.url AS url_a, b.url AS url_b,"
            "    CAST(bit_count(xor(a.ph, b.ph)) AS DOUBLE) AS d"
            "  FROM pl a JOIN pl b ON a.url < b.url"
            "  WHERE bit_count(xor(a.ph, b.ph)) < 5),"
            "hubs AS (SELECT chash, MIN(url) AS hub FROM pl"
            "         GROUP BY chash HAVING COUNT(*) > 1),"
            "star AS (SELECT h.hub AS url_a, m.url AS url_b"
            "         FROM pl m JOIN hubs h"
            "         ON h.chash = m.chash AND m.url <> h.hub) "
            "SELECT p.url_a, p.url_b, (5.0 - p.d) / 5.0 * 100.0 AS score "
            "FROM pairs p LEFT JOIN star s"
            "  ON s.url_a = p.url_a AND s.url_b = p.url_b "
            "WHERE s.url_a IS NULL"
        )
    _ck = _chunked_cte()
    if _ck is not None:
        # brute-force O(n²) min-mean Hamming over the shared chunk lists:
        # per ORIENTED pair (url_a < url_b, matching the scorer's sorted
        # iteration — the F3 distance is asymmetric, mean over the SMALLER
        # url's chunks), per a-chunk min over b-chunks, then AVG; exact-star
        # pairs removed exactly as in the payload oracle
        out["repost_chunked_edges"] = (
            "WITH " + _ck + ","
            "mins AS ("
            "  SELECT a.url AS url_a, b.url AS url_b, a.idx AS aidx,"
            "    MIN(bit_count(xor(a.h, b.h))) AS md"
            "  FROM ck a JOIN ck b ON a.url < b.url"
            "  GROUP BY a.url, b.url, a.idx),"
            "dists AS (SELECT url_a, url_b, AVG(md) AS d FROM mins"
            "          GROUP BY url_a, url_b),"
            "pairs AS (SELECT url_a, url_b, d FROM dists WHERE d < 5),"
            "hubs AS (SELECT chash, MIN(url) AS hub FROM cd"
            "         GROUP BY chash HAVING COUNT(*) > 1),"
            "star AS (SELECT h.hub AS url_a, m.url AS url_b"
            "         FROM cd m JOIN hubs h"
            "         ON h.chash = m.chash AND m.url <> h.hub) "
            "SELECT p.url_a, p.url_b, (5.0 - p.d) / 5.0 * 100.0 AS score "
            "FROM pairs p LEFT JOIN star s"
            "  ON s.url_a = p.url_a AND s.url_b = p.url_b "
            "WHERE s.url_a IS NULL"
        )
    _mm = _media_meta_cte()
    if _mm is not None:
        # recompute the stub-decode derivations independently: width/height
        # are hash bit-fields (multimodal.MediaFeatureExtractor._decode_image),
        # n_frames = ceil(n_bytes / 256) with 0 for empty payloads
        # (functions.fingerprint.chunk_hashes)
        out["media_features_meta"] = (
            "WITH " + _mm + " "
            "SELECT url, CAST(n_bytes AS BIGINT) AS n_bytes,"
            "  ph AS payload_hash,"
            "  CAST(64 + (ph & 1023::UBIGINT) AS INT) AS width,"
            "  CAST(64 + ((ph >> 10) & 1023::UBIGINT) AS INT) AS height,"
            "  CAST((n_bytes + 255) // 256 AS INT) AS n_frames "
            "FROM mm"
        )
    out.update({
        "exact_dedup_by_key": (
            "SELECT source, lang, CAST(MIN(doc_id) AS BIGINT) AS doc_id "
            "FROM documents GROUP BY source, lang"
        ),
        "exact_dedup_text": (
            f"WITH all_docs AS (SELECT doc_id, text FROM documents "
            f"UNION ALL SELECT doc_id + {_SHIFT}, text FROM documents) "
            "SELECT text, CAST(MIN(doc_id) AS BIGINT) AS doc_id "
            "FROM all_docs GROUP BY text"
        ),
        "lang_counts": "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang",
        "source_doc_stats": (
            "SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source"
        ),
        "top_k_longest": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 20"
        ),
        "top_k_per_source": (
            "SELECT source, doc_id, n_chars FROM ("
            "  SELECT source, doc_id, n_chars,"
            "    row_number() OVER (PARTITION BY source"
            "      ORDER BY n_chars DESC, doc_id ASC) AS rn"
            "  FROM documents) WHERE rn <= 3"
        ),
        # percentile_disc = sorted ascending, index ceil(q*n)-1 — the exact
        # discrete-quantile rule the Ray side implements in numpy
        "source_length_quantiles": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,"
            "  CAST(MIN(n_chars) AS BIGINT) AS min_chars,"
            "  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)"
            "       AS BIGINT) AS p50_chars,"
            "  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)"
            "       AS BIGINT) AS p90_chars,"
            "  CAST(MAX(n_chars) AS BIGINT) AS max_chars "
            "FROM documents GROUP BY source"
        ),
        # tokens = maximal non-whitespace runs over the engine's explicit
        # isspace() class (len(text.split()) semantics) — same RE2 pattern
        # the engine's count_substring_regex runs, so parity is exact on
        # any whitespace, not just ASCII \s
        "token_counts": (
            f"SELECT doc_id, CAST(len(regexp_extract_all(text, "
            f"'{_NONWS_RE}')) AS BIGINT) AS n_tokens FROM documents"
        ),
        "char_counts": (
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc FROM documents"
        ),
        # same RE2 pattern as the Ray side's pc.count_substring_regex —
        # engine-level parity (both Arrow and DuckDB embed RE2)
        "bpe_token_counts": (
            r"SELECT doc_id, CAST(len(regexp_extract_all(text, "
            r"'[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "ttl_filter_events": (
            f"SELECT event_id, ts FROM events WHERE ts >= TIMESTAMP '{corpus_ops.TTL_CUTOFF}'"
        ),
        # token identity = the same non-whitespace-run extraction as
        # token_counts (explicit isspace() class, never ASCII-only \s)
        "repetition_stats": (
            "WITH toks AS ("
            f"  SELECT doc_id, unnest(regexp_extract_all(text, "
            f"'{_NONWS_RE}')) AS tok FROM documents),"
            "s AS (SELECT doc_id, COUNT(*) AS n_tokens,"
            "      COUNT(DISTINCT tok) AS n_distinct FROM toks GROUP BY doc_id) "
            "SELECT d.doc_id,"
            "  CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,"
            "  CAST(COALESCE(s.n_distinct, 0) AS BIGINT) AS n_distinct,"
            "  COALESCE(s.n_distinct, 0) * 2 < COALESCE(s.n_tokens, 0) AS is_repetitive "
            "FROM documents d LEFT JOIN s USING(doc_id)"
        ),
        "event_window_counts": (
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type, day"
        ),
        # the blocked near-dup scan vs the reference-style O(n²) full scan:
        # DuckDB brute-forces token-trigram Jaccard over ALL pairs; the Ray
        # side is LSH-blocked + exact verification. Equality proves zero
        # recall loss from blocking at this threshold. Thresholding is pure
        # integer-set arithmetic on both sides (no float tolerance needed).
        "ngram_jaccard_pairs": (
            "WITH " + _TRI_PAIRS_CTE + " SELECT id_a, id_b FROM pairs"
        ),
        # cluster oracle: connected components of the SAME brute-force pair
        # set via a recursive reachability CTE; cluster_id = min member,
        # singletons map to themselves — exactly the Ray side's union-find
        # contract over verified edges. Equality proves both the blocked
        # pair recall AND the transitive-closure labeling end-to-end.
        "minhash_dedup_clusters": (
            "WITH RECURSIVE " + _TRI_PAIRS_CTE + ","
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs"
            "          UNION ALL SELECT id_b, id_a FROM pairs),"
            "reach(src, dst) AS ("
            "  SELECT a, b FROM edges"
            "  UNION"
            "  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst) "
            "SELECT d.doc_id,"
            "  LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS cluster_id "
            "FROM documents d LEFT JOIN reach r ON r.src = d.doc_id "
            "GROUP BY d.doc_id"
        ),
        # deduped corpus = survivors (min member per closure component):
        # exactly the docs not reachable from any smaller doc
        "minhash_dedup_keep_first": (
            "WITH RECURSIVE " + _TRI_PAIRS_CTE + ","
            "edges AS (SELECT id_a AS a, id_b AS b FROM pairs"
            "          UNION ALL SELECT id_b, id_a FROM pairs),"
            "reach(src, dst) AS ("
            "  SELECT a, b FROM edges"
            "  UNION"
            "  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst) "
            "SELECT d.doc_id FROM documents d LEFT JOIN reach r "
            "ON r.src = d.doc_id GROUP BY d.doc_id "
            "HAVING LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) = d.doc_id"
        ),
        # decontamination: benchmark = id-shifted copies of every 3rd doc;
        # train docs whose text appears verbatim in the benchmark. Real
        # equi-join on both sides (the Ray side is a part-keyed text
        # exchange + in-group semi-join).
        "contamination_check": (
            f"WITH bench AS (SELECT doc_id + {_SHIFT} AS doc_id, text "
            "FROM documents WHERE doc_id % 3 = 0) "
            "SELECT DISTINCT t.doc_id FROM documents t "
            "JOIN bench b ON b.text = t.text"
        ),
        # vocabulary profile: top-5 whitespace tokens per lang, every
        # occurrence counted, lowercased; ties broken by token asc — the
        # same deterministic ordering the Ray side's sort_values uses
        # tokenizer class = the engine's exact split set: Arrow's
        # utf8_split_whitespace splits on precisely _WHITESPACE_CODEPOINTS
        # (pinned by tests/test_corpus_pins.py::test_arrow_ws_set), while
        # RE2 '\\s' is ASCII-only — U+00A0/U+3000-class whitespace would
        # diverge. Boundary empties are dropped in SQL like the engine's
        # flat != '' mask.
        "top_terms_per_lang": (
            "WITH toks AS ("
            f"  SELECT lang, unnest(string_split_regex(lower(text),"
            f"    '{_WS_RE}+')) AS tok"
            "  FROM documents),"
            "c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n"
            "      FROM toks WHERE tok <> '' GROUP BY lang, tok),"
            "r AS (SELECT lang, tok, n, row_number() OVER ("
            "        PARTITION BY lang ORDER BY n DESC, tok ASC) AS rn"
            "      FROM c) "
            "SELECT lang, tok, n FROM r WHERE rn <= 5"
        ),
        # quantile-band quality trim: percentile_disc = sorted ascending,
        # index ceil(q*n)-1 — the exact discrete rule the Ray side's numpy
        # band aggregate implements
        "length_band_filter": (
            "WITH q AS (SELECT lang,"
            "  CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)"
            "       AS BIGINT) AS lo,"
            "  CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)"
            "       AS BIGINT) AS hi"
            "  FROM documents GROUP BY lang) "
            "SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars "
            "FROM documents d JOIN q USING (lang) "
            "WHERE d.n_chars >= q.lo AND d.n_chars <= q.hi"
        ),
        # flagship exact-edge slice: content key = whitespace-stripped text
        # for usable text (B7), else the url-prefixed fallback key (the
        # fingerprint dispatch's 'url' modality, fingerprint_stage.py) —
        # the CASE mirrors is_valid_text + canonicalize exactly (constants
        # imported from textnorm above). Hub = min url per multi-member
        # content group; members link to the hub at score 100 (F4).
        "repost_exact_edges": (
            f"WITH all_docs AS (SELECT doc_id, text FROM documents "
            f"UNION ALL SELECT doc_id + {_SHIFT}, text FROM documents),"
            "c AS ("
            "  SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,"
            f"    CASE WHEN text IN ({_SENTINELS_SQL})"
            "      THEN 'url:doc://' || CAST(doc_id AS VARCHAR)"
            f"      ELSE regexp_replace(text, '{_WS_RE}', '', 'g') END AS key"
            "  FROM all_docs),"
            "g AS (SELECT key, MIN(url) AS hub FROM c"
            "      GROUP BY key HAVING COUNT(*) > 1) "
            "SELECT g.hub AS url_a, c.url AS url_b,"
            "  CAST(100 AS DOUBLE) AS score "
            "FROM g JOIN c ON c.key = g.key AND c.url <> g.hub"
        ),
        "knn_cosine": (
            "SELECT query_id, neighbor_id FROM ("
            "  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,"
            "         row_number() OVER (PARTITION BY q.vec_id"
            "           ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,"
            "                    e.vec_id ASC) AS rn"
            f"  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id"
            f"  WHERE q.vec_id IN ({_Q_IDS})"
            ") WHERE rn <= 10"
        ),
        "embedding_dup_pairs": (
            f"WITH all_vecs AS (SELECT vec_id, label, embedding FROM embeddings "
            f"UNION ALL SELECT vec_id + {_SHIFT}, label, embedding FROM embeddings) "
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM all_vecs a JOIN all_vecs b ON a.label = b.label AND a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.99"
        ),
        "session_counts": (
            "WITH e AS ("
            "  SELECT user_id, ts, event_id,"
            "    CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE"
            "         THEN 1 ELSE 0 END AS brk"
            "  FROM events WINDOW w AS ("
            "    PARTITION BY user_id ORDER BY ts, event_id)),"
            "s AS ("
            "  SELECT user_id,"
            "    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id"
            "      ROWS UNBOUNDED PRECEDING) AS session_id"
            "  FROM e) "
            "SELECT user_id, CAST(session_id AS BIGINT) AS session_id,"
            "  CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM s GROUP BY user_id, session_id"
        ),
        # hopping windows: 1h size / 30min hop = exactly two integer window
        # assignments per event; epoch_us keeps everything BIGINT-exact.
        # Window start uses FLOOR division written as the integer floor-mod
        # identity e - ((e % k) + k) % k, because DuckDB's // truncates
        # toward zero while the Ray side's numpy int64 // floors — they
        # disagree on pre-1970 (negative epoch_us) events.
        "hopping_window_counts": (
            "WITH w AS ("
            "  SELECT event_type,"
            "    epoch_us(ts) - ((epoch_us(ts) % 1800000000) + 1800000000)"
            "      % 1800000000 AS window_start"
            "  FROM events"
            "  UNION ALL"
            "  SELECT event_type,"
            "    epoch_us(ts) - ((epoch_us(ts) % 1800000000) + 1800000000)"
            "      % 1800000000 - 1800000000"
            "  FROM events) "
            "SELECT event_type, window_start, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM w GROUP BY event_type, window_start"
        ),
        # streaming debounce: keep iff the previous same-(user,type) event
        # in (ts, event_id) order is > 30 min older or absent; LAG compares
        # against the previous EVENT (kept or not) — both sides integer-µs
        "window_dedup_events": (
            "WITH o AS ("
            "  SELECT event_id, user_id, event_type, ts,"
            "    lag(ts) OVER (PARTITION BY user_id, event_type"
            "      ORDER BY ts, event_id) AS pts"
            "  FROM events) "
            "SELECT event_id, user_id, event_type, ts FROM o "
            "WHERE pts IS NULL OR epoch_us(ts) - epoch_us(pts) > 1800000000"
        ),
        # bounded range join: strictly-after, inclusive upper bound —
        # mirrors the Ray side's (lo, hi] searchsorted interval exactly
        "range_join_events": (
            "SELECT l.event_id AS left_event_id, r.event_id AS right_event_id "
            "FROM events l JOIN events r ON r.user_id = l.user_id "
            "WHERE l.event_type = 'click' AND r.event_type = 'error' "
            "  AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 15 MINUTE"
        ),
        # backward as-of join; LATERAL keeps the tie-break (max ts, then max
        # event_id) explicit — deterministic on both sides
        "asof_join_events": (
            "SELECT p.event_id, p.user_id, p.ts, "
            "v.event_id AS view_event_id, v.ts AS view_ts "
            "FROM events p LEFT JOIN LATERAL ("
            "  SELECT event_id, ts FROM events v"
            "  WHERE v.user_id = p.user_id AND v.event_type = 'view'"
            "    AND v.ts <= p.ts"
            "  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) v ON TRUE "
            "WHERE p.event_type = 'purchase'"
        ),
        "tombstone_anti_join": (
            "SELECT event_id, user_id FROM events WHERE user_id NOT IN "
            "(SELECT DISTINCT user_id FROM events "
            " WHERE event_type = 'error' AND value > 200)"
        ),
        "lang_filter": (
            "SELECT doc_id, lang FROM documents WHERE lang NOT IN ('zh', 'fr')"
        ),
        # B6 normalize_url mirrored in SQL string functions: (1) drop the
        # youtube share suffix, (2) strip from '#', (3) lowercase
        # scheme+host (up to the first '/' after '://'; whole string when
        # host-only; untouched when no '://' or when it LEADS the string —
        # python find()>0). strpos is 1-based: se>=2 ≡ find()>0.
        "url_normalize": (
            "WITH u0 AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)"
            "  WHEN 0 THEN 'HTTP://WWW.Example' || CAST(doc_id AS VARCHAR)"
            "    || '.COM/Path' || CAST(doc_id AS VARCHAR) || '#Frag'"
            "  WHEN 1 THEN 'https://youtu.be/V' || CAST(doc_id AS VARCHAR)"
            "    || '?x=1&feature=youtu.be'"
            "  WHEN 2 THEN 'ftp://Mixed.Case' || CAST(doc_id AS VARCHAR)"
            "    || '.Net'"
            "  ELSE 'no scheme here ' || CAST(doc_id AS VARCHAR) END AS url"
            "  FROM documents),"
            "u1 AS (SELECT doc_id,"
            "  replace(url, '&feature=youtu.be', '') AS u FROM u0),"
            "u2 AS (SELECT doc_id, CASE WHEN strpos(u, '#') > 0"
            "  THEN substr(u, 1, strpos(u, '#') - 1) ELSE u END AS u FROM u1),"
            "u3 AS (SELECT doc_id, u, strpos(u, '://') AS se FROM u2),"
            "u4 AS (SELECT doc_id, u, se, CASE WHEN se >= 2 THEN"
            "  CASE WHEN strpos(substr(u, se + 3), '/') > 0"
            "    THEN se + strpos(substr(u, se + 3), '/') + 1"
            "    ELSE length(u) END ELSE 0 END AS he FROM u3) "
            "SELECT doc_id, CASE WHEN se >= 2"
            "  THEN lower(substr(u, 1, he)) || substr(u, he + 1)"
            "  ELSE u END AS url_norm FROM u4"
        ),
        "source_reclassify": (
            "WITH rescanned AS ("
            "  SELECT doc_id, CASE doc_id % 5 WHEN 0 THEN 'top' "
            "    WHEN 1 THEN 'hot' WHEN 2 THEN 'new' ELSE source END AS source"
            "  FROM documents),"
            "all_docs AS ("
            "  SELECT doc_id, source FROM documents"
            "  UNION ALL SELECT doc_id, source FROM rescanned),"
            "ranked AS ("
            "  SELECT doc_id, (CASE source WHEN 'top' THEN '3' "
            "    WHEN 'hot' THEN '2' WHEN 'new' THEN '1' ELSE '0' END "
            "    || '|' || source) AS r FROM all_docs) "
            "SELECT doc_id, substring(MAX(r), 3) AS source_resolved "
            "FROM ranked GROUP BY doc_id"
        ),
        # text_analysis / knn_ivf / knn_lsh / repost_* / media_features:
        # intentionally omitted (heuristic, approximate, or full-pipeline
        # outputs over the synthetic corpus) -> rows-only check; each is
        # value-pinned by pytest instead. simhash_dedup_clusters and
        # minhash_dedup_clusters ARE oracled above (recursive-CTE closure).
    })
    return out
