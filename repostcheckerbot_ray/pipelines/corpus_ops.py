"""Corpus-curation operators over the `documents` / `events` tables.

The training-data-pipeline operator set that extends the reference's
match-only capability (SURVEY.md §2.E8 note): exact + near deduplication
(MinHash-LSH, SimHash, n-gram Jaccard), language ID, quality scoring, token
counting, document fingerprinting, TTL filters, windowed event aggregates.
Each public function takes ``sf_dir`` and returns a Dataset/Table — they are
the `queries()` entries in `__ray_entry__.py`, most with a DuckDB oracle.

Scale discipline: reads prune columns; per-batch kernels are
pyarrow.compute / numpy; stateful shingling runs in an actor pool with a
token-hash cache; near-dup candidate pairs are verified DISTRIBUTED via
the stages.pair_join keyed exchanges (texts routed once through the union
join, scored per pair_part group — no driver pair set, no broadcast text
dict; candidates ≪ corpus is the LSH contract); actor pools and exchange
part counts size to both the cluster and the input (parquet-metadata row
counts); only pair/cluster-sized results ever reach the driver.

The ``with_copies`` helper unions the table with an id-shifted exact copy of
itself: a deterministic self-contained duplicate injection so the dedup
operators have non-trivial, SQL-predictable output on testdata that contains
no natural duplicates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.scoring import hamming64_matrix
from ..functions.textnorm import NONWS_RUN_REGEX, WS_REGEX_CLASS
from ..functions.textstats import (
    doc_fingerprint,
    lang_id,
    quality_features,
    quality_score,
)
COPY_SHIFT = 100_000
TTL_CUTOFF = "2024-01-15 00:00:00"


# shared cluster-sizing helpers live in pipelines.__init__ (infra, imported
# by stages too); kept under the old private names for in-module use
from . import cluster_cpus as _cluster_cpus  # noqa: E402
from . import pool_size as _pool_size  # noqa: E402


def _table_rows(sf_dir: str, table: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _n_parts(n_rows: int | None = None) -> int:
    """Part count for keyed exchanges (hash(key) % P): up to 2× CPUs so no
    stage is capped below cluster parallelism, but never more parts than
    the input can fill (~4096 rows per part minimum — measured on this
    host, 64 parts over a 5k-doc table costs ~1.6× the 16-part run in
    group-dispatch/exchange overhead). Results are P-invariant (the key
    function keeps all rows of a band/user together regardless of P)."""
    cap = max(32, 2 * _cluster_cpus())
    if n_rows is None:
        return cap
    return max(16, min(cap, n_rows // 4096))


def _strip_schema_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy); see :func:`bare_schema`."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def bare_schema(path: str, columns: list[str] | None = None) -> "pa.Schema":
    """Metadata-free read schema for a parquet file. Parquet written by
    pandas embeds a 'pandas' JSON blob in the schema; pa.Schema with that
    blob is UNHASHABLE, which knocks Ray's block-concat schema dedup off
    its fast path and logs 'Failed to hash the schemas' once per reduce
    task. Passing an explicit bare schema to read_parquet drops the blob
    at the source — no extra operator, limit pushdown intact."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(path)
    names = columns if columns is not None else sch.names
    return pa.schema([sch.field(n).remove_metadata() for n in names])


def _read(sf_dir: str, table: str, columns: list[str]):
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    return rd.read_parquet(path, columns=columns,
                           schema=bare_schema(path, columns))


def with_copies(ds, id_col: str = "doc_id", shift: int = COPY_SHIFT):  # noqa: ANN001
    """ds ∪ exact copy with ids shifted by ``shift`` (E7 union + dup source)."""

    def shifted(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index(id_col),
            id_col,
            pc.add(batch[id_col], shift),
        )

    return ds.union(ds.map_batches(shifted, batch_format="pyarrow", zero_copy_batch=True))


# --------------------------------------------------------------------------
# relational / aggregate ops (SQL-oracled)
# --------------------------------------------------------------------------

def exact_dedup_by_key(sf_dir: str):
    """E3 on a composite key: min doc_id per (source, lang) group."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])
    from ray.data.aggregate import Min

    return ds.groupby(["source", "lang"]).aggregate(Min("doc_id", alias_name="doc_id"))


def exact_dedup_text(sf_dir: str):
    """E3+E7: exact text dedup over documents ∪ id-shifted copy — keep min
    doc_id per distinct text (hash-partitioned groupby; the D1 pattern)."""
    ds = with_copies(_read(sf_dir, "documents", ["doc_id", "text"]))
    from ray.data.aggregate import Min

    return ds.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))


def lang_counts(sf_dir: str):
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


def source_doc_stats(sf_dir: str):
    """Pre-aggregable per-source stats (partial-combine pattern: the
    per-batch partials keep the shuffle tiny)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        g = batch.group_by("source").aggregate([("n_chars", "sum"), ("n_chars", "count")])
        return pa.table(
            {
                "source": g["source"],
                "chars_part": g["n_chars_sum"],
                "n_part": _pc.cast(g["n_chars_count"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("source").aggregate(
        Sum("chars_part", alias_name="total_chars"),
        Sum("n_part", alias_name="n_docs"),
    )


def top_k_longest(sf_dir: str, k: int = 20):
    """E6 engine extension: global top-k by length (deterministic doc_id
    tiebreak)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(k)


def top_k_per_source(sf_dir: str, k: int = 3):
    """Grouped top-k — the curation staple "keep the k best docs per
    domain" (here: longest per source, deterministic doc_id tiebreak).
    One keyed exchange; the per-group head-k is a vectorized sort + slice.
    Each group's output is k rows, so the result is tiny regardless of
    corpus size; skew = docs per source bounds one group."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def head_k(group: pa.Table) -> pa.Table:
        g = group.sort_by([("n_chars", "descending"), ("doc_id", "ascending")])
        return g.slice(0, k)

    return (ds.groupby("source").map_groups(head_k, batch_format="pyarrow")
            .select_columns(["source", "doc_id", "n_chars"]))


_QUANTILES = (0.5, 0.9)


def source_length_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (quality-distribution profiling
    per source). percentile_disc semantics — sorted ascending, index
    ceil(q·n)−1 — matching DuckDB/Postgres exactly, so the oracle compares
    integer-exact. One keyed exchange; per-group work is one numpy sort.
    (Exact quantiles need the group's values together — the documented
    partitioning assumption; a sketch (t-digest/KLL) is the approximate
    alternative when even one group outgrows a node.)"""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def quants(group: pa.Table) -> pa.Table:
        s = np.sort(group["n_chars"].to_numpy(zero_copy_only=False))
        n = len(s)
        row = {"source": [group["source"][0].as_py()],
               "n_docs": [np.int64(n)],
               "min_chars": [np.int64(s[0])],
               "max_chars": [np.int64(s[-1])]}
        for q in _QUANTILES:
            idx = max(0, int(np.ceil(q * n)) - 1)
            row[f"p{int(q * 100)}_chars"] = [np.int64(s[idx])]
        return pa.table(row)

    return (ds.groupby("source").map_groups(quants, batch_format="pyarrow")
            .select_columns(["source", "n_docs", "min_chars", "p50_chars",
                             "p90_chars", "max_chars"]))


def contamination_check(sf_dir: str):
    """Train/test DECONTAMINATION — the exact-overlap check an LLM data
    pipeline runs before training: emit the train doc_ids whose text
    appears VERBATIM in the benchmark/eval stream. Benchmark here is the
    deterministic stand-in the dedup family uses (id-shifted exact copies,
    of every 3rd doc), so the expected hit set is SQL-predictable while
    both engines still execute the real join.

    Shape note: BOTH sides are corpus-scale, so no broadcast anywhere —
    one part-keyed exchange (part = siphash(text) % P) co-locates equal
    texts and the in-group semi-join is a vectorized isin. This is the
    large-large equi-join shape, distinct from the broadcast anti-join
    (tombstones) and the blocked similarity joins."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts(_table_rows(sf_dir, "documents"))

    def bench_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids % 3 == 0))
        return t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                            pc.add(t["doc_id"], COPY_SHIFT))

    def add_part(batch: pa.Table) -> pa.Table:
        txt = np.asarray(batch["text"].to_numpy(zero_copy_only=False),
                         dtype=object)
        h = pd.util.hash_array(txt, categorize=False)
        return batch.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))

    def semi(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        is_train = df["doc_id"] < COPY_SHIFT
        bench = df.loc[~is_train, "text"]
        hit = df.loc[is_train & df["text"].isin(bench), "doc_id"]
        return pa.table({"doc_id": pa.array(np.sort(hit.to_numpy()),
                                            pa.int64())})

    both = ds.union(ds.map_batches(bench_side, batch_format="pyarrow",
                                   zero_copy_batch=True))
    rows = both.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)
    return rows.groupby("part").map_groups(semi, batch_format="pyarrow")


def top_terms_per_lang(sf_dir: str, k: int = 5):
    """Corpus vocabulary profile: the k most frequent whitespace tokens per
    language (count EVERY occurrence, lowercased; ties broken by token asc
    — deterministic, mirrors the oracle's row_number ordering exactly).

    Combiner pattern: each batch folds its token stream into (lang, tok, n)
    partials (pandas C groupby), so the wide exchange moves vocab-sized
    partials, never the token stream; the final per-lang top-k runs over
    the tiny aggregated relation."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        # tokens = maximal non-whitespace runs over the EXPLICIT isspace()
        # codepoint class (RE2) — not utf8_split_whitespace, whose Unicode
        # property lookup flakes in workers on this host (see
        # textnorm.WS_REGEX_CLASS). Lowercasing runs on the flat token
        # array via CPython (deterministic, mirrors the oracle's lower()).
        toks = pc.split_pattern_regex(batch["text"], WS_REGEX_CLASS + "+")
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(
            pc.list_flatten(toks).to_numpy(zero_copy_only=False),
            dtype=object)
        langs = np.repeat(
            np.asarray(batch["lang"].to_pylist(), dtype=object), reps)
        # regex split emits boundary empties ('' around leading/trailing
        # whitespace) — Python str.split() never does; drop them
        mask = flat != ""
        g = (pd.DataFrame({"lang": langs[mask],
                           "tok": pd.Series(flat[mask], dtype=object)
                           .str.lower().to_numpy()})
             .groupby(["lang", "tok"], sort=False).size())
        idx = g.index
        return pa.table({
            "lang": pa.array(idx.get_level_values(0), pa.string()),
            "tok": pa.array(idx.get_level_values(1), pa.string()),
            "n": pa.array(g.to_numpy(np.int64), pa.int64()),
        })

    agg = ds.map_batches(partial_counts, batch_format="pyarrow",
                         zero_copy_batch=True).groupby(
        ["lang", "tok"]).aggregate(Sum("n", alias_name="n"))

    def topk(group: pa.Table) -> pa.Table:
        df = (group.to_pandas()
              .sort_values(["n", "tok"], ascending=[False, True]).head(k))
        return pa.table({"lang": pa.array(df["lang"], pa.string()),
                         "tok": pa.array(df["tok"], pa.string()),
                         "n": pa.array(df["n"].to_numpy(np.int64), pa.int64())})

    return agg.groupby("lang").map_groups(topk, batch_format="pyarrow")


def length_band_filter(sf_dir: str, lo_q: float = 0.05, hi_q: float = 0.95):
    """Quantile-band quality filter: keep docs whose n_chars lies inside
    the per-lang [p5, p95] discrete-quantile band — the standard
    outlier-trim before training. Aggregate-then-broadcast shape: the
    per-lang band relation (one row per lang) comes from one pruned keyed
    exchange (exact discrete quantiles need the group's values together,
    same contract as source_length_quantiles), broadcasts once via
    ray.put, and applies as a map-side filter — the corpus never
    shuffles. percentile_disc semantics (sorted asc, index ceil(q·n)−1)
    keep the oracle integer-exact."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def band(group: pa.Table) -> pa.Table:
        s = np.sort(group["n_chars"].to_numpy(zero_copy_only=False))
        n = len(s)
        lo = s[max(0, int(np.ceil(lo_q * n)) - 1)]
        hi = s[max(0, int(np.ceil(hi_q * n)) - 1)]
        return pa.table({"lang": pa.array([group["lang"][0].as_py()],
                                          pa.string()),
                         "lo": pa.array([int(lo)], pa.int64()),
                         "hi": pa.array([int(hi)], pa.int64())})

    bands = (ds.select_columns(["lang", "n_chars"])
             .groupby("lang").map_groups(band, batch_format="pyarrow"))
    lo_map: dict = {}
    hi_map: dict = {}
    for b in bands.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for lg, lo, hi in zip(b["lang"].to_pylist(), b["lo"].to_pylist(),
                              b["hi"].to_pylist()):
            lo_map[lg] = lo
            hi_map[lg] = hi
    ref = ray.put((lo_map, hi_map))

    def keep(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lo_m, hi_m = ray.get(ref)
        s = pd.Series(batch["lang"].to_pylist(), dtype=object)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = s.map(lo_m).to_numpy(np.int64)
        hi = s.map(hi_m).to_numpy(np.int64)
        m = pa.array((nch >= lo) & (nch <= hi))
        out = batch.filter(m)
        return pa.table({"doc_id": out["doc_id"], "lang": out["lang"],
                         "n_chars": pc.cast(out["n_chars"], pa.int64())})

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def url_normalize(sf_dir: str):
    """B6 URL normalizer driver-green (previously unit-pinned only): build
    a deterministic URL per doc covering every branch of
    functions.textnorm.normalize_url — the youtube share suffix, fragment
    strip, mixed-case scheme/host lowering (path case preserved), a
    host-only URL, and a non-URL string — then apply the REAL function.
    The DuckDB oracle re-implements the same three steps in SQL string
    functions, so the whole normalization contract is value-checked
    end-to-end. (Per-string Python is fine here: this is the B6 parity
    showcase, not a hot path — the flagship touches normalize_url only on
    url-modality rows.)"""
    from ..functions.textnorm import normalize_url

    ds = _read(sf_dir, "documents", ["doc_id"])

    def build_and_norm(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        urls = []
        for i in ids.tolist():
            m = i % 4
            if m == 0:
                urls.append(f"HTTP://WWW.Example{i}.COM/Path{i}#Frag")
            elif m == 1:
                urls.append(f"https://youtu.be/V{i}?x=1&feature=youtu.be")
            elif m == 2:
                urls.append(f"ftp://Mixed.Case{i}.Net")  # host-only, no path
            else:
                urls.append(f"no scheme here {i}")       # find('://') < 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "url_norm": pa.array([normalize_url(u) for u in urls],
                                 pa.string()),
        })

    return ds.map_batches(build_and_norm, batch_format="pyarrow",
                          zero_copy_batch=True)


_SKETCH_GAMMA = 1.02  # log-bucket growth: ±2% relative rank-value error


def length_quantiles_sketch(sf_dir: str, quantiles: tuple = (0.5, 0.9)):
    """APPROXIMATE per-source quantiles via a mergeable log-bucket
    histogram — the documented scale rung past
    :func:`source_length_quantiles` (whose exact method needs a group's
    values TOGETHER; at the scale where one group outgrows a node, ship
    fixed-size sketches instead). Each batch folds its values into
    bucket counts (bucket = ceil(log_γ v); γ=1.02 ⇒ any quantile lands
    within one bucket, i.e. ±2% of the true VALUE); partial histograms
    are vocabulary-small (one (source, bucket) row per touched bucket),
    merge by a plain SUM exchange, and the per-source quantile readout
    walks the tiny merged histogram. Deterministic, mergeable,
    error-BOUNDED — pytest gates the bound vs the exact operator
    (tests/test_corpus_pins.py); no SQL oracle (approximate by design).
    Output: (source, n_docs, p50_chars, p90_chars) with values = bucket
    upper bounds."""
    import pandas as pd
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    lg = np.log(_SKETCH_GAMMA)

    def partial_hist(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.where(v <= 1, 0,
                          np.ceil(np.log(np.maximum(v, 1)) / lg)).astype(np.int64)
        g = (pd.DataFrame({"source": batch["source"].to_pylist(),
                           "bucket": bucket})
             .groupby(["source", "bucket"], sort=False).size())
        idx = g.index
        return pa.table({
            "source": pa.array(idx.get_level_values(0), pa.string()),
            "bucket": pa.array(idx.get_level_values(1).to_numpy(np.int64),
                               pa.int64()),
            "n": pa.array(g.to_numpy(np.int64), pa.int64()),
        })

    merged = ds.map_batches(partial_hist, batch_format="pyarrow",
                            zero_copy_batch=True).groupby(
        ["source", "bucket"]).aggregate(Sum("n", alias_name="n"))

    def readout(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values("bucket")
        counts = df["n"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        row = {"source": [df["source"].iloc[0]],
               "n_docs": pa.array([total], pa.int64())}
        for q in quantiles:
            # discrete-quantile rank (ceil(q*n)), read from the cumulative
            # histogram; value = the bucket's upper bound γ^bucket
            rank = max(1, int(np.ceil(q * total)))
            b = int(df["bucket"].to_numpy()[np.searchsorted(cum, rank)])
            row[f"p{int(q * 100)}_chars"] = pa.array(
                [int(round(_SKETCH_GAMMA ** b))], pa.int64())
        return pa.table(row)

    return merged.groupby("source").map_groups(readout, batch_format="pyarrow")


def token_counts(sf_dir: str):
    """Whitespace token count, fully vectorized: ONE RE2 kernel counting
    maximal non-whitespace runs — exactly len(text.split()) over the
    explicit isspace() codepoint class (textnorm.NONWS_RUN_REGEX; shared
    with the oracle's regexp_extract_all, so parity is engine-level)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], NONWS_RUN_REGEX)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def bpe_token_counts(sf_dir: str):
    """BPE-ish pre-tokenizer count (alpha runs | digit runs | single
    symbols), fully vectorized: ``pc.count_substring_regex`` runs the same
    RE2 engine DuckDB uses, so the oracle is engine-level exact. The Python
    definition lives in ``textstats.token_count_bpeish`` (unit-pinned equal)."""
    from ..functions.textstats import BPEISH_PATTERN

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], BPEISH_PATTERN)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def char_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats(sf_dir: str):
    """C4-style repetition quality signal, fully vectorized: per doc, total
    vs distinct whitespace-token counts and a repetitive flag
    (distinct*2 < total). Token identity matches the SQL oracle's
    regex-split exactly; all outputs are integers/bools so the value-hash
    compare is exact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        # tokens = non-empty runs over the explicit isspace() class (RE2 —
        # see textnorm.WS_REGEX_CLASS for why not utf8_split_whitespace);
        # boundary empties from the regex split are dropped by the mask,
        # which also zeroes empty/whitespace-only docs
        toks = pc.split_pattern_regex(
            batch["text"], WS_REGEX_CLASS + "+").combine_chunks()
        vl = toks.value_lengths().to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(batch.num_rows), vl)
        keep = np.asarray(flat, dtype=object) != ""
        flat, doc_idx = flat[keep], doc_idx[keep]
        counts = np.bincount(doc_idx, minlength=batch.num_rows).astype(np.int64)
        if len(flat):
            _, codes = np.unique(flat, return_inverse=True)
            pair = doc_idx.astype(np.int64) * (codes.max() + 1) + codes
            uniq_pairs = np.unique(pair)
            distinct = np.bincount((uniq_pairs // (codes.max() + 1)).astype(np.int64),
                                   minlength=batch.num_rows)
        else:
            distinct = np.zeros(batch.num_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(counts, pa.int64()),
                "n_distinct": pa.array(distinct.astype(np.int64), pa.int64()),
                "is_repetitive": pa.array(distinct * 2 < counts),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def ttl_filter_events(sf_dir: str):
    """B9/E5 generalization: timestamp-predicate filter at the read."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])
    cutoff = pa.scalar(np.datetime64(TTL_CUTOFF.replace(" ", "T"), "us"), pa.timestamp("us"))
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["ts"], cutoff)),
        batch_format="pyarrow", zero_copy_batch=True,
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def session_counts(sf_dir: str):
    """Gap-based session windows per user (the streaming-session analogue
    on a batch engine): events sorted per user by (ts, event_id); a gap
    > 30 min starts a new session; output one row per (user, session) with
    its event count. Keyed exchange on part = hash(user_id) % P (P sized to
    the cluster), NOT raw user_id — the house rule (see _candidate_pairs_ds
    / dedup_edges): one group per user would mean one Python dispatch per
    user; here all users of a part are sessionized in ONE vectorized pass
    over the (user, ts)-sorted part."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_parts = _n_parts(_table_rows(sf_dir, "events"))

    def add_part(batch: pa.Table) -> pa.Table:
        from ..functions.fingerprint import splitmix64

        # full bit mixing (splitmix64), NOT a bare multiply — a multiply
        # mod 32 only permutes the low 5 bits, so stride-allocated ids
        # would all land in one part
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = splitmix64(uid) % np.uint64(n_parts)
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    def sessions(group: pa.Table) -> pa.Table:
        g = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user.copy()
        if len(ts) > 1:
            brk[1:] |= np.diff(ts) > SESSION_GAP_US
        counts = np.bincount(np.cumsum(brk) - 1)  # events per session run
        starts = np.flatnonzero(brk)
        # session_id restarts at 0 per user: sessions of a user are
        # contiguous in `starts`, so subtract each run's first index
        first_of_user = np.where(new_user[starts],
                                 np.arange(len(starts)), 0)
        sid = np.arange(len(starts)) - np.maximum.accumulate(first_of_user)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_id": pa.array(sid.astype(np.int64), pa.int64()),
                "n_events": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(n_parts).groupby("part").map_groups(
                sessions, batch_format="pyarrow")
            .select_columns(["user_id", "session_id", "n_events"]))


DEBOUNCE_WINDOW_US = 30 * 60 * 1_000_000  # 30-min debounce


def window_dedup_events(sf_dir: str, window_us: int = DEBOUNCE_WINDOW_US):
    """Windowed streaming dedup (debounce): keep an event iff the previous
    event of the SAME (user, type) — in (ts, event_id) order — is more than
    ``window_us`` older (or absent). The batch form of a streaming
    dedup-with-TTL-state operator: one keyed exchange co-locates each
    user's events, then one numpy diff pass per part decides every row —
    no per-event state machine. Ties (equal ts) deterministically drop the
    higher event_id (diff 0 ≤ window). Integer epoch math, SQL-exact vs
    the LAG-window oracle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_parts(_table_rows(sf_dir, "events"))

    def add_part(batch: pa.Table) -> pa.Table:
        from ..functions.fingerprint import splitmix64

        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = splitmix64(uid) % np.uint64(n_parts)
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    def debounce(group: pa.Table) -> pa.Table:
        g = group.sort_by([("user_id", "ascending"),
                           ("event_type", "ascending"),
                           ("ts", "ascending"), ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        typ = np.asarray(g["event_type"].to_numpy(zero_copy_only=False),
                         dtype=object)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_run = np.r_[True, (uid[1:] != uid[:-1]) | (typ[1:] != typ[:-1])]
        keep = new_run.copy()
        if len(ts) > 1:
            keep[1:] |= np.diff(ts) > window_us
        return g.filter(pa.array(keep)).select(
            ["event_id", "user_id", "event_type", "ts"])

    return (ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("part").map_groups(debounce, batch_format="pyarrow"))


RANGE_JOIN_WINDOW_US = 15 * 60 * 1_000_000  # 15-min range


def _user_ts_keys(uid: np.ndarray, ts: np.ndarray, pad: int) -> np.ndarray | None:
    """Composite monotonic int64 key for (user, ts)-sorted temporal joins:
    ``rank(user) * span + (ts - ts_min)`` with ``span > ts_span + pad``, so
    one part-wide ``searchsorted`` replaces the per-user segment loop (a
    key + pad can never cross into the next user's key band). Returns None
    when ``n_users * span`` would overflow int64 — callers fall back to
    the per-user loop (only reachable for parts spanning both millions of
    users AND centuries of microseconds)."""
    if len(ts) == 0:
        return None
    tmin = int(ts.min())
    span = int(ts.max()) - tmin + int(pad) + 2
    uu, rank = np.unique(uid, return_inverse=True)
    if len(uu) * span >= 2 ** 62:
        return None
    return rank.astype(np.int64) * np.int64(span) + (ts - np.int64(tmin))


def range_join_events(sf_dir: str, left_type: str = "click",
                      right_type: str = "error",
                      window_us: int = RANGE_JOIN_WINDOW_US):
    """Bounded-range temporal join (range join Ray Data lacks natively):
    pair every ``left_type`` event with every ``right_type`` event of the
    SAME user whose ts falls in ``(left.ts, left.ts + window]`` — "errors
    within 15 minutes after a click". Co-partitioned by
    ``hash(user_id) % 32`` like the as-of join; within a part the matches
    per left row are one ``searchsorted`` interval over the user's
    ts-sorted right rows (no quadratic scan). Output cardinality is the
    true join size — bounded by the window, not by group size."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_parts(_table_rows(sf_dir, "events"))

    def add_part(batch: pa.Table) -> pa.Table:
        from ..functions.fingerprint import splitmix64

        t = batch.filter(pc.is_in(batch["event_type"],
                                  value_set=pa.array([left_type, right_type])))
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = splitmix64(uid) % np.uint64(n_parts)
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def rjoin(group: pa.Table) -> pa.Table:
        g = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        is_l = np.asarray(g["event_type"].to_numpy(zero_copy_only=False)
                          == left_type)
        la = lb = np.empty(0, np.int64)
        # composite (user, ts) key: ONE part-wide searchsorted replaces the
        # per-user segment loop; the span pad ≥ window guarantees a left
        # key + window never reaches the next user's key band, so both
        # bounds stay same-user with no validity mask
        key = _user_ts_keys(uid, ts, window_us)
        l_idx = np.flatnonzero(is_l)
        r_idx = np.flatnonzero(~is_l)
        if key is not None and len(l_idx) and len(r_idx):
            rkey = key[r_idx]
            lo = np.searchsorted(rkey, key[l_idx], side="right")  # strictly after
            hi = np.searchsorted(rkey, key[l_idx] + window_us, side="right")
            # vectorized emission: each left row k pairs with the interval
            # r_idx[lo[k]:hi[k]] — np.repeat the left ids by interval length
            # and reconstruct the flat interval indices from offsets
            counts = hi - lo
            total = int(counts.sum())
            if total:
                la = np.repeat(eid[l_idx], counts)
                off = np.cumsum(counts) - counts  # interval starts in flat
                flat = np.repeat(lo, counts) + (np.arange(total)
                                                - np.repeat(off, counts))
                lb = eid[r_idx[flat]]
        elif len(l_idx) and len(r_idx):  # int64-overflow fallback: per-user
            la_parts, lb_parts = [], []
            starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
            ends = np.r_[starts[1:], len(uid)]
            for s_, e_ in zip(starts, ends):
                li = np.flatnonzero(is_l[s_:e_]) + s_
                ri = np.flatnonzero(~is_l[s_:e_]) + s_
                if len(li) == 0 or len(ri) == 0:
                    continue
                rts = ts[ri]
                lo = np.searchsorted(rts, ts[li], side="right")
                hi = np.searchsorted(rts, ts[li] + window_us, side="right")
                counts = hi - lo
                total = int(counts.sum())
                if total == 0:
                    continue
                la_parts.append(np.repeat(eid[li], counts))
                off = np.cumsum(counts) - counts
                flat = np.repeat(lo, counts) + (np.arange(total)
                                                - np.repeat(off, counts))
                lb_parts.append(eid[ri[flat]])
            if la_parts:
                la = np.concatenate(la_parts)
                lb = np.concatenate(lb_parts)
        return pa.table(
            {
                "left_event_id": pa.array(la.astype(np.int64), pa.int64()),
                "right_event_id": pa.array(lb.astype(np.int64), pa.int64()),
            }
        )

    rows = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return rows.groupby("part").map_groups(rjoin, batch_format="pyarrow")


HOP_US = 1_800 * 1_000_000          # 30-min hop
WINDOW_US = 2 * HOP_US              # 1-h windows -> each event in exactly 2


def hopping_window_counts(sf_dir: str):
    """Hopping (sliding) window aggregate: 1-hour windows every 30 minutes,
    count per (event_type, window_start). window = 2 x hop, so each event
    lands in exactly two windows — emitted as two assignment rows, partially
    aggregated per batch (combiner), then one small groupby-sum exchange.
    window_start is emitted as BIGINT epoch-microseconds so the compare with
    the SQL oracle is integer-exact."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w0 = (ts // HOP_US) * HOP_US
        et = batch["event_type"]
        both = pa.table(
            {
                "event_type": pa.concat_arrays(
                    [et.combine_chunks(), et.combine_chunks()]),
                "window_start": pa.array(np.concatenate([w0, w0 - HOP_US]),
                                         pa.int64()),
            }
        )
        g = both.group_by(["event_type", "window_start"]).aggregate(
            [([], "count_all")])
        return pa.table(
            {
                "event_type": g["event_type"],
                "window_start": g["window_start"],
                "n_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    partials = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_part", alias_name="n"))


def asof_join_events(sf_dir: str, probe_type: str = "purchase",
                     ref_type: str = "view"):
    """Backward AS-OF join (temporal join Ray Data lacks natively): each
    ``probe_type`` event gets the latest ``ref_type`` event of the SAME
    user with ``ref.ts <= probe.ts`` (ties broken by max event_id — fully
    deterministic, matching the SQL oracle's ORDER BY ts DESC, event_id
    DESC LIMIT 1). LEFT semantics: probes with no prior reference keep
    nulls.

    Partitioning assumption (documented per the custom-operator rule): both
    sides co-partition by ``hash(user_id) % P`` (P sized to the cluster) —
    one keyed exchange of the two pruned event subsets; within a part the
    join is a per-user numpy ``searchsorted`` over (ts, event_id)-sorted
    reference rows. Skew = events per user; a pathological single hot user
    bounds one group.
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = _n_parts(_table_rows(sf_dir, "events"))

    def add_part(batch: pa.Table) -> pa.Table:
        from ..functions.fingerprint import splitmix64

        t = batch.filter(pc.is_in(batch["event_type"],
                                  value_set=pa.array([probe_type, ref_type])))
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = splitmix64(uid) % np.uint64(n_parts)
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def asof(group: pa.Table) -> pa.Table:
        g = group.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        is_ref = np.asarray(g["event_type"].to_numpy(zero_copy_only=False)
                            == ref_type)
        P = np.flatnonzero(~is_ref)
        r_idx = np.flatnonzero(is_ref)
        # composite (user, ts) key: ONE part-wide searchsorted; refs with
        # equal key (ts ties) sort by event_id, so pos-1 is the max-(ts,
        # id) ref — same tie-break as the oracle. pos-1 can cross into the
        # PREVIOUS user's band (probe's user has no prior ref), hence the
        # same-user validity mask.
        key = _user_ts_keys(uid, ts, 0)
        if len(P) == 0 or len(r_idx) == 0:
            R = np.zeros(len(P), dtype=np.int64)
            V = np.zeros(len(P), dtype=bool)
        elif key is not None:
            pos = np.searchsorted(key[r_idx], key[P], side="right") - 1
            R = r_idx[np.maximum(pos, 0)]
            V = (pos >= 0) & (uid[R] == uid[P])
        else:  # int64-overflow fallback: per-user segment loop
            pid_parts, rid_parts, valid_parts = [], [], []
            starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
            ends = np.r_[starts[1:], len(uid)]
            for s_, e_ in zip(starts, ends):
                ref = is_ref[s_:e_]
                p_idx = np.flatnonzero(~ref) + s_
                if len(p_idx) == 0:
                    continue
                ri = np.flatnonzero(ref) + s_
                # rows are (ts, event_id)-sorted, so searchsorted-right
                # lands after ALL refs with ts <= probe ts; -1 = the
                # max-(ts, id) one
                pos = np.searchsorted(ts[ri], ts[p_idx], side="right") - 1
                pid_parts.append(p_idx)
                valid_parts.append(pos >= 0)
                rid_parts.append(ri[np.maximum(pos, 0)] if len(ri)
                                 else np.zeros(len(p_idx), dtype=np.int64))
            if pid_parts:
                P = np.concatenate(pid_parts)
                R = np.concatenate(rid_parts)
                V = np.concatenate(valid_parts)
            else:
                P = R = np.empty(0, dtype=np.int64)
                V = np.empty(0, dtype=bool)
        null_mask = ~V
        return pa.table(
            {
                "event_id": pa.array(eid[P].astype(np.int64), pa.int64()),
                "user_id": pa.array(uid[P].astype(np.int64), pa.int64()),
                "ts": pa.array(ts[P], pa.int64()).cast(pa.timestamp("us")),
                "view_event_id": pa.array(eid[R].astype(np.int64),
                                          mask=null_mask),
                "view_ts": pa.array(ts[R], mask=null_mask).cast(
                    pa.timestamp("us")),
            }
        )

    rows = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    return rows.groupby("part").map_groups(asof, batch_format="pyarrow")


def event_window_counts(sf_dir: str):
    """Tumbling 1-day window count per event_type (streaming-shaped op on a
    batch engine: bucket column + grouped aggregate)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def bucket(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch["ts"], format="%Y-%m-%d")
        return pa.table({"event_type": batch["event_type"], "day": day})

    return ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True).groupby(
        ["event_type", "day"]
    ).aggregate(Count(alias_name="n"))


def tombstone_anti_join(sf_dir: str):
    """D5 liveness anti-join (reference re-checks each matched original and
    deletes dead ones, /root/reference/database.py:650-676): tombstones =
    users with a severe error event (value > 200); result = events of live
    users only.

    The tombstone side is computed distributed (pruned-column filter +
    distinct aggregate) and is SMALL by construction, so it broadcasts once
    via ray.put and the anti-join runs as a map-side filter — no shuffle of
    the big side (the scalable anti-join shape when the delete set ≪ corpus).
    """
    import ray

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
    dead_rows = ev.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t["event_type"], "error"),
                                   pc.greater(t["value"], 200.0)))
                   .select(["user_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).unique("user_id")
    # broadcast once as an Arrow array; pc.is_in is a C hash probe per batch
    dead_ref = ray.put(pa.array(sorted(dead_rows), pa.int64()))

    class AntiJoin:
        def __init__(self, ref) -> None:  # noqa: ANN001
            self._dead = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(batch["user_id"], value_set=self._dead))
            return batch.select(["event_id", "user_id"]).filter(keep)

    return ev.map_batches(AntiJoin, fn_constructor_args=(dead_ref,),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=(1, 4))


def lang_filter(sf_dir: str, exclude: tuple = ("zh", "fr")):
    """B3 generalization — the reference's media-provider NOT-IN predicate
    (database.py:408, 730: v.reddit iff provider ∉ {gfycat, YouTube, Imgur})
    as a content-attribute filter: documents whose lang is NOT in the set."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    bad = pa.array(list(exclude), pa.string())
    return ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["lang"], value_set=bad))),
        batch_format="pyarrow", zero_copy_batch=True,
    )


_SOURCE_RANK = {"top": "3", "hot": "2", "new": "1"}


def source_reclassify(sf_dir: str):
    """A6/D6 reclassification — the reference overwrites a logged post's
    Location when it reappears under a higher-precedence scan
    (database.py:238-248, 344-350: top > hot > new). Batch form: union the
    relation with a re-scanned copy (deterministic source remap by doc_id),
    then one grouped argmax-by-precedence per key — a column overwrite via
    aggregation instead of in-place mutation.

    Vectorized trick: precedence rank is prefixed onto the source string
    (rank '0'..'3' + '|' + source), so the per-key argmax is a plain MAX
    aggregate — no per-group Python. Both per-batch kernels are pure
    Arrow: the rescan remap is a 3-way ``pc.if_else`` chain and the rank
    prefix is built once per DISTINCT source (dictionary-encode, prefix
    the tiny dictionary, ``pc.take`` back out) — no per-row Python on the
    corpus-sized relation."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def rescanned(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mod = ids % 5
        src = pc.if_else(
            pa.array(mod == 0), pa.scalar("top", pa.string()),
            pc.if_else(
                pa.array(mod == 1), pa.scalar("hot", pa.string()),
                pc.if_else(pa.array(mod == 2), pa.scalar("new", pa.string()),
                           # mod 3/4 keep the original source (no-op path)
                           batch["source"])))
        return pa.table({"doc_id": batch["doc_id"], "source": src})

    both = ds.union(ds.map_batches(rescanned, batch_format="pyarrow",
                                   zero_copy_batch=True))

    def ranked(batch: pa.Table) -> pa.Table:
        arr = batch["source"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):  # pyarrow version portability
            arr = (arr.chunk(0) if arr.num_chunks
                   else pa.array([], pa.string()))
        enc = arr.dictionary_encode()
        vals = enc.dictionary.to_pylist()  # distinct sources: tiny
        mapped = pa.array([_SOURCE_RANK.get(s, "0") + "|" + s for s in vals],
                          pa.string())
        return pa.table({"doc_id": batch["doc_id"],
                         "r": pc.take(mapped, enc.indices)})

    agg = both.map_batches(ranked, batch_format="pyarrow",
                           zero_copy_batch=True).groupby("doc_id").aggregate(
        Max("r", alias_name="r_max"))

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "source_resolved": pc.utf8_replace_slice(
                    batch["r_max"], start=0, stop=2, replacement=""),
            }
        )

    return agg.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# text-analysis ops (heuristic → rows-only oracle)
# --------------------------------------------------------------------------

class _TextAnalyzer:
    """Actor: language-ID + quality + fingerprint in one pass (compiled
    regexes and profiles built once per actor)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        texts = batch["text"].to_pylist()
        langs, confs, scores, n_toks, fps = [], [], [], [], []
        for t in texts:
            toks = t.lower().split()
            lg, cf = lang_id(toks)
            f = quality_features(t)
            langs.append(lg)
            confs.append(round(cf, 6))
            scores.append(quality_score(f))
            n_toks.append(int(f["n_tokens"]))
            fps.append(f"{doc_fingerprint(t):016x}")
        return pa.table(
            {
                "doc_id": ids,
                "lang_pred": pa.array(langs, pa.string()),
                "lang_conf": pa.array(confs, pa.float64()),
                "quality": pa.array(scores, pa.float64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )


def text_analysis(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_TextAnalyzer, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=_pool_size(_table_rows(sf_dir, "documents")))


# --------------------------------------------------------------------------
# near-dup dedup ops
# --------------------------------------------------------------------------

class _ShingleBander:
    """Actor: doc → exploded (doc_id, band_key) MinHash-LSH rows; token-hash
    cache shared across batches. ``n_parts`` keys the downstream exchange
    (band % P) — results are P-invariant, P only sets group count."""

    def __init__(self, n_parts: int = 32) -> None:
        self._cache: dict[str, int] = {}
        self._n_parts = n_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.fingerprint import NUM_BANDS, fingerprint_text_many

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        _, _, bks = fingerprint_text_many(
            [t.lower().split() for t in texts], self._cache,
            want_simhash=False)
        band_arr = bks.ravel()
        return pa.table(
            {"doc_id": pa.array(np.repeat(ids, NUM_BANDS), pa.int64()),
             "band_key": pa.array(band_arr),
             "part": pa.array((band_arr % np.uint64(self._n_parts))
                              .astype(np.int32))}
        )


def _candidate_pairs_ds(bands_ds, max_block: int = 256, n_parts: int = 16,
                        n_band_rows: int | None = None):  # noqa: ANN001
    """Part-keyed exchange (part = band_key % P → few large groups), then a
    numpy run-scan over sorted band keys inside each part; only
    multi-occupancy bands emit pairs, deduped WITHIN the part (a pair
    surfacing in several bands of one part collapses here; cross-part
    duplicates collapse inside the verification join — no driver set
    anywhere). Grouping by raw band_key would create one group per doc-band
    (millions of singleton dispatches).

    Pair emission is the flagship scorer's shape (scoring_stage.py
    make_part_scorer): cached triu index templates per run length, one
    np.unique pass for the in-part dedup + deterministic ordering — no
    per-pair Python on the hot path."""

    def pairs_in_part(group: pa.Table) -> pa.Table:
        g = group.sort_by([("band_key", "ascending"), ("doc_id", "ascending")])
        bk = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        if len(bk):
            # defensive adjacent dedup of (band_key, doc_id) repeats
            keep = np.r_[True, (bk[1:] != bk[:-1]) | (ids[1:] != ids[:-1])]
            bk, ids = bk[keep], ids[keep]
        starts = (np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
                  if len(bk) else np.array([], dtype=np.int64))
        lens = np.minimum(np.r_[starts[1:], len(bk)] - starts, max_block)
        multi = lens >= 2  # hot runs capped at max_block (first = min ids)
        starts, lens = starts[multi], lens[multi]
        if len(starts) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        tmpl: dict[int, tuple] = {}
        a_parts, b_parts = [], []
        for s_, L in zip(starts.tolist(), lens.tolist()):
            t = tmpl.get(L)
            if t is None:
                t = np.triu_indices(L, k=1)
                tmpl[L] = t
            a_parts.append(ids[s_ + t[0]])
            b_parts.append(ids[s_ + t[1]])
        ab = np.unique(np.stack([np.concatenate(a_parts),
                                 np.concatenate(b_parts)], axis=1), axis=0)
        return pa.table({"a": pa.array(ab[:, 0], pa.int64()),
                         "b": pa.array(ab[:, 1], pa.int64())})

    from . import maybe_fast_shuffle

    # coalesce before the shuffle: sort-shuffle cost grows with block count²
    with maybe_fast_shuffle(n_band_rows):
        cands = bands_ds.repartition(n_parts).groupby("part").map_groups(
            pairs_in_part, batch_format="pyarrow")
        cands = cands.materialize()
    return cands


def _jaccard_factory(threshold: float):
    """Per-group scorer for the verification exchange: exact shingle-set
    Jaccard (matches the SQL oracle's trigram construction), with a
    per-group cache so each doc's shingle set is built once per group."""

    def factory():
        cache: dict[int, set] = {}

        def score(a, b, ta, tb):  # noqa: ANN001
            sa = cache.get(a)
            if sa is None:
                sa = _shingle_set(ta)
                cache[a] = sa
            sb = cache.get(b)
            if sb is None:
                sb = _shingle_set(tb)
                cache[b] = sb
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            return j if j >= threshold else None

        return score

    return factory


def _verified_pairs(sf_dir: str, threshold: float):
    """documents → LSH bands → candidate pairs → distributed exact-Jaccard
    verification (stages.pair_join: pairs and texts meet in ONE keyed
    exchange; scoring runs per pair_part group — no driver pair set, no
    broadcast text dict). Returns Dataset(a, b, score, part)."""
    from ..stages.pair_join import attach_via_union, verify_pairs_distributed

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts(_table_rows(sf_dir, "documents"))
    n_docs = _table_rows(sf_dir, "documents")
    bands = ds.map_batches(
        _ShingleBander, fn_constructor_kwargs={"n_parts": n_parts},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_pool_size(n_docs))
    from ..functions.fingerprint import NUM_BANDS as _NB

    cands = _candidate_pairs_ds(bands, n_parts=n_parts,
                                n_band_rows=n_docs * _NB)
    if cands.count() == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64()),
             "part": pa.array([], pa.int32())}))
    attached = attach_via_union(cands, ds, "doc_id", "text",
                                num_parts=n_parts)
    return verify_pairs_distributed(attached, _jaccard_factory(threshold))


def _assign_clusters(ds, comp: dict):  # noqa: ANN001
    """doc_id → cluster_id (min member; singletons map to themselves)."""
    import ray

    ref = ray.put(comp)

    def assign(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from ..stages.clustering import _cached_get

        m = _cached_get(ref)  # deserialized once per warm worker, not per batch
        ids = pd.Series(batch["doc_id"].to_numpy(zero_copy_only=False))
        # vectorized dict probe (one C hash pass); misses stay singletons.
        # float64 round-trip is exact here: doc_ids ≪ 2^53.
        cids = ids.map(m).fillna(ids).astype(np.int64) if m else ids
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "cluster_id": pa.array(cids.to_numpy(), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def _collect_components_ds(edges_ds, col_a: str, col_b: str) -> dict:  # noqa: ANN001
    """Edge Dataset (int64 or string keys) → {member: min-member cluster}.

    The corpus-ops twin of the flagship's closure entry point: renames to
    the url_a/url_b contract and routes through
    stages.clustering.collect_components, which auto-switches to
    distributed min-label propagation above RCB_DISTRIBUTED_CC_EDGES —
    the driver never has to hold a pathological edge relation (round-4
    VERDICT item 2). Edges are materialized first (edge-sized ≪ corpus)
    so the distributed restart never re-runs the verification DAG."""
    from ..stages.clustering import collect_components

    renamed = edges_ds.map_batches(
        lambda t: t.select([col_a, col_b]).rename_columns(["url_a", "url_b"]),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    return collect_components(renamed)


def _shingle_set(t: str) -> set:
    """Distinct token 3-grams (strictly; <3 tokens → empty set), matching
    the SQL oracle's trigram construction exactly."""
    toks = t.lower().split()
    return set(zip(toks, toks[1:], toks[2:]))


def minhash_dedup_clusters(sf_dir: str, verify_jaccard: float = 0.8):
    """MinHash-LSH near-dup clusters over documents (the table carries
    natural near-duplicates): shingle→minhash→band→groupby blocking,
    distributed exact-Jaccard verification (pair_join exchanges), union-find
    over the VERIFIED edge set only (edges ≪ corpus — the one deliberately
    centralized piece, same contract as the flagship). At b=32,r=4 the miss
    probability at J=0.8 is (1-0.8^4)^32 ≈ 5e-8 — the blocked scan is
    equivalent to the reference's full scan (database.py:389-405) at this
    threshold."""
    verified = _verified_pairs(sf_dir, verify_jaccard)
    comp = _collect_components_ds(verified, "a", "b")
    ds = _read(sf_dir, "documents", ["doc_id"])
    return _assign_clusters(ds, comp)


def minhash_dedup_keep_first(sf_dir: str, verify_jaccard: float = 0.8):
    """The DEDUPED corpus (survivor per near-dup cluster), not just the
    cluster labels: keep the min-doc_id member of every cluster —
    "per-group first", the same rule exact dedup uses. Implemented as a
    map-side filter over the cluster relation (cluster_id IS the min
    member, so survivors are exactly the rows labeling themselves — no
    second exchange)."""
    clusters = minhash_dedup_clusters(sf_dir, verify_jaccard)
    return clusters.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["cluster_id"]))
                   .select(["doc_id"]),
        batch_format="pyarrow", zero_copy_batch=True)


class _SimhashBander:
    """Actor: doc → (doc_id, simhash, band_key) rows, 4×16-bit bands
    (pigeonhole: Hamming < 4 ⇒ one band equal)."""

    N_BANDS = 4

    def __init__(self, n_parts: int = 32) -> None:
        self._cache: dict[str, int] = {}
        self._n_parts = n_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.fingerprint import fingerprint_text_many

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        _, sims, _ = fingerprint_text_many(
            [t.lower().split() for t in texts], self._cache, want_bands=False)
        nb = self.N_BANDS
        b_idx = np.arange(nb, dtype=np.uint64)
        bands = (b_idx[None, :] << np.uint64(56)) | (
            (sims[:, None] >> (b_idx[None, :] * np.uint64(16)))
            & np.uint64(0xFFFF))
        band_arr = bands.ravel()
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, nb), pa.int64()),
                "simhash": pa.array(np.repeat(sims, nb), pa.uint64()),
                "band_key": pa.array(band_arr),
                "part": pa.array((band_arr % np.uint64(self._n_parts))
                                 .astype(np.int32)),
            }
        )


def simhash_dedup_clusters(sf_dir: str, max_hamming: int = 3,
                           max_block: int = 256):
    """SimHash near-dup clusters: 16-bit-band blocking + in-group Hamming
    verification (no text fetch needed) + union-find over VERIFIED edges
    only (edges ≪ corpus; the accepted centralized closure step).

    Skew rule: band members are first deduped to ONE REPRESENTATIVE per
    DISTINCT sketch (min doc_id), with star edges rep→member inside each
    sketch group (Hamming 0 ≤ max_hamming always, so closure equality is
    exact) — a boilerplate/empty-text blowup of identical sketches costs
    O(members), never O(members²), and cannot split across shards. Runs
    with > max_block DISTINCT sketches are then scored in max_block shards
    whose offsets are STAGGERED per band (first shard shortened by
    band_index·max_block/N_BANDS): reps sort identically in every band
    (full-simhash order), so without the stagger the shard boundaries
    would coincide across all N_BANDS bands and a boundary-straddling pair
    would be lost everywhere. With it, a near pair (Hamming ≤ max_hamming
    ⇒ adjacent-ish in simhash sort order) split in one band is interior in
    another. Recall is exact for pairs within max_block ranks of each
    other in the per-run sketch order; the sf-scale oracle (brute-force
    O(n²) Hamming + recursive-CTE closure) checks the whole chain."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts(_table_rows(sf_dir, "documents"))
    rows = ds.map_batches(
        _SimhashBander, fn_constructor_kwargs={"n_parts": n_parts},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_pool_size(_table_rows(sf_dir, "documents")))
    n_bands = _SimhashBander.N_BANDS

    def pairs_in_part(group: pa.Table) -> pa.Table:
        g = group.sort_by([("band_key", "ascending"),
                           ("simhash", "ascending"), ("doc_id", "ascending")])
        bk = g["band_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sims = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(bk) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        run_first = np.r_[True, bk[1:] != bk[:-1]]
        # one rep per distinct (run, sketch): first row = min doc_id
        rep = np.r_[True, sims[1:] != sims[:-1]] | run_first
        # star edges rep→member inside each sketch group (vectorized: the
        # governing rep of row i is the latest rep index ≤ i)
        last_rep = np.maximum.accumulate(
            np.where(rep, np.arange(len(rep)), -1))
        nonrep = ~rep
        star_a = ids[last_rep[nonrep]]
        star_b = ids[nonrep]
        # rep-compressed run scan
        rids = ids[rep]
        rsims = sims[rep]
        rrun = np.cumsum(run_first)[rep]
        starts = np.flatnonzero(np.r_[True, rrun[1:] != rrun[:-1]])
        ends = np.r_[starts[1:], len(rids)]
        band_idx = (bk[rep][starts] >> np.uint64(56)).astype(np.int64)
        pa_list, pb_list = [star_a], [star_b]
        for s_, e_, bi in zip(starts.tolist(), ends.tolist(),
                              band_idx.tolist()):
            if e_ - s_ < 2:
                continue
            stagger = (bi * max_block) // n_bands
            off = s_
            first_len = max_block - stagger
            while off < e_:
                m = min(first_len if off == s_ else max_block, e_ - off)
                if m >= 2:
                    sub = rsims[off:off + m]
                    ham = hamming64_matrix(sub, sub)
                    ai, bi_ = np.nonzero(np.triu(ham <= max_hamming, k=1))
                    if len(ai):
                        x = rids[off + ai]
                        y = rids[off + bi_]
                        pa_list.append(np.minimum(x, y))
                        pb_list.append(np.maximum(x, y))
                off += m if m >= 2 else 1
        a = np.concatenate(pa_list)
        b = np.concatenate(pb_list)
        if len(a):
            ab = np.unique(np.stack([a, b], axis=1), axis=0)
            a, b = ab[:, 0], ab[:, 1]
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
            }
        )

    from . import maybe_fast_shuffle

    with maybe_fast_shuffle(_table_rows(sf_dir, "documents")
                            * _SimhashBander.N_BANDS):
        out = rows.repartition(n_parts).groupby("part").map_groups(
            pairs_in_part, batch_format="pyarrow")
    # cross-band duplicate edges survive to the closure — harmless (union
    # is idempotent, components_from_edges sorts for determinism) and the
    # driver set they used to dedup into is exactly what the closure rungs
    # exist to avoid
    comp = _collect_components_ds(out, "id_a", "id_b")
    return _assign_clusters(ds.select_columns(["doc_id"]), comp)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8):
    """Near-dup pairs by exact token-3-gram Jaccard ≥ threshold, found via
    LSH blocking + exact verification. The DuckDB oracle brute-forces the
    same Jaccard over ALL O(n²) pairs — i.e. the reference's full-table
    fuzzy scan (database.py:389-405) — so a match proves the blocked scan
    loses nothing at this threshold. Integer-set arithmetic on both sides →
    bit-identical thresholds, no float-tolerance issues."""
    verified = _verified_pairs(sf_dir, threshold)
    pairs = set()
    for t in verified.iter_batches(batch_size=65536, batch_format="pyarrow"):
        pairs.update(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    out = sorted(pairs)
    return pa.table(
        {
            "id_a": pa.array([p[0] for p in out], pa.int64()),
            "id_b": pa.array([p[1] for p in out], pa.int64()),
        }
    )
