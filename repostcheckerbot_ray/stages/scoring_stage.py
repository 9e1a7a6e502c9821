"""Stage 3 — within-block pairwise scoring (SURVEY.md §2.D3/§2.F).

Replaces the reference's O(N) fuzzy full-table scan per probe
(/root/reference/database.py:389-405, 442-460, 530-548, 585-603) with
within-block scoring after LSH blocking. Score semantics are preserved
exactly (functions/scoring.py): SequenceMatcher ratio + ``10-ratio*10 <
thresh`` for text (F1), Hamming ``d < thresh`` with pct
``(thresh-d)/thresh*100`` for 64-bit payload fingerprints (F2), and the
min-per-chunk-then-mean distance for chunk lists (F3, database.py:215-227).

Text verification is two-phase because band rows are *light* (no text):

1. in-block candidate generation — dedupe members by ``content_hash``
   (exact dups already matched by the exact path; one representative per
   distinct content, which also collapses hot boilerplate bands), apply the
   exact ``ratio_upper_bound`` length prefilter (zero recall loss) and a
   generous SimHash-Hamming prefilter, emit ``(url_a, url_b)`` candidates
   (deduped within the part);
2. verification — fully distributed via ``stages.pair_join``: candidate
   pairs explode into need rows co-partitioned with the fingerprint
   checkpoint (texts joined per part from the part file, zero text bytes
   shuffled), then re-keyed by pair hash and SequenceMatcher-scored per
   group. No driver-side pair set, no broadcast text dict — nothing in the
   stage holds corpus-proportional state.

Oversized fuzzy blocks (after representative dedup) are SALTED: scored in
deterministic shards of ``max_block`` (cost O(n·max_block), recall recovered
through the other 31 bands + transitive closure) and surfaced as a
``_salted_block`` sentinel row → metrics, never silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.scoring import (
    DEFAULT_THRESHOLD,
    hamming64_matrix,
    hamming_pct,
    chunk_list_distance,
    popcount64,
)

# A near-duplicate above the ratio threshold has near-identical shingle sets;
# 3-shingle SimHash Hamming for such pairs is empirically < 20 bits. 28 gives
# wide margin while still pruning unrelated same-band collisions.
SIMHASH_PREFILTER_BITS = 28
DEFAULT_MAX_BLOCK = 256


def make_text_candidate_scorer(thresh: float = DEFAULT_THRESHOLD, max_block: int = DEFAULT_MAX_BLOCK):
    """Per-band-group candidate generator (pyarrow group in/out)."""
    # minimum achievable ratio for a match: 10 - r*10 < thresh  =>  r > 1 - thresh/10
    min_ratio = 1.0 - thresh / 10.0

    def score_group(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_candidates()
        urls = group["url"].to_pylist()
        chash = group["content_hash"].to_pylist()
        sim = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tlen = group["text_len"].to_numpy(zero_copy_only=False).astype(np.int64)

        # one representative (min url) per distinct content_hash
        rep: dict[str, int] = {}
        for i in range(n):
            j = rep.get(chash[i])
            if j is None or urls[i] < urls[j]:
                rep[chash[i]] = i
        idx = sorted(rep.values(), key=lambda i: urls[i])

        # HOT-BAND SALTING (north rule, SURVEY.md §4 skew row): a band whose
        # distinct-content membership exceeds max_block is scored in salted
        # shards of max_block — cost becomes O(n·max_block) instead of
        # O(n²), bounded and linear in the hot band's size. Cross-shard
        # pairs in THIS band may be skipped, but every true near-dup pair
        # shares ~all of its 32 bands, so another (non-hot or
        # differently-sharded) band recovers it, and union-find closes the
        # cluster transitively. Salted bands are surfaced via a metric row.
        shards = [idx[i:i + max_block] for i in range(0, len(idx), max_block)]
        salted = len(shards) > 1

        url_a_all, url_b_all = [], []
        for shard in shards:
            m = len(shard)
            if m < 2:
                continue
            sub_sim = sim[shard]
            sub_len = tlen[shard]
            # vectorized prefilters over the m×m pair matrix
            ham = hamming64_matrix(sub_sim, sub_sim)
            la = sub_len[:, None].astype(np.float64)
            lb = sub_len[None, :].astype(np.float64)
            tot = la + lb
            ub = np.where(tot > 0, 2.0 * np.minimum(la, lb) / np.maximum(tot, 1e-9), 1.0)
            ok = (ham <= SIMHASH_PREFILTER_BITS) & (ub > min_ratio)
            ai, bi = np.nonzero(np.triu(ok, k=1))
            for i, j in zip(ai, bi):
                ua, ub_ = urls[shard[i]], urls[shard[j]]
                url_a_all.append(min(ua, ub_))
                url_b_all.append(max(ua, ub_))
        out = pa.table(
            {
                "url_a": pa.array(url_a_all, pa.string()),
                "url_b": pa.array(url_b_all, pa.string()),
            }
        )
        if salted:
            out = pa.concat_tables([out, _salt_row(len(shards))])
        return out

    return score_group


def _empty_candidates() -> pa.Table:
    return pa.table({"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string())})


def _salt_row(n_shards: int) -> pa.Table:
    """Sentinel row surfaced into metrics by the pipeline (never silent)."""
    return pa.table(
        {
            "url_a": pa.array(["_salted_block"], pa.string()),
            "url_b": pa.array([str(n_shards)], pa.string()),
        }
    )


def make_payload_scorer(thresh: float = DEFAULT_THRESHOLD):
    """Per-band-group F2 scorer: vectorized Hamming matrix, edges < thresh."""

    def score_group(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_edge_table()
        urls = group["url"].to_pylist()
        ph = group["payload_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # dedup identical (url,hash) rows that can land twice in one group
        seen: dict[str, int] = {}
        idx = []
        for i, u in enumerate(urls):
            if u not in seen:
                seen[u] = i
                idx.append(i)
        if len(idx) < 2:
            return _empty_edge_table()
        urls = [urls[i] for i in idx]
        ph = ph[idx]
        ham = hamming64_matrix(ph, ph)
        ai, bi = np.nonzero(np.triu((ham > 0) & (ham < thresh), k=1))
        # Hamming 0 pairs are exact payload dups -> already matched via the
        # exact content-hash path OR are distinct payloads with colliding
        # 64-bit hashes; score them too (d=0 -> pct 100) when hashes equal
        # but content hashes differ is indistinguishable here, so include:
        zi, zj = np.nonzero(np.triu(ham == 0, k=1))
        ai = np.concatenate([ai, zi]).astype(np.int64)
        bi = np.concatenate([bi, zj]).astype(np.int64)
        if len(ai) == 0:
            return _empty_edge_table()
        url_a = [min(urls[i], urls[j]) for i, j in zip(ai, bi)]
        url_b = [max(urls[i], urls[j]) for i, j in zip(ai, bi)]
        d = ham[ai, bi].astype(np.float64)
        scores = [hamming_pct(x, thresh) for x in d]
        return pa.table(
            {
                "url_a": pa.array(url_a, pa.string()),
                "url_b": pa.array(url_b, pa.string()),
                "score": pa.array(scores, pa.float64()),
                "kind": pa.array(["payload"] * len(url_a), pa.string()),
            }
        )

    return score_group


def make_chunk_scorer(thresh: float = DEFAULT_THRESHOLD):
    """Per-(chunk-hash)-group F3 scorer (database.py:215-227 semantics)."""

    def score_group(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return _empty_edge_table()
        urls = group["url"].to_pylist()
        lists = group["chunk_hashes"].to_pylist()
        seen: dict[str, list] = {}
        for u, ch in zip(urls, lists):
            seen.setdefault(u, ch)
        items = sorted(seen.items())
        if len(items) < 2:
            return _empty_edge_table()
        out_a, out_b, scores = [], [], []
        arrs = [np.asarray(ch, dtype=np.uint64) for _, ch in items]
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                d = chunk_list_distance(arrs[i], arrs[j])
                if d < thresh:  # F3 predicate, database.py:451
                    out_a.append(items[i][0])
                    out_b.append(items[j][0])
                    scores.append(hamming_pct(d, thresh))
        return pa.table(
            {
                "url_a": pa.array(out_a, pa.string()),
                "url_b": pa.array(out_b, pa.string()),
                "score": pa.array(scores, pa.float64()),
                "kind": pa.array(["chunked"] * len(out_a), pa.string()),
            }
        )

    return score_group


def _empty_edge_table() -> pa.Table:
    return pa.table(
        {
            "url_a": pa.array([], pa.string()),
            "url_b": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "kind": pa.array([], pa.string()),
        }
    )


def dedup_edges(edges_ds, num_parts: int = 16, out_dir: str | None = None):  # noqa: ANN001
    """D4: keep the max-score edge per (url_a, url_b) pair — exact (100)
    dominates fuzzy, mirroring the reference's skip-if-exactly-matched
    (database.py:393 et al.).

    Implementation: hash-partition by pair key (few large groups), then one
    pandas sort + drop_duplicates per group — grouping by the raw pair key
    would dispatch Python once per pair. With ``out_dir``, each group also
    writes its parquet shard there (write-through, same pattern as the
    checkpointed stages): the caller materializes ONE exchange and gets the
    final edge sink for free instead of paying a separate write job +
    read-back."""
    def add_pair_part(batch: pa.Table) -> pa.Table:
        # vectorized string pair hash: siphash both url columns in C
        # (pd.util.hash_array, categorize=False — factorize would collapse
        # strings differing past an embedded NUL), then the same
        # splitmix64 combine shape pair_join.pair_parts uses for integer
        # keys. Internal balance knob only: any deterministic hash works,
        # the in-group keep_max is global per pair regardless of mapping.
        import pandas as pd

        from ..functions.fingerprint import splitmix64

        a = np.asarray(batch["url_a"].to_numpy(zero_copy_only=False),
                       dtype=object)
        b = np.asarray(batch["url_b"].to_numpy(zero_copy_only=False),
                       dtype=object)
        ha = pd.util.hash_array(a, categorize=False).astype(np.uint64)
        hb = pd.util.hash_array(b, categorize=False).astype(np.uint64)
        parts = ((splitmix64(ha ^ splitmix64(hb)) % np.uint64(num_parts))
                 .astype(np.int32))
        if "part" in batch.column_names:
            batch = batch.drop_columns(["part"])
        return batch.append_column("pair_part", pa.array(parts, pa.int32()))

    def keep_max(group: pa.Table) -> pa.Table:
        pp = int(group["pair_part"][0].as_py())
        df = group.to_pandas()
        df = df.sort_values(["url_a", "url_b", "score", "kind"],
                            ascending=[True, True, False, True])
        df = df.drop_duplicates(["url_a", "url_b"], keep="first")
        out = pa.Table.from_pandas(df.drop(columns=["pair_part"]),
                                   preserve_index=False)
        # from_pandas attaches a 'pandas' schema blob that makes the schema
        # unhashable downstream (see corpus_ops.bare_schema)
        out = out.replace_schema_metadata(None)
        if out_dir is not None:
            import os

            import pyarrow.parquet as pq

            tmp = os.path.join(out_dir, f".tmp-part-{pp:05d}.parquet")
            pq.write_table(out, tmp)
            os.replace(tmp, os.path.join(out_dir, f"part-{pp:05d}.parquet"))
        return out

    tagged = edges_ds.map_batches(add_pair_part, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return tagged.groupby("pair_part").map_groups(keep_max, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Unified per-group dispatcher for the single-exchange edge stage: one
# groupby(band_key) over blocking.explode_block_rows output; each group is
# homogeneous in kind (keys are kind-salted) and routes to the matching
# scorer. Text groups emit CANDIDATE rows (kind="tcand", score=-1) that the
# pipeline verifies in a second pass (pair_join keyed exchanges against the
# co-partitioned fingerprint checkpoint) — everything else emits final
# edges directly.
# --------------------------------------------------------------------------

def make_unified_scorer(thresh: float = DEFAULT_THRESHOLD,
                        max_block: int = DEFAULT_MAX_BLOCK):
    text_scorer = make_text_candidate_scorer(thresh, max_block)
    payload_scorer = make_payload_scorer(thresh)
    chunk_scorer = make_chunk_scorer(thresh)

    def score_group(group: pa.Table) -> pa.Table:
        kind = group["kind"][0].as_py()
        if kind == "e":
            # exact star edges; content_hash equality re-checked (the band
            # key is a 64-bit fold of it): sub-group by true hash
            out_a, out_b = [], []
            by_hash: dict[str, list] = {}
            for u, ch in zip(group["url"].to_pylist(),
                             group["content_hash"].to_pylist()):
                by_hash.setdefault(ch, []).append(u)
            for urls in by_hash.values():
                uniq = sorted(set(urls))
                if len(uniq) > 1:
                    out_a.extend([uniq[0]] * (len(uniq) - 1))
                    out_b.extend(uniq[1:])
            return pa.table(
                {
                    "url_a": pa.array(out_a, pa.string()),
                    "url_b": pa.array(out_b, pa.string()),
                    "score": pa.array([100.0] * len(out_a), pa.float64()),
                    "kind": pa.array(["exact"] * len(out_a), pa.string()),
                }
            )
        if kind == "t":
            cands = text_scorer(group)
            n = cands.num_rows
            return pa.table(
                {
                    "url_a": cands["url_a"],
                    "url_b": cands["url_b"],
                    "score": pa.array([-1.0] * n, pa.float64()),
                    "kind": pa.array(["tcand"] * n, pa.string()),
                }
            )
        if kind == "p":
            return payload_scorer(group)
        return chunk_scorer(group)

    return score_group


def make_part_scorer(thresh: float = DEFAULT_THRESHOLD,
                     max_block: int = DEFAULT_MAX_BLOCK):
    """Whole-partition scorer, vectorized across runs.

    One group per PART (band_key % P). Rows are sorted by (band_key,
    content_hash, url); band runs are found with one numpy boundary scan,
    and then ALL pair work is batched by kind instead of dispatching per
    run (a duplicate-heavy corpus has ~32 tiny runs per duplicate family —
    per-run Table slicing used to dominate the stage):

    - exact runs: consecutive (band_key, content_hash) sub-runs -> star
      edges, built from run offsets;
    - text runs: representative dedup is a consecutive-unique pass (sorted
      by content_hash, min url first); within-run pair indices come from
      cached triu templates, then ONE vectorized simhash-Hamming +
      length-bound prefilter over all pairs of the part; oversized runs are
      salted into max_block shards (north-rule skew handling) with a
      sentinel metric row;
    - payload runs: same template pair generation, one vectorized Hamming
      pass, edges below threshold;
    - chunked runs (rare): per-run F3 scorer.
    """
    unified = make_unified_scorer(thresh, max_block)
    min_ratio = 1.0 - thresh / 10.0

    def score_part(group: pa.Table) -> pa.Table:
        from ..pipelines import _pin_arrow_threads

        _pin_arrow_threads()
        part = group["part"][0].as_py()
        g = group.sort_by([("band_key", "ascending"), ("chash64", "ascending"),
                           ("content_hash", "ascending"), ("url", "ascending")])
        bk = g["band_key"].to_numpy(zero_copy_only=False)
        kinds = g["kind"].to_pylist()
        ch = g["content_hash"].to_pylist()
        ch64 = g["chash64"].to_numpy(zero_copy_only=False)
        urls = g["url"].to_pylist()
        sim = g["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tlen = g["text_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = g["payload_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # delta support: rows from persisted history carry is_new=False; a
        # run with no new member is skipped (its pairs are already in the
        # history edge relation), and mixed runs emit only new-touching
        # pairs — delta cost ∝ delta + touched blocks, not corpus
        isnew = (g["is_new"].to_numpy(zero_copy_only=False)
                 if "is_new" in g.column_names
                 else np.ones(len(urls), dtype=bool))

        run_start = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        run_end = np.r_[run_start[1:], len(bk)]
        # full (non-delta) runs: every row is new — skip the per-run
        # isnew slice+any (measured ~10% of the scorer's Python loop)
        all_new = bool(isnew.all())
        # text-rep mask, ONE vectorized pass instead of a per-run listcomp:
        # first row of each (run, chash64) sub-run; run starts forced True
        # (adjacent runs can coincidentally share a chash64)
        rep_mask = np.r_[True, ch64[1:] != ch64[:-1]]
        rep_mask[run_start] = True
        # url code table: one lexicographic unique pass per part so pair
        # normalization / dedup below run on int codes, not Python strings
        urls_np = np.asarray(urls, dtype=object)
        u_uniq, u_code = np.unique(urls_np, return_inverse=True)
        u_code = u_code.astype(np.int64)
        # exact sub-run boundaries on the FULL content_hash (ch64 fold
        # collisions must stay separate sub-runs: a fold collision may only
        # drop a text candidate, never mint a false score-100 edge); one
        # vectorized object-compare pass replaces the per-row walk
        ch_np = np.asarray(ch, dtype=object)
        sub_break = np.empty(len(ch_np), dtype=bool)
        if len(ch_np):
            sub_break[0] = True
            sub_break[1:] = ch_np[1:] != ch_np[:-1]
            sub_break[run_start] = True

        tmpl: dict[int, tuple] = {}

        def triu(L: int) -> tuple:
            t = tmpl.get(L)
            if t is None:
                t = np.triu_indices(L, k=1)
                tmpl[L] = t
            return t

        tables = []
        ea_idx, eb_idx = [], []              # exact star edge row indices
        ti_list, tj_list = [], []            # text candidate index pairs
        pi_list, pj_list = [], []            # payload index pairs
        salted = 0
        for s_, e_ in zip(run_start, run_end):
            L = int(e_ - s_)
            if L < 2:
                continue
            if not all_new and not isnew[s_:e_].any():  # pure-history run
                continue
            k = kinds[s_]
            if k == "e":
                # star edges per (run, content_hash) sub-run, vectorized:
                # hub = first row (min url — sorted), members follow; in
                # delta runs emit only pairs touching a new row (new hub →
                # full star; old hub → new members only)
                idx = np.arange(s_, e_, dtype=np.int64)
                sstart = idx[sub_break[s_:e_]]
                send = np.r_[sstart[1:], e_]
                slen = send - sstart
                good = slen >= 2
                if good.any():
                    hubs = np.repeat(sstart[good], slen[good] - 1)
                    n_mem = int((slen[good] - 1).sum())
                    off = np.cumsum(slen[good] - 1) - (slen[good] - 1)
                    members = (np.repeat(sstart[good] + 1, slen[good] - 1)
                               + (np.arange(n_mem) - np.repeat(off, slen[good] - 1)))
                    if not all_new:
                        keep = isnew[hubs] | isnew[members]
                        hubs, members = hubs[keep], members[keep]
                    ea_idx.append(hubs)
                    eb_idx.append(members)
            elif k == "t":
                # representative per content (64-bit fold) = first (min url)
                # in the sorted run; a fold collision can only drop a
                # would-be candidate pair, never corrupt output
                reps = (np.flatnonzero(rep_mask[s_:e_]) + s_).tolist()
                if len(reps) > max_block:
                    salted += 1
                for off in range(0, len(reps), max_block):
                    shard = np.asarray(reps[off:off + max_block], dtype=np.int64)
                    if len(shard) < 2:
                        continue
                    a, b = triu(len(shard))
                    ti_list.append(shard[a])
                    tj_list.append(shard[b])
            elif k == "p":
                # same max_block salting as text runs (skew rule): a hot
                # payload band is scored in bounded shards — recall
                # recovered through the other PAYLOAD_BANDS-1 bands
                if L > max_block:
                    salted += 1
                for off in range(s_, e_, max_block):
                    m = min(max_block, e_ - off)
                    if m < 2:
                        continue
                    idx = np.arange(off, off + m, dtype=np.int64)
                    a, b = triu(m)
                    pi_list.append(idx[a])
                    pj_list.append(idx[b])
            else:  # "c" — rare modality, per-run scorer; sharded the same way
                if L > max_block:
                    salted += 1
                for off in range(s_, e_, max_block):
                    m = min(max_block, e_ - off)
                    if m < 2:
                        continue
                    res = unified(g.slice(off, m))
                    if res.num_rows:
                        tables.append(res)

        if ea_idx:
            EA = np.concatenate(ea_idx)
            EB = np.concatenate(eb_idx)
            if len(EA):
                tables.append(pa.table(
                    {
                        "url_a": pa.array(urls_np[EA], pa.string()),
                        "url_b": pa.array(urls_np[EB], pa.string()),
                        "score": pa.array([100.0] * len(EA), pa.float64()),
                        "kind": pa.array(["exact"] * len(EA), pa.string()),
                    }
                ))
        out_a: list[str] = []
        out_b: list[str] = []
        if ti_list:
            I = np.concatenate(ti_list)
            J = np.concatenate(tj_list)
            hm = popcount64(sim[I] ^ sim[J])
            la = tlen[I].astype(np.float64)
            lb = tlen[J].astype(np.float64)
            tot = np.maximum(la + lb, 1e-9)
            ub = 2.0 * np.minimum(la, lb) / tot
            keep = ((hm <= SIMHASH_PREFILTER_BITS) & (ub > min_ratio)
                    & (isnew[I] | isnew[J]))
            # in-part dedupe on INT CODES (the same pair surfaces in many
            # band runs of this part — collapse before the verification
            # exchange): min/max-normalize the code pair, one np.unique
            # over the packed key; unique order == lexicographic url order
            # because u_uniq is sorted
            ci, cj = u_code[I[keep]], u_code[J[keep]]
            lo = np.minimum(ci, cj)
            hi = np.maximum(ci, cj)
            uk = np.unique(lo * np.int64(len(u_uniq)) + hi)
            out_a = u_uniq[uk // len(u_uniq)].tolist()
            out_b = u_uniq[uk % len(u_uniq)].tolist()
        if salted:
            # emitted even when the part has no text candidates: payload /
            # chunked hot bands salt too, and the contract is "never silent"
            out_a.append("_salted_block")
            out_b.append(str(salted))
        if out_a:
            tables.append(pa.table(
                {
                    "url_a": pa.array(out_a, pa.string()),
                    "url_b": pa.array(out_b, pa.string()),
                    "score": pa.array([-1.0] * len(out_a), pa.float64()),
                    "kind": pa.array(["tcand"] * len(out_a), pa.string()),
                }
            ))
        if pi_list:
            I = np.concatenate(pi_list)
            J = np.concatenate(pj_list)
            d = popcount64(ph[I] ^ ph[J]).astype(np.float64)
            keep = (d < thresh) & (isnew[I] | isnew[J])
            ci, cj = u_code[I[keep]], u_code[J[keep]]
            lo = np.minimum(ci, cj)
            hi = np.maximum(ci, cj)
            out_a = u_uniq[lo].tolist()
            out_b = u_uniq[hi].tolist()
            sc = [hamming_pct(dv, thresh) for dv in d[keep]]
            if out_a:
                tables.append(pa.table(
                    {
                        "url_a": pa.array(out_a, pa.string()),
                        "url_b": pa.array(out_b, pa.string()),
                        "score": pa.array(sc, pa.float64()),
                        "kind": pa.array(["payload"] * len(out_a), pa.string()),
                    }
                ))

        if not tables:
            empty = _empty_edge_table()
            return empty.append_column("part", pa.array([], pa.int32()))
        merged = pa.concat_tables(tables)
        return merged.append_column(
            "part", pa.array([part] * merged.num_rows, pa.int32()))

    return score_part
