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
   generous SimHash-Hamming prefilter, emit ``(url_a, url_b)`` candidates;
2. verification — candidate pairs are a tiny fraction of the corpus
   (that is the entire point of blocking), so the pipeline broadcasts the
   candidate urls' texts via ``ray.put`` and scores pairs in a stateless
   ``map_batches``. The partitioned-hash-join fallback for a candidate set
   too large to broadcast is ``state.union_find._hash_join`` — same keying,
   no broadcast; the pipeline records candidate counts in metrics so the
   assumption is observable.

Oversized fuzzy blocks (after representative dedup) are capped
deterministically (sort by url, keep first ``max_block``) and the drop is
reported as a ``_capped_block`` sentinel row → metrics, never silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.scoring import (
    DEFAULT_THRESHOLD,
    hamming64_matrix,
    hamming_pct,
    chunk_list_distance,
    ratio_upper_bound,
    seq_ratio,
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
        capped = 0
        if len(idx) > max_block:
            capped = len(idx) - max_block
            idx = idx[:max_block]
        m = len(idx)
        if m < 2:
            return _cap_row(capped) if capped else _empty_candidates()

        sub_sim = sim[idx]
        sub_len = tlen[idx]
        # vectorized prefilters over the m×m pair matrix
        ham = hamming64_matrix(sub_sim, sub_sim)
        la = sub_len[:, None].astype(np.float64)
        lb = sub_len[None, :].astype(np.float64)
        tot = la + lb
        ub = np.where(tot > 0, 2.0 * np.minimum(la, lb) / np.maximum(tot, 1e-9), 1.0)
        ok = (ham <= SIMHASH_PREFILTER_BITS) & (ub > min_ratio)
        ai, bi = np.nonzero(np.triu(ok, k=1))
        if len(ai) == 0:
            return _cap_row(capped) if capped else _empty_candidates()
        ua = [urls[idx[i]] for i in ai]
        ub_ = [urls[idx[i]] for i in bi]
        url_a = [min(a, b) for a, b in zip(ua, ub_)]
        url_b = [max(a, b) for a, b in zip(ua, ub_)]
        out = pa.table(
            {
                "url_a": pa.array(url_a, pa.string()),
                "url_b": pa.array(url_b, pa.string()),
            }
        )
        if capped:
            out = pa.concat_tables([out, _cap_row(capped)])
        return out

    return score_group


def _empty_candidates() -> pa.Table:
    return pa.table({"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string())})


def _cap_row(n_dropped: int) -> pa.Table:
    """Sentinel row surfaced into metrics by the pipeline (never silent)."""
    return pa.table(
        {
            "url_a": pa.array(["_capped_block"], pa.string()),
            "url_b": pa.array([str(n_dropped)], pa.string()),
        }
    )


def make_text_pair_verifier(texts_ref, thresh: float = DEFAULT_THRESHOLD):  # noqa: ANN001
    """Stateless verifier task: the text lookup is a driver-side ``ray.put``
    fetched zero-copy-ish from the local object store per batch (plain task,
    no actor-pool startup cost; the dict fetch is tiny next to
    SequenceMatcher work)."""

    def verify(batch: pa.Table) -> pa.Table:
        import ray

        t: dict[str, str] = ray.get(texts_ref)
        ua = batch["url_a"].to_pylist()
        ub = batch["url_b"].to_pylist()
        out_a, out_b, scores = [], [], []
        for a, b in zip(ua, ub):
            ta, tb = t.get(a), t.get(b)
            if ta is None or tb is None:
                continue
            ratio = seq_ratio(ta, tb)
            if 10.0 - ratio * 10.0 < thresh:  # F1 predicate, database.py:396
                out_a.append(a)
                out_b.append(b)
                scores.append(ratio * 100.0)
        return pa.table(
            {
                "url_a": pa.array(out_a, pa.string()),
                "url_b": pa.array(out_b, pa.string()),
                "score": pa.array(scores, pa.float64()),
                "kind": pa.array(["text"] * len(out_a), pa.string()),
            }
        )

    return verify


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


def dedup_edges(edges_ds):  # noqa: ANN001
    """D4: keep the max-score edge per (url_a, url_b) pair — exact (100)
    dominates fuzzy, mirroring the reference's skip-if-exactly-matched
    (database.py:393 et al.)."""

    def keep_max(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        return group.sort_by([("score", "descending"), ("kind", "ascending")]).slice(0, 1)

    return edges_ds.groupby(["url_a", "url_b"]).map_groups(keep_max, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Unified per-group dispatcher for the single-exchange edge stage: one
# groupby(band_key) over blocking.explode_block_rows output; each group is
# homogeneous in kind (keys are kind-salted) and routes to the matching
# scorer. Text groups emit CANDIDATE rows (kind="tcand", score=-1) that the
# pipeline verifies in a second, broadcast-based pass — everything else
# emits final edges directly.
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
    """Whole-partition scorer: one group per PART (hash of band_key), inside
    which sorted band-key runs are scanned with numpy boundary detection and
    only multi-occupancy bands reach the per-kind scorer. This turns
    millions of per-band dispatches into a tight per-part loop."""
    unified = make_unified_scorer(thresh, max_block)

    def score_part(group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        g = group.sort_by([("band_key", "ascending"), ("url", "ascending")])
        bk = g["band_key"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        outs = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            res = unified(g.slice(s, e - s))
            if res.num_rows:
                outs.append(res)
        if not outs:
            empty = _empty_edge_table()
            return empty.append_column("part", pa.array([], pa.int32()))
        merged = pa.concat_tables(outs)
        return merged.append_column(
            "part", pa.array([part] * merged.num_rows, pa.int32()))

    return score_part
