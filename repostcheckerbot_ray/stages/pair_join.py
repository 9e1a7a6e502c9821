"""Distributed candidate-pair verification — no driver-side pair sets, no
broadcast text dicts.

Replaces round-1's driver funnel (candidate pairs folded into a Python dict
on the driver + all candidate texts ``ray.put`` as one broadcast lookup)
with two keyed exchanges, so the verification stage holds no state
proportional to the corpus anywhere:

A) **attach** — each candidate pair (a, b) explodes into two *need rows*,
   keyed by the text side's partition ``hash(key) % P``. Texts are joined
   in-group either from the co-partitioned fingerprint CHECKPOINT file
   (flagship path: the fingerprint relation is already hash(url)-partitioned
   on disk by the resume contract, so the text side moves ZERO bytes through
   the exchange — each group reads only its own part file, pruned to two
   columns), or from a padded union with the text relation (generic path:
   one pruned-column text shuffle — a standard partitioned hash join).
   Duplicate discoveries of the same pair (a near-dup pair surfaces in up to
   NUM_BANDS LSH bands) collapse in-group: both copies of a pair's side-``k``
   row key to ``hash(k)``, so the dedupe is local, never a driver set.
B) **verify** — attached rows re-keyed by ``pair_part = hash(a, b) % P``;
   both sides of a pair land in one group; a per-group scorer (fresh state
   per group, e.g. a shingle-set cache) emits the edge score or None.

Reference semantics preserved by the scorers passed in: the SequenceMatcher
threshold predicate (/root/reference/database.py:395-405) for the flagship,
exact shingle-set Jaccard for the corpus dedup ops.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.fingerprint import splitmix64


def str_hash64(vals) -> np.ndarray:  # noqa: ANN001
    """Vectorized deterministic 64-bit hash of a string column (ONE C pass
    — pd.util.hash_array with its fixed default key, independent of
    PYTHONHASHSEED). categorize=False: factorize would collapse strings
    differing past an embedded NUL (repo memory / dedup_edges note).

    This is the ONE url→hash used for every string partition key in the
    engine (fingerprint exchange, resume filters, text-attach routing, pair
    parts) — all sites derive from it, so checkpoint partition layout and
    exchange keying can never disagree. Replaced the per-row blake2b
    token_hash in round 5 (ckpt schema v3): partitioning only routes rows,
    outputs are partition-invariant (pinned by test_part_count_invariance
    and the determinism suite)."""
    import pandas as pd

    return pd.util.hash_array(np.asarray(vals, dtype=object),
                              categorize=False).astype(np.uint64)


def key_parts(arr, num_parts: int) -> np.ndarray:  # noqa: ANN001
    """Partition ids for a key column, fully vectorized for BOTH key types:
    integer keys via splitmix64 over the raw values, string keys via ONE
    pd.util.hash_array pass (str_hash64) — no per-row Python on any path."""
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return (splitmix64(v) % np.uint64(num_parts)).astype(np.int32)
    h = str_hash64(arr.to_numpy(zero_copy_only=False))
    return (h % np.uint64(num_parts)).astype(np.int32)


def pair_part_of(a, b, num_parts: int) -> int:  # noqa: ANN001
    """Deterministic pair partition — independent of which band discovered
    the pair, so resume filtering and exchange keying agree. Defined as the
    singleton case of :func:`pair_parts` (one implementation, no drift)."""
    if isinstance(a, (int, np.integer)):
        x = splitmix64(np.array([a], dtype=np.uint64))
        y = splitmix64(np.array([int(b) + 0x9E37, ], dtype=np.uint64))
        return int((x ^ y)[0]) % num_parts
    x = splitmix64(str_hash64([a]))
    y = splitmix64(str_hash64([b]) + np.uint64(0x9E37))
    return int((x ^ y)[0] % np.uint64(num_parts))


def pair_parts(a_arr, b_arr, num_parts: int) -> np.ndarray:  # noqa: ANN001
    """Vectorized pair_part_of over two key columns (matches the scalar
    function exactly for both key types)."""
    if pa.types.is_integer(a_arr.type):
        x = splitmix64(a_arr.to_numpy(zero_copy_only=False).astype(np.uint64))
        y = splitmix64(b_arr.to_numpy(zero_copy_only=False).astype(np.uint64)
                       + np.uint64(0x9E37))
        return ((x ^ y) % np.uint64(num_parts)).astype(np.int32)
    x = splitmix64(str_hash64(a_arr.to_numpy(zero_copy_only=False)))
    y = splitmix64(str_hash64(b_arr.to_numpy(zero_copy_only=False))
                   + np.uint64(0x9E37))
    return ((x ^ y) % np.uint64(num_parts)).astype(np.int32)


def explode_needs(num_parts_text: int, num_parts_pair: int,
                  a_col: str = "a", b_col: str = "b",
                  pp_col: str | None = None):
    """pairs batch -> two need rows per pair: (part, pair_part, k, a, b).
    ``pp_col`` names a precomputed pair_part column (saves re-hashing every
    pair when an upstream dedup exchange already computed it)."""

    def f(batch: pa.Table) -> pa.Table:
        A = batch[a_col].combine_chunks()
        B = batch[b_col].combine_chunks()
        key_type = batch[a_col].type
        if pp_col is not None and pp_col in batch.column_names:
            pp = batch[pp_col].to_numpy(zero_copy_only=False).astype(np.int32)
        else:
            pp = pair_parts(A, B, num_parts_pair)
        part_a = key_parts(A, num_parts_text)
        part_b = key_parts(B, num_parts_text)
        both_k = pa.concat_arrays([A, B])
        both_a = pa.concat_arrays([A, A])
        both_b = pa.concat_arrays([B, B])
        return pa.table(
            {
                "part": pa.array(np.concatenate([part_a, part_b]), pa.int32()),
                "pair_part": pa.array(np.concatenate([pp, pp]), pa.int32()),
                "k": both_k.cast(key_type),
                "a": both_a.cast(key_type),
                "b": both_b.cast(key_type),
            }
        )

    return f


def _attach_rows(seen: dict, texts: dict, key_type: pa.DataType) -> pa.Table:
    """(a, b, k) -> pair_part need map + key->text lookup -> attached rows.
    Rows whose text is missing are dropped (their pair cannot verify)."""
    out_pp, out_a, out_b, out_is_a, out_t = [], [], [], [], []
    for (a, b, k), p in sorted(seen.items()):
        t = texts.get(k)
        if t is None:
            continue
        out_pp.append(p)
        out_a.append(a)
        out_b.append(b)
        out_is_a.append(k == a)
        out_t.append(t)
    return pa.table(
        {
            "part": pa.array(out_pp, pa.int32()),
            "a": pa.array(out_a, key_type),
            "b": pa.array(out_b, key_type),
            "is_a": pa.array(out_is_a, pa.bool_()),
            "text": pa.array(out_t, pa.string()),
        }
    )


def make_checkpoint_attacher(ckpt_dirs, key_col: str = "url",
                             text_col: str = "text_norm"):  # noqa: ANN001
    """Exchange-A group fn for the flagship: need rows grouped by the
    fingerprint partition; texts come from the co-partitioned checkpoint
    file(s) of that part — zero text bytes through the exchange. Multiple
    dirs support delta runs (history checkpoint ∪ delta checkpoint)."""
    if isinstance(ckpt_dirs, str):
        ckpt_dirs = [ckpt_dirs]

    def attach(group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        seen: dict = {}
        for k, a, b, p in zip(group["k"].to_pylist(), group["a"].to_pylist(),
                              group["b"].to_pylist(),
                              group["pair_part"].to_pylist()):
            seen[(a, b, k)] = p
        want = pa.array(sorted({k for (_, _, k) in seen}), type=group["k"].type)
        texts: dict = {}
        for d in ckpt_dirs:
            path = os.path.join(d, f"part={part}.parquet")
            if not os.path.exists(path):
                continue
            tbl = pq.read_table(path, columns=[key_col, text_col])
            tbl = tbl.filter(pc.is_in(tbl[key_col], value_set=want))
            texts.update(zip(tbl[key_col].to_pylist(), tbl[text_col].to_pylist()))
        return _attach_rows(seen, texts, group["k"].type)

    return attach


def attach_via_union(pairs_ds, texts_ds, id_col: str, text_col: str,  # noqa: ANN001
                     num_parts: int, a_col: str = "a", b_col: str = "b",
                     shuffle_blocks: int = 16):
    """Generic exchange A: no checkpoint to read from, so the text relation
    itself is routed through the SAME keyed exchange as the need rows
    (padded union -> groupby(part) -> in-group hash join). Text bytes move
    once, pruned to (id, text); need rows are pair-sized."""

    def pad_needs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return batch.append_column(
            "text", pa.array([None] * n, pa.string())
        ).append_column("is_text", pa.array([False] * n, pa.bool_()))

    def pad_texts(batch: pa.Table) -> pa.Table:
        ks = batch[id_col].combine_chunks()
        n = batch.num_rows
        part = pa.array(key_parts(ks, num_parts), pa.int32())
        return pa.table(
            {
                "part": part,
                "pair_part": pa.array([None] * n, pa.int32()),
                "k": ks,
                "a": pa.array([None] * n, ks.type),
                "b": pa.array([None] * n, ks.type),
                "text": batch[text_col],
                "is_text": pa.array([True] * n, pa.bool_()),
            }
        )

    needs = pairs_ds.map_batches(
        explode_needs(num_parts, num_parts, a_col, b_col),
        batch_format="pyarrow", zero_copy_batch=True,
    ).map_batches(pad_needs, batch_format="pyarrow", zero_copy_batch=True)
    texts = texts_ds.map_batches(pad_texts, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def attach(group: pa.Table) -> pa.Table:
        is_text = group["is_text"].to_pylist()
        ks = group["k"].to_pylist()
        txt = group["text"].to_pylist()
        texts_map = {k: t for k, t, f in zip(ks, txt, is_text) if f}
        seen: dict = {}
        for k, a, b, p, f in zip(ks, group["a"].to_pylist(),
                                 group["b"].to_pylist(),
                                 group["pair_part"].to_pylist(), is_text):
            if not f:
                seen[(a, b, k)] = p
        return _attach_rows(seen, texts_map, group["k"].type)

    both = needs.union(texts).repartition(shuffle_blocks)
    return both.groupby("part").map_groups(attach, batch_format="pyarrow")


def make_pair_verifier(score_factory):  # noqa: ANN001
    """Exchange-B group fn: rows sorted by (a, b); each complete pair is
    scored by ``score_factory()`` (called once per group — per-group caches,
    e.g. shingle sets, live and die with the group). Emits
    (a, b, score, part) for pairs whose score is not None."""

    def verify(group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        g = group.sort_by([("a", "ascending"), ("b", "ascending"),
                           ("is_a", "descending")])
        A = g["a"].to_pylist()
        B = g["b"].to_pylist()
        isa = g["is_a"].to_pylist()
        T = g["text"].to_pylist()
        score = score_factory()
        out_a, out_b, out_s = [], [], []
        i, n = 0, len(A)
        while i < n:
            j = i + 1
            while j < n and A[j] == A[i] and B[j] == B[i]:
                j += 1
            ta = tb = None
            for kk in range(i, j):
                if isa[kk]:
                    ta = T[kk]
                else:
                    tb = T[kk]
            if ta is not None and tb is not None:
                s = score(A[i], B[i], ta, tb)
                if s is not None:
                    out_a.append(A[i])
                    out_b.append(B[i])
                    out_s.append(float(s))
            i = j
        return pa.table(
            {
                "a": pa.array(out_a, g["a"].type),
                "b": pa.array(out_b, g["b"].type),
                "score": pa.array(out_s, pa.float64()),
                "part": pa.array([part] * len(out_a), pa.int32()),
            }
        )

    return verify


def verify_pairs_distributed(attached_ds, score_factory):  # noqa: ANN001
    """Exchange B: groupby(pair_part) over attached rows -> scored pairs."""
    return attached_ds.groupby("part").map_groups(
        make_pair_verifier(score_factory), batch_format="pyarrow")
