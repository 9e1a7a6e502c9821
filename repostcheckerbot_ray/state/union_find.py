"""Transitive closure of match edges into clusters.

The reference forms clusters implicitly: each repost links to every surviving
earlier match (/root/reference/app.py:179-206 reporting all rows returned by
database.py:696-706). Batch equivalent: connected components over the edge
set. Two implementations:

- :class:`UnionFind` — driver-side, path-compressed, streaming over edge
  batches. Edges are tiny relative to the corpus (only within-block pairs
  above threshold), so this is the deliberate single centralized piece
  (SURVEY.md section 3). Deterministic: edges are sorted before union and
  the component id is the lexicographic min url.
- :func:`label_propagation_components` — the distributed scale path:
  iterative min-label propagation expressed as Ray Data groupbys; use when
  the edge set itself no longer fits one node. Same output contract.
"""

from __future__ import annotations


class UnionFind:
    """Path-compressed, union-by-size; keys are arbitrary hashables."""

    def __init__(self) -> None:
        self._parent: dict = {}
        self._size: dict = {}

    def find(self, x):  # noqa: ANN001
        parent = self._parent
        if x not in parent:
            parent[x] = x
            self._size[x] = 1
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a, b) -> None:  # noqa: ANN001
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self._size[ra] < self._size[rb]:
            ra, rb = rb, ra
        self._parent[rb] = ra
        self._size[ra] += self._size[rb]

    def components(self) -> dict:
        """member -> canonical component id (lexicographic min member).

        Min-member canonicalization makes the result independent of union
        order, hence of parallelism and edge arrival order (determinism
        requirement, SURVEY.md section 5.6).
        """
        roots: dict = {}
        for x in self._parent:
            r = self.find(x)
            cur = roots.get(r)
            if cur is None or x < cur:
                roots[r] = x
        return {x: roots[self.find(x)] for x in self._parent}


def components_from_edges(edges) -> dict:  # noqa: ANN001
    """edges: iterable of (a, b) pairs -> {member: canonical_component_id}.
    Sorted before union for full determinism."""
    uf = UnionFind()
    for a, b in sorted(edges):
        uf.union(a, b)
    return uf.components()


def label_propagation_components(edges_ds, max_iters: int = 50,  # noqa: ANN001
                                 num_parts: int = 16):
    """Distributed connected components over an edges Dataset(url_a, url_b)
    via iterative min-label propagation: each round every node adopts the
    min label among itself and ALL its neighbors — edges are exploded in
    BOTH orientations up front, so labels flow a→b and b→a symmetrically.
    Converges in O(diameter) rounds (duplicate clusters are near-cliques,
    so 2-3 rounds typical); fixed point detected by a DISTRIBUTED change
    count (labels only decrease), never a driver-side frame compare.

    Both exchanges per round are keyed by ``part = hash(url) % num_parts``
    (few large groups, vectorized pandas joins/mins inside), not by raw url
    — grouping per node would dispatch Python once per node. Relations are
    edge-sized throughout, never corpus-sized. The driver-side
    ``components_from_edges`` is preferred while edges fit one node; this is
    the documented beyond-one-node fallback, same output contract.

    Key-dtype agnostic: url_a/url_b may be strings (flagship) or int64
    doc_ids (corpus-ops dedup family). The padded union carries NO null
    columns — edge rows are (key=src, val=dst), label rows are
    (key=url, val=label) — so int64 ids never round-trip through float64
    (the precision-loss class round-4 ADVICE flagged in join_group).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def part_of(series: pd.Series) -> np.ndarray:
        # vectorized, deterministic (independent of PYTHONHASHSEED), one C
        # pass; partitioning only affects grouping, never the output (min
        # over neighbors is partition-independent)
        h = pd.util.hash_array(series.to_numpy(), categorize=False)
        return (h % np.uint64(num_parts)).astype(np.int64)

    # bidirectional edge relation, keyed by the SRC endpoint's part; the
    # label side of the join is keyed the same way, so each part group is a
    # self-contained hash join
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        src = pd.concat([b["url_a"], b["url_b"]], ignore_index=True)
        dst = pd.concat([b["url_b"], b["url_a"]], ignore_index=True)
        return pd.DataFrame(
            {"key": src, "val": dst, "is_label": False, "part": part_of(src)}
        )

    edges_bi = edges_ds.map_batches(
        explode, batch_format="pandas").materialize()

    # initial labels: every endpoint labels itself (deduped per part)
    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        urls = g["key"].drop_duplicates()
        return pd.DataFrame(
            {"url": urls, "label": urls, "changed": np.int64(0), "part": part}
        )

    labels = edges_bi.groupby("part").map_groups(
        init_labels, batch_format="pandas").materialize()

    def as_join_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": b["url"], "val": b["label"], "is_label": True,
             "part": b["part"]}
        )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        """Spread each src's current label to its dst; pass old labels
        through. Output keyed by the RECEIVING url's part."""
        lab = g[g["is_label"]]
        ed = g[~g["is_label"]]
        cand = ed[["key", "val"]].merge(
            lab[["key", "val"]].rename(columns={"val": "label"}), on="key")
        url = pd.concat([cand["val"], lab["key"]], ignore_index=True)
        label = pd.concat([cand["label"], lab["val"]], ignore_index=True)
        is_old = np.r_[np.zeros(len(cand), bool), np.ones(len(lab), bool)]
        return pd.DataFrame(
            {"url": url, "label": label, "is_old": is_old,
             "part": part_of(url)}
        )

    def min_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        mins = g.groupby("url")["label"].min()
        old = g[g["is_old"]].set_index("url")["label"]
        changed = (old.reindex(mins.index) != mins).to_numpy()
        return pd.DataFrame(
            {"url": mins.index, "label": mins.to_numpy(),
             "changed": changed.astype(np.int64), "part": part}
        )

    for _ in range(max_iters):
        both = edges_bi.union(
            labels.map_batches(as_join_side, batch_format="pandas"))
        spread = both.groupby("part").map_groups(
            join_group, batch_format="pandas")
        labels = spread.groupby("part").map_groups(
            min_group, batch_format="pandas").materialize()
        # distributed convergence count; Dataset.sum returns None on an
        # empty dataset (no edges -> no labels), which also means converged
        if not labels.sum("changed"):
            break
    if labels.count() == 0:  # empty batches carry no columns to rename
        import ray.data as rd

        try:
            sch = edges_ds.schema()
            key_type = dict(zip(sch.names, sch.types))["url_a"]
        except Exception:
            key_type = pa.string()
        return rd.from_arrow(pa.table({"url": pa.array([], key_type),
                                       "cluster_id": pa.array([], key_type)}))
    return labels.map_batches(
        lambda b: b[["url", "label"]].rename(columns={"label": "cluster_id"}),
        batch_format="pandas",
    )
