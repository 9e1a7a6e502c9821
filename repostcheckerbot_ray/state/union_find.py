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


def label_propagation_components(edges_ds, max_iters: int = 50):  # noqa: ANN001
    """Distributed connected components over an edges Dataset(url_a, url_b)
    via iterative min-label propagation (each round every node adopts the
    min label among itself and its neighbors; converges in O(diameter)
    rounds — duplicate clusters are near-cliques, so 2-3 rounds typical).

    Each round is one padded-union hash join + groupby over the (small)
    edge-node relation, not the corpus. Returns a Dataset(url, cluster_id).
    The driver-side ``components_from_edges`` is preferred while edges fit
    one node; this is the documented beyond-one-node fallback.
    """
    import pandas as pd

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # initial candidates: self and both neighbors
        return pd.DataFrame(
            {
                "url": pd.concat([b["url_a"], b["url_b"], b["url_a"], b["url_b"]]),
                "label": pd.concat([b["url_b"], b["url_a"], b["url_a"], b["url_b"]]),
            }
        )

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"url": [g["url"].iloc[0]], "label": [g["label"].min()]})

    labels = (
        edges_ds.map_batches(explode, batch_format="pandas")
        .groupby("url").map_groups(min_label, batch_format="pandas")
        .materialize()
    )
    for _ in range(max_iters):
        # join each edge endpoint with its current label, then spread that
        # label to the other endpoint; union with current labels; take min
        lab_a = labels.map_batches(
            lambda b: b.rename(columns={"url": "url_a", "label": "label_a"}),
            batch_format="pandas",
        )
        merged = _hash_join(edges_ds, lab_a, "url_a",
                            left_cols=["url_a", "url_b"],
                            right_cols=["url_a", "label_a"])

        def spread(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": pd.concat([b["url_a"], b["url_b"]]),
                    "label": pd.concat([b["label_a"], b["label_a"]]),
                }
            )

        cand = merged.map_batches(spread, batch_format="pandas").union(labels)
        new_labels = cand.groupby("url").map_groups(
            min_label, batch_format="pandas").materialize()
        old = labels.to_pandas().sort_values("url").reset_index(drop=True)
        new = new_labels.to_pandas().sort_values("url").reset_index(drop=True)
        labels = new_labels
        if old.equals(new):  # labels only decrease -> fixed point reached
            break
    return labels.map_batches(
        lambda b: b.rename(columns={"label": "cluster_id"}), batch_format="pandas"
    )


def _hash_join(left_ds, right_ds, key, left_cols, right_cols):  # noqa: ANN001
    """Small partitioned hash join: null-pad both sides to a common schema,
    tag, union, groupby(key), pandas merge per group. Used only on the
    edge-sized relations inside label propagation (a Dataset.union requires
    matching schemas — padding makes that explicit)."""
    import pandas as pd

    all_cols = list(dict.fromkeys(left_cols + right_cols))

    def pad(side, present):  # noqa: ANN001
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            for c in all_cols:
                if c not in b.columns:
                    b[c] = None
            b["__side"] = side
            return b[all_cols + ["__side"]]

        return fn

    both = left_ds.map_batches(pad(0, left_cols), batch_format="pandas").union(
        right_ds.map_batches(pad(1, right_cols), batch_format="pandas")
    )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][left_cols]
        r = g[g["__side"] == 1][right_cols]
        return l.merge(r, on=key)

    return both.groupby(key).map_groups(join_group, batch_format="pandas")
