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
    via iterative min-label propagation (each round: every node adopts the
    min label among itself and its neighbors; converges in O(diameter)
    rounds — duplicate clusters are near-cliques, so 2-3 rounds typical).

    Each round is one groupby shuffle over the (small) edge-node relation,
    not the corpus. Returns a Dataset(url, cluster_id).
    """
    import pandas as pd
    import ray.data  # noqa: F401  (Dataset ops on the argument)

    def to_labels(batch: pd.DataFrame) -> pd.DataFrame:
        # node -> candidate label rows in both directions + self
        return pd.DataFrame(
            {
                "url": pd.concat([batch["url_a"], batch["url_b"], batch["url_a"], batch["url_b"]]),
                "label": pd.concat([batch["url_b"], batch["url_a"], batch["url_a"], batch["url_b"]]),
            }
        )

    labels = edges_ds.map_batches(to_labels, batch_format="pandas")
    labels = labels.groupby("url").map_groups(
        lambda g: pd.DataFrame({"url": [g["url"].iloc[0]], "label": [g["label"].min()]}),
        batch_format="pandas",
    )
    edges = edges_ds
    for _ in range(max_iters):
        # join node labels back onto edges through a union+groupby exchange,
        # then recompute per-node min over neighbor labels.
        lab_a = labels.map_batches(
            lambda g: g.rename(columns={"url": "url_a", "label": "label_a"}), batch_format="pandas"
        )
        merged = _hash_join(edges, lab_a, "url_a")

        def spread(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": pd.concat([b["url_a"], b["url_b"]]),
                    "label": pd.concat([b["label_a"], b["label_a"]]),
                }
            )

        cand = merged.map_batches(spread, batch_format="pandas").union(labels)
        new_labels = cand.groupby("url").map_groups(
            lambda g: pd.DataFrame({"url": [g["url"].iloc[0]], "label": [g["label"].min()]}),
            batch_format="pandas",
        ).materialize()
        # convergence: total label mass stable -> stop (labels only decrease)
        old_sig = labels.materialize().to_pandas().sort_values("url").reset_index(drop=True)
        new_sig = new_labels.to_pandas().sort_values("url").reset_index(drop=True)
        labels = new_labels
        if old_sig.equals(new_sig):
            break
    return labels.map_batches(
        lambda g: g.rename(columns={"label": "cluster_id"}), batch_format="pandas"
    )


def _hash_join(left_ds, right_ds, key):  # noqa: ANN001
    """Small partitioned hash join: tag + union + groupby(key) + pandas merge
    per group. Used only on the edge-sized relations inside label
    propagation."""
    import pandas as pd

    def tag(val):  # noqa: ANN001
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__side"] = val
            return b

        return fn

    both = left_ds.map_batches(tag(0), batch_format="pandas").union(
        right_ds.map_batches(tag(1), batch_format="pandas")
    )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0].drop(columns="__side")
        r = g[g["__side"] == 1].drop(columns="__side")
        if len(l) == 0 or len(r) == 0:
            return l.iloc[0:0].merge(r.iloc[0:0], on=key)
        return l.merge(r, on=key)

    return both.groupby(key).map_groups(join_group, batch_format="pandas")
