"""Stage 4 — transitive closure into repost clusters (SURVEY.md §2.E4).

The reference links every new post to all earlier matches
(/root/reference/app.py:179-206); batch-equivalent = connected components
over the edge set. Edges are a tiny fraction of the corpus (post-blocking,
post-threshold), so components run driver-side with path-compressed
union-find — the one deliberately centralized piece (SURVEY.md §3). The
distributed fallback when even edges outgrow one node is
``state.union_find.label_propagation_components`` (min-label propagation
over groupby shuffles of the edge relation only).

Cluster ids are the lexicographic min url of each component → fully
deterministic, independent of parallelism and edge arrival order. The
"original" of a cluster is its min-``warc_ts`` member (same orientation as
the reference reporting the stored post as the original, app.py:186-194).
"""

from __future__ import annotations

import pyarrow as pa

from ..state.union_find import components_from_edges

CLUSTERS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cluster_id", pa.string()),
        ("cluster_size", pa.int64()),
        ("is_original", pa.bool_()),
        ("warc_ts", pa.timestamp("us")),
    ]
)


def collect_components(edges_ds) -> dict:  # noqa: ANN001
    """Stream edge batches to the driver, union-find, return url->cluster_id.
    Edges ≪ corpus by construction; streamed, never materialized as a
    Dataset copy."""
    pairs = []
    for batch in edges_ds.select_columns(["url_a", "url_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        pairs.extend(zip(batch["url_a"].to_pylist(), batch["url_b"].to_pylist()))
    return components_from_edges(pairs)


def make_cluster_assigner(comp_ref, meta_ref):  # noqa: ANN001
    """Broadcast cluster map (ray.put once, fetched from the local object
    store per batch) applied as a stateless task; rows not in any edge
    become singleton clusters (cluster_id = own url)."""

    def assign(batch: pa.Table) -> pa.Table:
        import ray

        comp: dict[str, str] = ray.get(comp_ref)
        meta_map: dict[str, tuple[int, int]] = ray.get(meta_ref)
        urls = batch["url"].to_pylist()
        ts = batch["warc_ts"].cast(pa.int64()).to_pylist()
        cids, sizes, is_orig = [], [], []
        for u, t in zip(urls, ts):
            cid = comp.get(u, u)
            meta = meta_map.get(cid)
            cids.append(cid)
            if meta is None:
                sizes.append(1)
                is_orig.append(True)
            else:
                sizes.append(meta[1])
                is_orig.append(t == meta[0])
        return pa.table(
            {
                "url": batch["url"],
                "cluster_id": pa.array(cids, pa.string()),
                "cluster_size": pa.array(sizes, pa.int64()),
                "is_original": pa.array(is_orig, pa.bool_()),
                "warc_ts": batch["warc_ts"],
            },
            schema=CLUSTERS_SCHEMA,
        )

    return assign


def cluster_meta(fingerprints_ds, comp: dict) -> dict:  # noqa: ANN001
    """cluster_id -> (min warc_ts, member count).

    PARTIAL-AGGREGATE shape (no shuffle): each batch folds its member rows
    into at most one (min_ts, n) partial per cluster touched, and the driver
    merges the tiny partial relation — O(clusters) driver traffic, zero
    exchanges. (The previous groupby-aggregate version paid a full shuffle
    job for the same O(clusters) result.)"""
    import ray

    if not comp:  # no edges -> all singletons
        return {}
    comp_ref = ray.put(comp)

    class MetaPartial:
        def __init__(self, ref) -> None:  # noqa: ANN001
            self._comp = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            comp_m = self._comp
            d: dict[str, list] = {}
            for u, t in zip(batch["url"].to_pylist(),
                            batch["warc_ts"].cast(pa.int64()).to_pylist()):
                cid = comp_m.get(u)
                if cid is None:
                    continue
                cur = d.get(cid)
                if cur is None:
                    d[cid] = [t, 1]
                else:
                    if t < cur[0]:
                        cur[0] = t
                    cur[1] += 1
            items = sorted(d.items())
            return pa.table(
                {
                    "cluster_id": pa.array([k for k, _ in items], pa.string()),
                    "min_ts": pa.array([v[0] for _, v in items], pa.int64()),
                    "n": pa.array([v[1] for _, v in items], pa.int64()),
                }
            )

    partials = fingerprints_ds.select_columns(["url", "warc_ts"]).map_batches(
        MetaPartial, fn_constructor_args=(comp_ref,),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4),
    )
    meta: dict[str, tuple[int, int]] = {}
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for cid, mt, n in zip(b["cluster_id"].to_pylist(),
                              b["min_ts"].to_pylist(), b["n"].to_pylist()):
            cur = meta.get(cid)
            meta[cid] = (mt, n) if cur is None else (min(cur[0], mt), cur[1] + n)
    return meta


def assign_clusters(fingerprints_ds, edges_ds):  # noqa: ANN001
    """fingerprints + edges -> clusters Dataset (url, cluster_id, size,
    is_original, warc_ts)."""
    ds, _, _ = assign_clusters_with_meta(fingerprints_ds, edges_ds)
    return ds


def assign_clusters_with_meta(fingerprints_ds, edges_ds):  # noqa: ANN001
    """Like :func:`assign_clusters`, but also returns (comp, meta) so the
    caller (e.g. the report sink) can pick top clusters driver-side without
    re-aggregating the clusters relation."""
    import ray

    comp = collect_components(edges_ds)
    meta = cluster_meta(fingerprints_ds, comp)
    comp_ref = ray.put(comp)
    meta_ref = ray.put(meta)
    ds = fingerprints_ds.select_columns(["url", "warc_ts"]).map_batches(
        make_cluster_assigner(comp_ref, meta_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds, comp, meta
