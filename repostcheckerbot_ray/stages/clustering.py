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

# Per-worker-process cache for broadcast lookup maps: stateless TASKS reuse
# warm Ray worker processes, so caching the deserialized object by its
# ObjectRef makes each worker pay the O(|map|) plasma deserialization once
# per run instead of once per batch (keeps the no-actor-ramp win of tasks
# without O(n_batches x |map|) re-deserialization on duplicate-heavy
# corpora). Capacity-bounded; only the current run's maps linger.
_REF_CACHE: dict = {}


def _cached_get(ref):  # noqa: ANN001
    import ray

    # keyed by ref.hex(), NOT the ObjectRef itself: a cached ObjectRef would
    # pin the plasma object alive in every warm worker after the driver
    # drops it; the hex key lets the store release the bytes while the
    # worker keeps its own deserialized copy
    key = ref.hex()
    if key in _REF_CACHE:
        return _REF_CACHE[key]
    if len(_REF_CACHE) >= 4:  # at most comp+meta of the current run linger
        _REF_CACHE.clear()
    val = ray.get(ref)
    _REF_CACHE[key] = val
    return val


CLUSTERS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("cluster_id", pa.string()),
        ("cluster_size", pa.int64()),
        ("is_original", pa.bool_()),
        ("warc_ts", pa.timestamp("us")),
    ]
)


def _distributed_cc_threshold() -> int:
    """Edge count above which the closure COMPUTE moves off the driver
    (min-label propagation over keyed exchanges). Override with
    RCB_DISTRIBUTED_CC_EDGES. On THIS rung the converged url→label map
    still streams back into the broadcast dict the assigner uses — the
    threshold protects the driver from the O(E·α) union work and the
    edge-sized working set during closure. The next rung up
    (_join_assigner_threshold, RCB_JOIN_ASSIGNER_EDGES) keeps even the
    label map distributed: assign_clusters_joined replaces the broadcast
    with part-keyed joins."""
    import os

    return int(os.environ.get("RCB_DISTRIBUTED_CC_EDGES", "5000000"))


def _labels_to_comp(labels_ds) -> dict:  # noqa: ANN001
    """Converged label relation -> {url: cluster_id}.

    Self-labeled roots (url == cluster_id) are deliberately KEPT — parity
    with UnionFind.components(), which includes root->root entries. This
    is load-bearing: cluster_meta aggregates min_ts/size only over urls
    PRESENT in comp, so dropping roots would lose each cluster's min
    member from the count (size off by one, is_original wrong). The
    setdefault (vs plain assignment) only guards against a duplicate
    label row clobbering a non-self mapping."""
    comp: dict = {}
    for b in labels_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for u, c in zip(b["url"].to_pylist(), b["cluster_id"].to_pylist()):
            if u != c:
                comp[u] = c
            else:
                comp.setdefault(u, c)
    return comp


def collect_components(edges_ds) -> dict:  # noqa: ANN001
    """Stream edge batches to the driver, union-find, return url->cluster_id.
    Edges ≪ corpus by construction; streamed, never materialized as a
    Dataset copy. Accepts a local directory of edge parquet instead of a
    Dataset — the same edge bytes reach the driver either way, but a direct
    column-pruned read skips a whole Ray job's overhead.

    Auto-scale switch: when the edge count (parquet metadata — free) exceeds
    ``_distributed_cc_threshold()``, the closure runs DISTRIBUTED via
    ``label_propagation_components`` instead of driver union-find — same
    output contract, pinned equal at the switch point by
    tests/test_scale_paths.py."""
    pairs = []
    if isinstance(edges_ds, str):
        import glob
        import os

        import pyarrow.parquet as _pq

        files = sorted(glob.glob(os.path.join(edges_ds, "*.parquet")))
        try:
            n_edges = sum(_pq.read_metadata(f).num_rows for f in files)
        except Exception:  # corrupt/non-parquet stray file: let the real
            n_edges = 0    # read below surface the error, not the free scan
        if n_edges > _distributed_cc_threshold():
            import ray.data as rd

            from ..state.union_find import label_propagation_components

            labels = label_propagation_components(
                rd.read_parquet(files, columns=["url_a", "url_b"]))
            return _labels_to_comp(labels)
        for f in files:
            t = _pq.read_table(f, columns=["url_a", "url_b"])
            pairs.extend(zip(t["url_a"].to_pylist(), t["url_b"].to_pylist()))
        return components_from_edges(pairs)
    for batch in edges_ds.select_columns(["url_a", "url_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        pairs.extend(zip(batch["url_a"].to_pylist(), batch["url_b"].to_pylist()))
        if len(pairs) > _distributed_cc_threshold():
            # edge relation larger than the driver contract allows — restart
            # the closure on the distributed path (labels flow back, the
            # O(E) pair list is dropped immediately)
            from ..state.union_find import label_propagation_components

            pairs = None
            return _labels_to_comp(
                label_propagation_components(edges_ds))
    return components_from_edges(pairs)


def _join_assigner_threshold() -> int:
    """Edge count above which even the converged LABEL MAP stays off the
    driver: the assigner becomes two part-keyed exchanges instead of a
    broadcast dict (the rung SCALE.md documents past the distributed-CC
    threshold). Default 50M edges ≈ up to 100M label entries — a multi-GB
    Python dict is past what one node should hold or ship. Override with
    RCB_JOIN_ASSIGNER_EDGES (tests pin equality at 0)."""
    import os

    return int(os.environ.get("RCB_JOIN_ASSIGNER_EDGES", "50000000"))


def _assigner_parts() -> int:
    from ..pipelines import cluster_cpus

    return max(16, 2 * cluster_cpus())


def assign_clusters_joined(fingerprints_ds, labels_ds, num_parts: int | None = None):  # noqa: ANN001
    """Fully distributed assigner — no url→label broadcast anywhere.

    Two part-keyed exchanges (the partitioned-hash-join shape pair_join
    uses), each a padded union + groupby(part).map_groups:

    1. **label join** (part = hash(url) % P): fingerprint rows meet label
       rows in-group; unlabeled urls become singletons (cluster_id = own
       url) — LEFT join semantics identical to the broadcast assigner.
    2. **meta fold** (part = hash(cluster_id) % P): every member of a
       cluster lands in ONE group, so the in-group per-cluster min(warc_ts)
       / size ARE the global meta — cluster_size, is_original computed
       without any driver map.

    Output contract = make_cluster_assigner exactly (CLUSTERS_SCHEMA,
    deterministic; pinned equal at the switch by tests/test_scale_paths.py).
    """
    import numpy as np
    import pandas as pd

    P = num_parts or _assigner_parts()

    def _hash_parts(obj_vals) -> np.ndarray:  # noqa: ANN001
        h = pd.util.hash_array(np.asarray(obj_vals, dtype=object),
                               categorize=False)
        return (h % np.uint64(P)).astype(np.int32)

    def tag_fp(batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        n = batch.num_rows
        return pa.table({
            "part": pa.array(_hash_parts(urls.to_numpy(zero_copy_only=False)),
                             pa.int32()),
            "url": urls,
            "warc_ts": batch["warc_ts"].cast(pa.int64()),
            "cluster_id": pa.nulls(n, pa.string()),
        })

    def tag_lbl(batch: pa.Table) -> pa.Table:
        urls = batch["url"]
        n = batch.num_rows
        return pa.table({
            "part": pa.array(_hash_parts(urls.to_numpy(zero_copy_only=False)),
                             pa.int32()),
            "url": urls,
            "warc_ts": pa.nulls(n, pa.int64()),
            "cluster_id": batch["cluster_id"],
        })

    both = fingerprints_ds.select_columns(["url", "warc_ts"]).map_batches(
        tag_fp, batch_format="pyarrow", zero_copy_batch=True,
    ).union(labels_ds.select_columns(["url", "cluster_id"]).map_batches(
        tag_lbl, batch_format="pyarrow", zero_copy_batch=True))

    def join_group(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split label/fingerprint rows in ARROW before to_pandas: the padded
        # union's null warc_ts on label rows would otherwise force the int64
        # column to float64 (silent precision loss above 2^53 µs)
        lbl = pc.is_valid(t["cluster_id"])
        l = (t.filter(lbl).select(["url", "cluster_id"])
              .to_pandas().drop_duplicates("url"))
        f = t.filter(pc.invert(lbl)).select(["url", "warc_ts"]).to_pandas()
        m = f.merge(l, on="url", how="left")
        cid = m["cluster_id"].fillna(m["url"])
        return pa.table({
            "part": pa.array(_hash_parts(cid.to_numpy()), pa.int32()),
            "url": pa.array(m["url"], pa.string()),
            "warc_ts": pa.array(m["warc_ts"].to_numpy(), pa.int64()),
            "cluster_id": pa.array(cid, pa.string()),
        })

    members = both.groupby("part").map_groups(join_group,
                                              batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("cluster_id")["warc_ts"]
        min_ts = g.transform("min")
        size = g.transform("size")
        return pa.table(
            {
                "url": pa.array(df["url"], pa.string()),
                "cluster_id": pa.array(df["cluster_id"], pa.string()),
                "cluster_size": pa.array(size.to_numpy(np.int64), pa.int64()),
                "is_original": pa.array(
                    (df["warc_ts"].to_numpy() == min_ts.to_numpy())),
                "warc_ts": pa.array(df["warc_ts"].to_numpy(),
                                    pa.int64()).cast(pa.timestamp("us")),
            },
            schema=CLUSTERS_SCHEMA,
        )

    return members.groupby("part").map_groups(finalize,
                                              batch_format="pyarrow")


def meta_topk_from_clusters(clusters_ds, k: int = 20) -> dict:  # noqa: ANN001
    """{cluster_id: (min_ts, size)} for the k largest multi-member clusters,
    computed FROM the clusters relation (one cluster-sized aggregate over
    multi-member rows only) — the report path's meta source when the full
    label map never exists driver-side (join-assigner rung)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    multi = clusters_ds.map_batches(
        lambda t: t.filter(pc.greater(t["cluster_size"], 1))
                   .select(["cluster_id", "warc_ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = multi.groupby("cluster_id").aggregate(
        Min("warc_ts", alias_name="min_ts"), Count(alias_name="n"))
    meta: dict = {}
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        # normalize to µs: the aggregate may come back timestamp[ns]
        ts_us = b["min_ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pylist()
        for cid, mt, n in zip(b["cluster_id"].to_pylist(), ts_us,
                              b["n"].to_pylist()):
            meta[cid] = (mt, n)
    if len(meta) > k:
        keep = sorted(meta.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
        meta = dict(keep)
    return meta


def make_cluster_assigner(comp_ref, meta_ref):  # noqa: ANN001
    """Broadcast cluster map (ray.put once, fetched from the local object
    store per batch) applied as a stateless task; rows not in any edge
    become singleton clusters (cluster_id = own url)."""

    def assign(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        import ray

        comp: dict[str, str] = _cached_get(comp_ref)
        meta_map: dict[str, tuple[int, int]] = _cached_get(meta_ref)
        urls = pd.Series(batch["url"].to_pylist(), dtype=object)
        ts = batch["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        # vectorized dict lookups (pandas map = one C hash-probe pass);
        # rows not in any edge stay singleton clusters (cid = own url)
        cids = urls.map(comp).fillna(urls) if comp else urls
        if meta_map:
            meta = cids.map(meta_map)
            has = meta.notna().to_numpy()
            sizes = np.ones(len(urls), dtype=np.int64)
            is_orig = np.ones(len(urls), dtype=bool)
            if has.any():
                pairs = np.array([*meta[has]], dtype=np.int64)
                sizes[has] = pairs[:, 1]
                is_orig[has] = ts[has] == pairs[:, 0]
        else:
            sizes = np.ones(len(urls), dtype=np.int64)
            is_orig = np.ones(len(urls), dtype=bool)
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

    # stateless TASKS, not an actor pool: no actor-pool ramp-up (measured
    # ~2 s of the old wall at bench scale for a pass this short); the comp
    # map deserializes once per warm worker via _cached_get, not per batch
    def meta_partial(batch: pa.Table) -> pa.Table:
            import pandas as pd

            urls = pd.Series(batch["url"].to_pylist(), dtype=object)
            cids = urls.map(_cached_get(comp_ref))
            has = cids.notna()
            g = pd.DataFrame({
                "cid": cids[has],
                "ts": batch["warc_ts"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False)[has.to_numpy()],
            }).groupby("cid", sort=True)["ts"].agg(["min", "size"])
            return pa.table(
                {
                    "cluster_id": pa.array(g.index.to_numpy(), pa.string()),
                    "min_ts": pa.array(g["min"].to_numpy(), pa.int64()),
                    "n": pa.array(g["size"].to_numpy(), pa.int64()),
                }
            )

    partials = fingerprints_ds.select_columns(["url", "warc_ts"]).map_batches(
        meta_partial, batch_format="pyarrow", zero_copy_batch=True,
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


def assign_clusters_with_meta(fingerprints_ds, edges_ds, edges_path: str | None = None):  # noqa: ANN001
    """Like :func:`assign_clusters`, but also returns (comp, meta) so the
    caller (e.g. the report sink) can pick top clusters driver-side without
    re-aggregating the clusters relation. ``edges_path`` (a just-written
    local edge dir) lets component collection skip the Ray job.

    Above ``_join_assigner_threshold()`` edges, NOTHING corpus- or
    label-sized touches the driver: closure runs distributed
    (label_propagation_components) and assignment is the part-keyed join
    (:func:`assign_clusters_joined`). On that rung the returned ``comp``
    is EMPTY (the map never exists centrally) and ``meta`` holds only the
    top-k multi-member clusters (what the report sink needs)."""
    import ray

    # threshold check only when the edge relation is an on-disk dir
    # (parquet metadata = free row count; the production write path).
    # Dataset-input callers keep the streaming path — its own >5M-edge
    # restart already moves the CLOSURE off the driver, and counting a
    # lazy edge Dataset here would execute its DAG twice.
    if edges_path is not None:
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        files = sorted(_glob.glob(_os.path.join(edges_path, "*.parquet")))
        try:
            n_edges = sum(_pq.read_metadata(f).num_rows for f in files)
        except Exception:  # same guard as collect_components
            n_edges = 0
        if n_edges > _join_assigner_threshold():
            import ray.data as rd

            from ..state.union_find import label_propagation_components

            labels = label_propagation_components(
                rd.read_parquet(files, columns=["url_a", "url_b"]))
            ds = assign_clusters_joined(fingerprints_ds, labels)
            # materialize ONCE: meta_topk_from_clusters executes the
            # two-exchange assigner DAG, and the caller executes ds again
            # when writing the clusters relation — without this the join
            # assignment would run twice at exactly the >50M-edge scale
            # this rung exists for
            ds = ds.materialize()
            meta = meta_topk_from_clusters(ds)
            return ds, {}, meta

    comp = collect_components(edges_path or edges_ds)
    meta = cluster_meta(fingerprints_ds, comp)
    comp_ref = ray.put(comp)
    meta_ref = ray.put(meta)
    ds = fingerprints_ds.select_columns(["url", "warc_ts"]).map_batches(
        make_cluster_assigner(comp_ref, meta_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return ds, comp, meta
