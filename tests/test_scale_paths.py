"""Tests for the documented scale paths: distributed label-propagation
connected components (the beyond-driver union-find fallback) and the
multimodal strict-decode hook."""

from __future__ import annotations

import pyarrow as pa
import pytest


def test_label_propagation_matches_union_find(ray_session):
    import ray.data as rd

    from repostcheckerbot_ray.state.union_find import (
        components_from_edges,
        label_propagation_components,
    )

    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("x", "y"), ("y", "z"), ("c", "x")]
    want = components_from_edges(edges)

    edges_ds = rd.from_arrow(pa.table({
        "url_a": pa.array([e[0] for e in edges]),
        "url_b": pa.array([e[1] for e in edges]),
    }))
    got_df = label_propagation_components(edges_ds).to_pandas()
    got = dict(zip(got_df["url"], got_df["cluster_id"]))
    assert got == want


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
