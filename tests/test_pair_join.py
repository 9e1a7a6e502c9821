"""Unit tests for the distributed pair-verification exchanges
(stages/pair_join.py) — the machinery that replaced round-1's driver-side
pair sets and broadcast text dicts."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _score_eq_factory():
    """Toy scorer: 100.0 when texts are equal, else None."""

    def factory():
        def score(a, b, ta, tb):  # noqa: ANN001
            return 100.0 if ta == tb else None

        return score

    return factory


def test_attach_via_union_and_verify(ray_session):
    import ray.data as rd

    from repostcheckerbot_ray.stages.pair_join import (
        attach_via_union,
        verify_pairs_distributed,
    )

    texts = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["aa", "aa", "bb", "cc", "bb"]),
    }))
    # duplicated candidate rows (same pair found twice) must collapse
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([1, 1, 3, 1], pa.int64()),
        "b": pa.array([2, 2, 5, 4], pa.int64()),
    }))
    attached = attach_via_union(pairs, texts, "doc_id", "text", num_parts=4)
    out = verify_pairs_distributed(
        attached, _score_eq_factory()).to_pandas()
    got = sorted(zip(out["a"], out["b"], out["score"]))
    assert got == [(1, 2, 100.0), (3, 5, 100.0)]  # (1,4) texts differ


def test_attach_drops_pairs_with_missing_text(ray_session):
    import ray.data as rd

    from repostcheckerbot_ray.stages.pair_join import (
        attach_via_union,
        verify_pairs_distributed,
    )

    texts = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["aa"]),
    }))
    pairs = rd.from_arrow(pa.table({
        "a": pa.array([1], pa.int64()),
        "b": pa.array([99], pa.int64()),  # 99 has no text row
    }))
    attached = attach_via_union(pairs, texts, "doc_id", "text", num_parts=4)
    out = verify_pairs_distributed(
        attached, _score_eq_factory()).to_pandas()
    assert len(out) == 0


def test_checkpoint_attacher_reads_part_files(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from repostcheckerbot_ray.stages.pair_join import (
        explode_needs,
        make_checkpoint_attacher,
        str_hash64,
        verify_pairs_distributed,
    )

    num_parts = 4
    urls = [f"u{i}" for i in range(8)]
    # co-partitioned checkpoint layout: part=<k>.parquet by hash(url)
    parts: dict[int, list] = {p: [] for p in range(num_parts)}
    for u in urls:
        # the engine's canonical string partition hash (ckpt v3)
        parts[int(str_hash64([u])[0]) % num_parts].append(u)
    for p, us in parts.items():
        pq.write_table(
            pa.table({"url": pa.array(us),
                      "text_norm": pa.array(["t-" + u[1:] if u != "u1" else "t-0"
                                             for u in us])}),
            str(tmp_path / f"part={p}.parquet"))

    pairs = rd.from_arrow(pa.table({
        "url_a": pa.array(["u0", "u2"]),
        "url_b": pa.array(["u1", "u3"]),
    }))
    needs = pairs.map_batches(
        explode_needs(num_parts, num_parts, "url_a", "url_b"),
        batch_format="pyarrow")
    attached = needs.groupby("part").map_groups(
        make_checkpoint_attacher(str(tmp_path)), batch_format="pyarrow")
    out = verify_pairs_distributed(
        attached, _score_eq_factory()).to_pandas()
    # u0/u1 share text "t-0"; u2/u3 differ
    assert sorted(zip(out["a"], out["b"])) == [("u0", "u1")]
