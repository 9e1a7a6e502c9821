"""Resume-from-checkpoint tests (SURVEY.md §5.4, north rule resumability).

A killed run must resume without recomputing completed partitions: we run
the pipeline once, damage/remove part of the checkpoint state (simulating a
kill mid-stage), rerun into the same out_dir, and assert (a) identical final
clusters and (b) the completed partitions were detected (parts_resumed
metric) rather than rewritten (mtime check).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline


@pytest.fixture(scope="module")
def first_run(ray_session, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("resume_out")
    cfg = RepostConfig(num_parts=8)
    res = run_repost_pipeline(f"{fixture_dir}/pages", str(out), cfg)
    clusters = res["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    return {"out": str(out), "cfg": cfg, "clusters": clusters}


def test_resume_skips_completed_parts(first_run, fixture_dir):
    out, cfg = first_run["out"], first_run["cfg"]
    fp_dir = os.path.join(out, "checkpoints", "fingerprints")
    # simulate a kill after some fingerprint partitions committed: drop the
    # manifests (commit markers) of parts 5..7 → they must recompute; parts
    # 0..4 must be reused untouched
    for p in (5, 6, 7):
        os.remove(os.path.join(fp_dir, f"part={p}.manifest.json"))
    kept_mtimes = {
        p: os.path.getmtime(os.path.join(fp_dir, f"part={p}.parquet")) for p in range(5)
    }

    res = run_repost_pipeline(f"{fixture_dir}/pages", out, cfg)
    clusters = res["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        clusters[["url", "cluster_id", "cluster_size"]],
        first_run["clusters"][["url", "cluster_id", "cluster_size"]],
    )
    # completed partitions were reused, not rewritten
    for p, mt in kept_mtimes.items():
        assert os.path.getmtime(os.path.join(fp_dir, f"part={p}.parquet")) == mt
    # and the metrics recorded the resume
    m = res["metrics"].table().to_pandas()
    resumed = m[(m["stage"] == "fingerprints") & (m["counter"] == "parts_resumed")]
    assert int(resumed["value"].iloc[0]) == 5
    # edge stages were fully complete -> all parts resumed
    for stage in ("edges_raw", "edges_text"):
        row = m[(m["stage"] == stage) & (m["counter"] == "parts_resumed")]
        assert int(row["value"].iloc[0]) == cfg.num_parts, stage


def test_config_change_invalidates_checkpoints(first_run, fixture_dir):
    """A different threshold must NOT reuse old edges (different semantics)."""
    out = first_run["out"]
    cfg2 = RepostConfig(num_parts=8, threshold=2.0)
    res = run_repost_pipeline(f"{fixture_dir}/pages", out, cfg2)
    m = res["metrics"].table().to_pandas()
    for stage in ("fingerprints", "edges_raw", "edges_text"):
        row = m[(m["stage"] == stage) & (m["counter"] == "parts_resumed")]
        assert int(row["value"].iloc[0]) == 0, stage
    # threshold 2 keeps only ratio > 0.8 text pairs: fewer/equal text edges
    e1 = pq.read_table(os.path.join(out, "edges")).to_pandas()
    assert (e1.loc[e1["kind"] == "text", "score"] > 80.0).all()


def test_lineage_written(first_run):
    lin = os.path.join(first_run["out"], "checkpoints", "fingerprints", "_lineage.json")
    with open(lin) as f:
        rec = json.load(f)
    assert rec["stage"] == "fingerprints"
    assert rec["num_parts"] == 8
    assert sum(rec["rows_per_part"].values()) > 0
