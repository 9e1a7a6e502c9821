"""End-to-end flagship pipeline tests (SURVEY.md §5.2/5.3/5.6).

- byte-identity: pipeline text_norm per url == pure-python oracle, as bytes;
- cluster equivalence: pairwise F1 >= 0.99 against labeled pairs;
- determinism: identical clusters across runs and parallelism levels.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline


@pytest.fixture(scope="module")
def pipeline_result(ray_session, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("pipe_out")
    res = run_repost_pipeline(f"{fixture_dir}/pages", str(out), RepostConfig())
    clusters = res["clusters"].to_pandas()
    fingerprints = res["fingerprints"].to_pandas()
    edges = res["edges"].to_pandas()
    return {"clusters": clusters, "fingerprints": fingerprints, "edges": edges,
            "out": str(out), "metrics": res["metrics"].table().to_pandas()}


def test_byte_identity_extraction(pipeline_result, fixture_dir):
    """North-rule invariant: text_norm per url is byte-identical to the
    oracle (FIXTURES.md §3) at this batch size / parallelism."""
    oracle = pq.read_table(f"{fixture_dir}/extraction_oracle.parquet").to_pandas()
    got = pipeline_result["fingerprints"][["url", "text_norm"]]
    merged = oracle.merge(got, on="url", how="left", suffixes=("_want", "_got"))
    assert merged["text_norm_got"].notna().all(), "missing urls in pipeline output"
    bad = merged[merged["text_norm_want"].str.encode("utf-8")
                 != merged["text_norm_got"].str.encode("utf-8")]
    assert len(bad) == 0, f"byte mismatch for {bad['url'].tolist()[:5]}"


def test_url_dedup(pipeline_result, fixture_dir):
    """D1: one fingerprint row per url (fixture contains duplicate urls)."""
    fp = pipeline_result["fingerprints"]
    assert fp["url"].is_unique
    pages = pq.read_table(f"{fixture_dir}/pages").to_pandas()
    assert len(fp) == pages["url"].nunique()


def _pair_f1(clusters: pd.DataFrame, labeled: pd.DataFrame) -> tuple[float, pd.DataFrame]:
    cid = dict(zip(clusters["url"], clusters["cluster_id"]))
    labeled = labeled.copy()
    labeled["pred"] = [
        cid.get(a) == cid.get(b) and cid.get(a) is not None
        for a, b in zip(labeled["url_a"], labeled["url_b"])
    ]
    tp = int((labeled["is_duplicate"] & labeled["pred"]).sum())
    fp_ = int((~labeled["is_duplicate"] & labeled["pred"]).sum())
    fn = int((labeled["is_duplicate"] & ~labeled["pred"]).sum())
    prec = tp / (tp + fp_) if tp + fp_ else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return f1, labeled


def test_cluster_f1(pipeline_result, fixture_dir):
    """BASELINE.json metric: pairwise F1 >= 0.99 on labeled pairs."""
    labeled = pq.read_table(f"{fixture_dir}/labeled_pairs.parquet").to_pandas()
    f1, detail = _pair_f1(pipeline_result["clusters"], labeled)
    if f1 < 0.99:
        miss = detail[detail["is_duplicate"] != detail["pred"]]
        raise AssertionError(f"F1={f1:.4f}; misses by kind:\n"
                             f"{miss.groupby(['kind', 'is_duplicate']).size()}")
    assert f1 >= 0.99


def test_cluster_table_shape(pipeline_result):
    c = pipeline_result["clusters"]
    assert set(c.columns) == {"url", "cluster_id", "cluster_size", "is_original", "warc_ts"}
    # every cluster has exactly >=1 original; singleton rows are their own cluster
    sizes = c.groupby("cluster_id").size()
    declared = c.groupby("cluster_id")["cluster_size"].first()
    assert (sizes == declared).all()
    assert c.groupby("cluster_id")["is_original"].any().all()


def test_edges_above_threshold(pipeline_result):
    e = pipeline_result["edges"]
    assert (e["url_a"] < e["url_b"]).all()
    assert not e.duplicated(["url_a", "url_b"]).any()
    # text edges: 10 - pct/10 < 5  =>  pct > 50; exact = 100
    assert (e.loc[e["kind"] == "text", "score"] > 50.0).all()
    assert (e.loc[e["kind"] == "exact", "score"] == 100.0).all()


def test_source_provenance_column(pipeline_result):
    """B11: the provenance tag (≙ reference Location, database.py:754-759)
    is carried through the fingerprint relation; default tag is 'new'."""
    fp = pipeline_result["fingerprints"]
    assert "source" in fp.columns
    assert (fp["source"] == "new").all()


def test_determinism_across_parallelism(ray_session, fixture_dir, tmp_path_factory):
    """Same clusters at a different batch size / fresh checkpoint dir
    (SURVEY.md §5.6)."""
    out1 = tmp_path_factory.mktemp("det1")
    out2 = tmp_path_factory.mktemp("det2")
    r1 = run_repost_pipeline(f"{fixture_dir}/pages", str(out1),
                             RepostConfig(batch_size=64, num_parts=4))
    r2 = run_repost_pipeline(f"{fixture_dir}/pages", str(out2),
                             RepostConfig(batch_size=1024, num_parts=16))
    c1 = r1["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    c2 = r2["clusters"].to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        c1[["url", "cluster_id", "cluster_size"]],
        c2[["url", "cluster_id", "cluster_size"]],
    )


def test_ttl_filter(ray_session, fixture_dir, tmp_path_factory):
    """B9: rows older than the cutoff are excluded from the run."""
    from repostcheckerbot_ray.fixtures import EPOCH_BASE_US

    out = tmp_path_factory.mktemp("ttl_out")
    res = run_repost_pipeline(
        f"{fixture_dir}/pages", str(out),
        RepostConfig(ttl_cutoff_us=EPOCH_BASE_US - 86_400_000_000),
    )
    fp = res["fingerprints"].to_pandas()
    assert not fp["url"].str.contains("siteold").any()
