"""Integration pins for the two queries with no SQL oracle AND no prior
value-level test: the distributed query output must equal direct
application of the pure functions / extractor to the same rows — this
pins values end-to-end (read → actor pool → output), not just shape.
"""

from __future__ import annotations

import glob

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_text_analysis_matches_pure_functions(ray_session):
    from repostcheckerbot_ray.functions.textstats import (
        doc_fingerprint,
        lang_id,
        quality_features,
        quality_score,
    )
    from repostcheckerbot_ray.pipelines import corpus_ops

    got = corpus_ops.text_analysis(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    assert len(got) == len(docs)
    # sample across the whole id range, not just the first read partition
    for _, r in docs.iloc[::20].iterrows():
        lg, cf = lang_id(r.text.lower().split())
        f = quality_features(r.text)
        row = got.loc[r.doc_id]
        assert row.lang_pred == lg
        assert row.lang_conf == round(cf, 6)
        assert row.quality == quality_score(f)
        assert row.n_tokens == int(f["n_tokens"])
        assert row.fingerprint == f"{doc_fingerprint(r.text):016x}"


def test_media_features_matches_direct_extractor(ray_session, fixture_dir):
    import ray.data as rd

    from repostcheckerbot_ray.stages.multimodal import (
        MediaFeatureExtractor,
        media_features,
    )

    pages = rd.read_parquet(f"{fixture_dir}/pages", columns=["url", "html"])
    got = media_features(pages).to_pandas()

    shards = sorted(glob.glob(f"{fixture_dir}/pages/*.parquet"))
    tbl = pa.concat_tables(
        [pq.read_table(s, columns=["url", "html"]) for s in shards])
    want = MediaFeatureExtractor()(tbl).to_pandas()

    def norm(df):
        df = df.copy()
        df["feature"] = df["feature"].map(tuple)
        return df.sort_values("url").reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(norm(got), norm(want))
