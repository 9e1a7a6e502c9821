"""D5 tombstone anti-join — flagship path.

The reference re-fetches each matched original and deletes dead ones from
both the store and the result (/root/reference/database.py:650-676); batch
equivalent: a tombstoned url leaves the corpus before blocking, so edges and
clusters can never reference it, while the rest of its family still links.
"""

from __future__ import annotations

import pytest

from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

DEAD = ["https://sitet0.example/exact", "https://sitehot.example/copy3"]


@pytest.fixture(scope="module")
def tomb_result(ray_session, fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("tomb_out")
    res = run_repost_pipeline(f"{fixture_dir}/pages", str(out), RepostConfig(),
                              tombstones=list(DEAD))
    return {
        "fingerprints": res["fingerprints"].to_pandas(),
        "clusters": res["clusters"].to_pandas(),
        "edges": res["edges"].to_pandas(),
    }


def test_dead_urls_absent_everywhere(tomb_result):
    dead = set(DEAD)
    assert not dead & set(tomb_result["fingerprints"]["url"])
    assert not dead & set(tomb_result["clusters"]["url"])
    e = tomb_result["edges"]
    assert not dead & (set(e["url_a"]) | set(e["url_b"]))


def test_survivors_still_cluster(tomb_result):
    cl = tomb_result["clusters"]
    cid = dict(zip(cl["url"], cl["cluster_id"]))
    # family t0 minus its tombstoned member still forms one cluster
    rest = ["https://sitet0.example/orig", "https://sitet0.example/ws",
            "https://sitet0.example/near"]
    assert len({cid[u] for u in rest}) == 1
    hot = cl[cl["url"].str.contains("sitehot")]
    assert hot["cluster_id"].nunique() == 1
    assert len(hot) == 49  # 50 copies minus the tombstoned one
