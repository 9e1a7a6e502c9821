"""Driver-contract conformance (SURVEY.md §5.5): every `queries()` entry
runs at sf0.001, and every `oracle_sql()` entry matches the Ray result via
DuckDB (row count, column names, order-insensitive values) — the same
comparison the driver performs at sf0.01.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
# data-dependent oracles (simhash VALUES CTE) must be generated from the
# SAME sf this suite compares at; the driver leaves this unset and gets
# the sf0.01 default it compares at
import os  # noqa: E402

os.environ["GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_pandas(res) -> pd.DataFrame:  # noqa: ANN001
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = pd.to_numeric(df[c], errors="ignore")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert "cluster_id" in df.columns


def test_all_queries_run(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = _to_pandas(fn(SF_DIR))
        assert df is not None, name


# every oracled entry is value-checked in-suite; importing the module for
# its keys is side-effect-free (the driver contract forbids ray.init on
# import), so new oracles are covered automatically.
import __ray_entry__ as _entry_static

@pytest.mark.parametrize("name", sorted(_entry_static.oracle_sql().keys()))
def test_query_matches_oracle(entry_mod, duck, name):
    ray_df = _canon(_to_pandas(entry_mod.queries()[name](SF_DIR)))
    sql_df = _canon(duck.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: cols {list(ray_df.columns)} vs {list(sql_df.columns)}")
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (a.astype(float) - b.astype(float)).abs().max() < 1e-9, f"{name}.{c}"
        else:
            mism = (a.astype(str) != b.astype(str))
            assert not mism.any(), f"{name}.{c}: {int(mism.sum())} mismatches"


def test_oracle_keys_subset_of_queries(entry_mod):
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_minhash_clusters_are_closure_of_verified_pairs(entry_mod, duck):
    """minhash clusters == transitive closure of the SQL-verified (brute
    force) Jaccard>=0.8 pair set (SURVEY.md §2.E4 equivalence)."""
    from repostcheckerbot_ray.state.union_find import components_from_edges

    pairs = duck.execute(entry_mod.oracle_sql()["ngram_jaccard_pairs"]).fetchall()
    comp = components_from_edges([(a, b) for a, b in pairs])
    got = _to_pandas(entry_mod.queries()["minhash_dedup_clusters"](SF_DIR))
    want = {int(i): comp.get(int(i), int(i)) for i in got["doc_id"]}
    mism = [(i, c) for i, c in zip(got["doc_id"], got["cluster_id"])
            if int(c) != want[int(i)]]
    assert not mism, mism[:10]


def test_knn_ivf_recall(entry_mod):
    """IVF approximation must keep reasonable recall vs brute force."""
    brute = _to_pandas(entry_mod.queries()["knn_cosine"](SF_DIR))
    ivf = _to_pandas(entry_mod.queries()["knn_ivf"](SF_DIR))
    b = set(zip(brute["query_id"], brute["neighbor_id"]))
    i = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    assert len(b) > 0
    assert len(b & i) / len(b) >= 0.5  # nprobe=4/16 buckets


def test_knn_lsh_recall(entry_mod):
    """Multi-table hyperplane-LSH approximation vs brute force. The bound is
    corpus-calibrated: this table's true top-10 sims are only ~0.24-0.40
    (weak concentration), so 8x8 tables scanning ~27% of vectors land
    ~0.5 recall — about 2x better than a random 27% scan; the assertion
    guards that LSH keeps beating coverage, not a tight-cluster ideal."""
    brute = _to_pandas(entry_mod.queries()["knn_cosine"](SF_DIR))
    lsh = _to_pandas(entry_mod.queries()["knn_lsh"](SF_DIR))
    b = set(zip(brute["query_id"], brute["neighbor_id"]))
    l = set(zip(lsh["query_id"], lsh["neighbor_id"]))
    assert len(b) > 0
    assert len(b & l) / len(b) >= 0.4
