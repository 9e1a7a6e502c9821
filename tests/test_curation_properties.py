"""Hypothesis property pins for the curation/aggregate families against
their DuckDB oracles on GENERATED corpora — duplicate texts, empty strings,
single-char docs, skewed langs: the cases a fixed sf corpus undersamples.

Examples are few (one Ray job each) but drawn from tiny alphabets to force
collisions on every run.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TEXTS = st.sampled_from([
    "", "a", "aa b", "the same text", "the same  text", "x y z",
    "the same text ", "THE SAME TEXT",
    # non-ASCII whitespace (NBSP / ideographic space / NEL): engine and
    # oracle both tokenize with RE2 over textnorm.WS_REGEX_CLASS — these
    # literals caught Arrow utf8_split_whitespace returning NONDETERMINISTIC
    # results for U+00A0 in Ray workers (round 5), which is why the
    # property kernels are banned from oracled paths
    "a b", "　x　", "nelnel", " ", "a   b",
])
_DOC = st.tuples(_TEXTS, st.sampled_from(["en", "de"]),
                 st.integers(min_value=0, max_value=400))


def _docs_dir(rows: list[tuple], tmp_path) -> str:
    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["new"] * len(rows), pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })
    d = tmp_path / f"sf_{abs(hash(tuple(rows))) % 10**8}"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _check(rows: list[tuple], tmp_path, which: str) -> None:
    from repostcheckerbot_ray.pipelines import corpus_ops

    import __ray_entry__ as entry_mod

    d = _docs_dir(rows, tmp_path)
    got = getattr(corpus_ops, which)(d).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = con.execute(entry_mod.oracle_sql()[which]).fetchdf()
    cols = sorted(want.columns)
    if got.empty:
        assert want.empty
        return
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_contamination_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("ct"), "contamination_check")


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_top_terms_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("tt"), "top_terms_per_lang")


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_length_band_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("lb"), "length_band_filter")


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_token_counts_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("tc"), "token_counts")


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_repetition_stats_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("rp"), "repetition_stats")


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_bpe_token_counts_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("bp"), "bpe_token_counts")


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_char_counts_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("cc"), "char_counts")


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_DOC, min_size=1, max_size=40))
def test_lang_counts_matches_oracle(ray_session, tmp_path_factory, rows):
    _check(rows, tmp_path_factory.mktemp("lc"), "lang_counts")
