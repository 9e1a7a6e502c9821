"""Hypothesis property pins for the temporal operator family (round-3
VERDICT ask #9): window_dedup_events and session_counts checked against
their DuckDB SQL oracles on GENERATED event streams — timestamp ties,
negative (pre-1970) epochs, single-user skew, empty-ish streams — the edge
cases a fixed sf corpus never exercises.

One Ray job per example is expensive, so examples are few but adversarial:
ids/timestamps are drawn from tiny ranges to force collisions, and two
hand-picked regression streams (all-ties, all-one-user) always run.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),                  # user_id: tiny → skew
    # µs timestamps around the epoch, ±2h, snapped to 13-min steps so gap
    # comparisons straddle the 30-min debounce/session boundary often;
    # negative values exercise pre-1970 integer math
    st.integers(min_value=-10, max_value=10).map(lambda k: k * 13 * 60 * 1_000_000),
    st.sampled_from(["click", "view", "error", "purchase"]),  # event_type
)


def _events_table(rows: list[tuple]) -> pa.Table:
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })


def _check_against_oracle(rows: list[tuple], tmp_path, which: str) -> None:
    from repostcheckerbot_ray.pipelines import corpus_ops

    import __ray_entry__ as entry_mod

    d = tmp_path / f"sf_{abs(hash(tuple(rows))) % 10**8}_{which}"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(_events_table(rows), str(d / "events.parquet"))

    fn = getattr(corpus_ops, which)
    got = fn(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d / 'events.parquet'}')")
    want = con.execute(entry_mod.oracle_sql()[which]).fetchdf()
    cols = sorted(want.columns)
    if got.empty:
        assert want.empty
        return
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EVENT, min_size=1, max_size=60))
def test_window_dedup_matches_oracle(ray_session, tmp_path_factory, rows):
    _check_against_oracle(rows, tmp_path_factory.mktemp("wd"),
                          "window_dedup_events")


@settings(max_examples=12, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EVENT, min_size=1, max_size=60))
def test_session_counts_matches_oracle(ray_session, tmp_path_factory, rows):
    _check_against_oracle(rows, tmp_path_factory.mktemp("sc"),
                          "session_counts")


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EVENT, min_size=1, max_size=60))
def test_asof_join_matches_oracle(ray_session, tmp_path_factory, rows):
    _check_against_oracle(rows, tmp_path_factory.mktemp("aj"),
                          "asof_join_events")


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EVENT, min_size=1, max_size=60))
def test_range_join_matches_oracle(ray_session, tmp_path_factory, rows):
    _check_against_oracle(rows, tmp_path_factory.mktemp("rj"),
                          "range_join_events")


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(_EVENT, min_size=1, max_size=60))
def test_hopping_window_matches_oracle(ray_session, tmp_path_factory, rows):
    # pre-1970 negative epochs are the killer case here (floor vs truncate
    # division — the round-3 oracle fix); the generator emits them
    _check_against_oracle(rows, tmp_path_factory.mktemp("hw"),
                          "hopping_window_counts")


def test_temporal_handpicked_regressions(ray_session, tmp_path_factory):
    """Always-run adversarial streams: every event at ONE timestamp for ONE
    user (pure tie-breaking), and a pre-1970 stream (negative epoch_us)."""
    all_ties = [(1, 0, "click")] * 20
    negative = [(2, -7 * 24 * 3600 * 1_000_000 + i * 900_000_000, "view")
                for i in range(15)]
    for rows in (all_ties, negative, all_ties + negative):
        _check_against_oracle(rows, tmp_path_factory.mktemp("hp"),
                              "window_dedup_events")
        _check_against_oracle(rows, tmp_path_factory.mktemp("hp"),
                              "session_counts")


def test_asof_range_overflow_fallback_matches_fast_path(
        ray_session, tmp_path_factory, monkeypatch):
    """The composite-key fast path and the per-user-loop fallback (taken
    when n_users × ts-span would overflow int64) must agree exactly.
    Forces the fallback by patching _user_ts_keys to return None."""
    from repostcheckerbot_ray.pipelines import corpus_ops

    rows = []
    # 3 users, ts ties, same-ts probe/ref pairs, a user with no refs
    for u in range(3):
        for i in range(12):
            ts = (i // 2) * 9 * 60 * 1_000_000  # pairs of equal timestamps
            typ = ["click", "error", "purchase", "view"][(i + u) % 4]
            rows.append((u, ts, typ))
    d = tmp_path_factory.mktemp("fb")
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    import pyarrow.parquet as pq
    pq.write_table(t, str(d / "events.parquet"))

    def run_both(which):
        fn = getattr(corpus_ops, which)
        fast = fn(str(d)).to_pandas()
        monkeypatch.setattr(corpus_ops, "_user_ts_keys",
                            lambda uid, ts, pad: None)
        slow = fn(str(d)).to_pandas()
        monkeypatch.undo()
        cols = sorted(fast.columns)
        import pandas as pd
        pd.testing.assert_frame_equal(
            fast[cols].sort_values(cols).reset_index(drop=True),
            slow[cols].sort_values(cols).reset_index(drop=True))
        assert len(fast) > 0

    run_both("asof_join_events")
    run_both("range_join_events")
