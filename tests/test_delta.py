"""Incremental/delta ingest (A2, SURVEY.md §2.G).

Done-criterion: a delta run over new files blocked against persisted history
produces the SAME clusters as a full recompute, while the history
fingerprint checkpoints are never rewritten (mtime check) — the batch
equivalent of the reference's resolve-new-against-accumulated-history loop
(/root/reference/app.py:137,210; database.py:328-358).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pandas as pd
import pytest

from repostcheckerbot_ray.pipelines.repost import (
    RepostConfig,
    run_repost_delta,
    run_repost_pipeline,
)


@pytest.fixture(scope="module")
def split_fixture(fixture_dir, tmp_path_factory):
    """History = first half of the page shards, delta = the rest. The
    fixture's duplicate-url rows are generated last (delta side), so
    cross-run D1 (history wins) coincides with min-warc_ts D1."""
    root = tmp_path_factory.mktemp("delta_split")
    shards = sorted(glob.glob(f"{fixture_dir}/pages/*.parquet"))
    assert len(shards) >= 4
    hist_dir = root / "hist_pages"
    delta_dir = root / "delta_pages"
    hist_dir.mkdir()
    delta_dir.mkdir()
    for s in shards[: len(shards) // 2]:
        shutil.copy(s, hist_dir / os.path.basename(s))
    for s in shards[len(shards) // 2:]:
        shutil.copy(s, delta_dir / os.path.basename(s))
    return {"root": str(root), "hist": str(hist_dir), "delta": str(delta_dir)}


def _cluster_frame(res) -> pd.DataFrame:  # noqa: ANN001
    df = res["clusters"].to_pandas()[["url", "cluster_id", "cluster_size"]]
    return df.sort_values("url").reset_index(drop=True)


def test_delta_matches_full_recompute(ray_session, fixture_dir, split_fixture):
    cfg = RepostConfig()
    root = split_fixture["root"]

    full = run_repost_pipeline(f"{fixture_dir}/pages", f"{root}/out_full", cfg)
    hist = run_repost_pipeline(split_fixture["hist"], f"{root}/out_hist", cfg)
    assert hist["fingerprints"].count() > 0

    fp_files = sorted(glob.glob(
        f"{root}/out_hist/checkpoints/fingerprints/part=*.parquet"))
    mtimes_before = {f: os.stat(f).st_mtime_ns for f in fp_files}

    delta = run_repost_delta(f"{root}/out_hist", split_fixture["delta"],
                             f"{root}/out_delta", cfg)

    # history partitions untouched: no re-fingerprinting happened
    mtimes_after = {f: os.stat(f).st_mtime_ns for f in fp_files}
    assert mtimes_after == mtimes_before

    got = _cluster_frame(delta)
    want = _cluster_frame(full)
    pd.testing.assert_frame_equal(got, want)


def test_delta_drops_already_logged_urls(ray_session, split_fixture):
    """Cross-run D1: a delta url already in history must appear exactly once
    in the combined fingerprint relation (reference is_logged skip)."""
    import pyarrow.parquet as pq

    root = split_fixture["root"]
    fp = pq.read_table(
        glob.glob(f"{root}/out_delta/checkpoints/fingerprints/part=*.parquet")[0]
    )
    hist_urls = set()
    for f in glob.glob(f"{root}/out_hist/checkpoints/fingerprints/part=*.parquet"):
        hist_urls.update(pq.read_table(f, columns=["url"])["url"].to_pylist())
    delta_urls = fp["url"].to_pylist()
    assert not (set(delta_urls) & hist_urls)


def test_delta_rejects_num_parts_mismatch(ray_session, split_fixture, tmp_path):
    """The co-partitioned anti-join / text attach index history part FILES
    by the delta run's part number — a num_parts mismatch must fail loudly,
    never silently drop dedup or edges."""
    hist_out = str(tmp_path / "hist_np4")
    run_repost_pipeline(split_fixture["hist"], hist_out,
                        RepostConfig(num_parts=4))
    with pytest.raises(ValueError, match="num_parts"):
        run_repost_delta(hist_out, split_fixture["delta"],
                         str(tmp_path / "delta_np8"),
                         RepostConfig(num_parts=8))


def test_delta_combiner_with_new_exact_copy_of_history_content(ray_session, tmp_path):
    """The text-band combiner keeps one row per distinct content per batch;
    when a NEW page is an exact copy of a HISTORY page, the history rep may
    be the survivor and the text run then looks pure-history — the cluster
    must still be complete via the exact-channel star edge plus the re-used
    history edge. Pin: delta clusters == full recompute on exactly that
    shape (both orderings of the url min)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = "x " + " ".join(f"tok{i}" for i in range(120))
    near = "x " + " ".join(f"tok{i}" for i in range(118)) + " zz yy"

    def pages(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "html": pa.array([b"" for _ in rows], pa.binary()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            }
        )

    # copy url sorts BEFORE the history url in one case, AFTER in the other
    for copy_url in ("http://a-copy", "http://z-copy"):
        root = tmp_path / copy_url.split("//")[1]
        hist = root / "hist"; delta = root / "delta"; full = root / "full"
        hist.mkdir(parents=True); delta.mkdir(); full.mkdir()
        h_rows = [("http://h-orig", 1_000_000, base),
                  ("http://h-near", 2_000_000, near)]
        d_rows = [(copy_url, 3_000_000, base)]
        pq.write_table(pages(h_rows), hist / "p0.parquet")
        pq.write_table(pages(d_rows), delta / "p0.parquet")
        pq.write_table(pages(h_rows + d_rows), full / "p0.parquet")

        cfg = RepostConfig(num_parts=4)
        run_repost_pipeline(str(hist), str(root / "hist_out"), cfg)
        dres = run_repost_delta(str(root / "hist_out"), str(delta),
                                str(root / "delta_out"), cfg)
        fres = run_repost_pipeline(str(full), str(root / "full_out"), cfg)

        want = fres["clusters"].to_pandas()[["url", "cluster_id"]]
        got = dres["clusters"].to_pandas()[["url", "cluster_id"]]
        want = want.sort_values("url").reset_index(drop=True)
        got = got.sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        # all three pages in ONE cluster
        assert want["cluster_id"].nunique() == 1


def test_delta_source_upgrade(ray_session, tmp_path):
    """D6 in the delta path (reference database.py:344-350): a delta url
    ALREADY logged in history, rescanned under a higher-precedence source,
    gets its provenance upgraded in the delta run's fingerprint view —
    while warc_ts/content stay first-writer (the repeat post itself is
    still dropped). Lower/equal-precedence rescans change nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def pages(rows):
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "html": pa.array([b"" for _ in rows], pa.binary()),
                "text": pa.array([r[2] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
            }
        )

    hist = tmp_path / "hist"; delta = tmp_path / "delta"
    hist.mkdir(); delta.mkdir()
    texts = {u: f"doc {u} " + " ".join(f"w{u}{i}" for i in range(30))
             for u in "abcd"}
    h_rows = [("http://a", 1_000_000, texts["a"], "new"),
              ("http://b", 2_000_000, texts["b"], "hot"),
              ("http://c", 3_000_000, texts["c"], "top")]
    d_rows = [("http://a", 9_000_000, texts["a"], "top"),   # upgrade new->top
              ("http://b", 9_000_000, texts["b"], "new"),   # downgrade: no-op
              ("http://c", 9_000_000, texts["c"], "top"),   # equal: no-op
              ("http://d", 9_000_000, texts["d"], "hot")]   # genuinely new
    pq.write_table(pages(h_rows), hist / "p0.parquet")
    pq.write_table(pages(d_rows), delta / "p0.parquet")

    cfg = RepostConfig(num_parts=4)
    run_repost_pipeline(str(hist), str(tmp_path / "out_hist"), cfg)
    res = run_repost_delta(str(tmp_path / "out_hist"), str(delta),
                           str(tmp_path / "out_delta"), cfg)

    fp = res["fingerprints"].to_pandas().set_index("url")
    assert fp.loc["http://a", "source"] == "top"      # upgraded
    assert fp.loc["http://b", "source"] == "hot"      # not downgraded
    assert fp.loc["http://c", "source"] == "top"      # unchanged
    assert fp.loc["http://d", "source"] == "hot"      # delta's own row
    # first-writer-wins on everything else: history ts kept for a/b/c
    assert int(fp.loc["http://a", "warc_ts"].value) // 1000 == 1_000_000
    # A6 update-sink record
    up = pq.read_table(
        str(tmp_path / "out_delta" / "source_upgrades.parquet")).to_pandas()
    assert list(up["url"]) == ["http://a"]
    assert list(up["source"]) == ["top"]


def test_delta_edges_only_emit(ray_session, split_fixture):
    """emit_clusters=False (the steady-state re-poll shape, reference
    app.py:210): the edge sink must be IDENTICAL to the full-emit delta's,
    while no cluster/report output is produced and clusters comes back
    None. Upgrades/metrics sinks still write."""
    import glob as _glob

    import pyarrow.parquet as pq

    root = split_fixture["root"]
    out = f"{root}/out_delta_edges_only"
    res = run_repost_delta(f"{root}/out_hist", split_fixture["delta"],
                           out, RepostConfig(), emit_clusters=False)
    assert res["clusters"] is None
    assert not os.path.isdir(f"{out}/clusters")
    assert not os.path.exists(f"{out}/report.md")
    assert os.path.exists(f"{out}/metrics.parquet")

    def edge_frame(d):
        files = sorted(_glob.glob(f"{d}/edges/*.parquet"))
        t = pd.concat([pq.read_table(f).to_pandas() for f in files])
        return (t[["url_a", "url_b", "score", "kind"]]
                .sort_values(["url_a", "url_b", "kind"])
                .reset_index(drop=True))

    # out_delta was written by test_delta_matches_full_recompute (module
    # fixture ordering) with the default full emit
    pd.testing.assert_frame_equal(edge_frame(out),
                                  edge_frame(f"{root}/out_delta"))


def test_delta_resume_preserves_upgrades(ray_session, tmp_path):
    """The D6 upgrade records are written as per-part side files INSIDE the
    delta fingerprint exchange. Resume semantics: (a) a rerun into the same
    out_dir (all parts checkpointed — the transform never reruns) must
    still apply/report the same upgrades from the surviving side files;
    (b) a kill between a part's write and the next (simulated by deleting
    one part's manifest AND its upgrade side file) must recompute exactly
    that part and restore its upgrade record; (c) a CONFIG change must wipe
    the side dir (hash guard) so stale upgrade files can never leak into a
    differently-configured run."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from repostcheckerbot_ray.pipelines.repost import (
        _part_of_key,
        _read_upgrades,
    )

    def pages(rows):
        return pa.table({
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "html": pa.array([b"" for _ in rows], pa.binary()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
        })

    hist = tmp_path / "hist"; delta = tmp_path / "delta"
    hist.mkdir(); delta.mkdir()
    texts = {u: f"doc {u} " + " ".join(f"w{u}{i}" for i in range(30))
             for u in "ab"}
    pq.write_table(pages([("http://a", 1_000_000, texts["a"], "new"),
                          ("http://b", 2_000_000, texts["b"], "new")]),
                   hist / "p0.parquet")
    pq.write_table(pages([("http://a", 9_000_000, texts["a"], "top"),
                          ("http://b", 9_000_000, texts["b"], "hot")]),
                   delta / "p0.parquet")

    cfg = RepostConfig(num_parts=4)
    run_repost_pipeline(str(hist), str(tmp_path / "out_hist"), cfg)
    out = str(tmp_path / "out_delta")
    want = {"http://a": "top", "http://b": "hot"}

    res1 = run_repost_delta(str(tmp_path / "out_hist"), str(delta), out, cfg)
    up_dir = os.path.join(out, "checkpoints", "delta_upgrades")
    assert _read_upgrades(up_dir, cfg.num_parts) == want

    # (a) full resume: nothing recomputes, upgrades still applied/reported
    res2 = run_repost_delta(str(tmp_path / "out_hist"), str(delta), out, cfg)
    fp = res2["fingerprints"].to_pandas().set_index("url")
    assert fp.loc["http://a", "source"] == "top"
    assert fp.loc["http://b", "source"] == "hot"
    up = pq.read_table(os.path.join(out, "source_upgrades.parquet")).to_pandas()
    assert dict(zip(up["url"], up["source"])) == want

    # (b) kill-mid-run: drop ONE url's fingerprint part manifest + upgrade
    # side file; the rerun must restore that part's upgrade record
    part_a = _part_of_key("http://a", cfg.num_parts)
    os.remove(os.path.join(out, "checkpoints", "fingerprints",
                           f"part={part_a}.manifest.json"))
    os.remove(os.path.join(up_dir, f"part={part_a}.parquet"))
    run_repost_delta(str(tmp_path / "out_hist"), str(delta), out, cfg)
    assert _read_upgrades(up_dir, cfg.num_parts) == want

    # (c) config change wipes the side dir (no stale upgrade leakage)
    cfg2 = RepostConfig(num_parts=4, threshold=6.0)
    with open(os.path.join(up_dir, "_hash.json")) as f:
        guard_before = json.load(f)["config_hash"]
    assert _glob.glob(os.path.join(up_dir, "*.parquet"))
    run_repost_delta(str(tmp_path / "out_hist"), str(delta), out, cfg2)
    with open(os.path.join(up_dir, "_hash.json")) as f:
        assert json.load(f)["config_hash"] != guard_before  # guard rewritten
    assert _read_upgrades(up_dir, cfg2.num_parts) == want  # re-derived
