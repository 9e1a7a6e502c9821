"""Report rendering (A8/B10) and stage registry (§2.H) tests."""

from __future__ import annotations

import pandas as pd

from repostcheckerbot_ray.functions.report import (
    humanize_age,
    month_delta,
    render_match_table,
)
from repostcheckerbot_ray.stages import registry


def test_month_delta():
    import datetime as dt

    def ts(y, m, d):
        return int(dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp())

    assert month_delta(ts(2024, 1, 15), ts(2024, 3, 15)) == 2
    assert month_delta(ts(2024, 1, 15), ts(2024, 3, 14)) == 1
    assert month_delta(ts(2024, 1, 1), ts(2024, 1, 30)) == 0


def test_humanize_age_cascade():
    base = 1_700_000_000
    assert humanize_age(base, base + 90 * 86400) == "2 months"
    assert humanize_age(base, base + 3 * 86400) == "3 days"
    assert humanize_age(base, base + 7200) == "2 hours"
    assert humanize_age(base, base + 120) == "2 minutes"
    assert humanize_age(base, base + 30) == "30 seconds"
    assert humanize_age(base, base + 1) == "1 second"


def test_render_match_table():
    md = render_match_table(
        [{"url": "b", "original_url": "a", "age": "2 days", "score": 93.25}]
    )
    assert "| a | 2 days | 93.2 |" in md
    assert md.splitlines()[0].startswith("| Original |")


def test_registry_builtins():
    assert {"fingerprint", "dedup_by_url", "explode_text_bands",
            "media_features"} <= set(registry.names())
    st = registry.get("fingerprint")
    assert hasattr(st, "apply")


def test_registry_custom_stage_roundtrip():
    import pytest

    s = registry.FnStage("test_noop", lambda ds, ctx: ds)
    registry.register(s)
    assert registry.get("test_noop") is s
    with pytest.raises(ValueError):
        registry.register(registry.FnStage("test_noop", lambda ds, ctx: ds))
    with pytest.raises(KeyError):
        registry.get("never_registered")


def test_report_written_by_pipeline(ray_session, fixture_dir, tmp_path_factory):
    import os

    from repostcheckerbot_ray.pipelines.repost import RepostConfig, run_repost_pipeline

    out = tmp_path_factory.mktemp("report_out")
    run_repost_pipeline(f"{fixture_dir}/pages", str(out), RepostConfig())
    path = os.path.join(str(out), "report.md")
    assert os.path.exists(path)
    text = open(path).read()
    assert "# Repost report" in text
    assert "sitehot" in text  # the 50-copy hot family must be a top cluster
    assert "| Original |" in text
