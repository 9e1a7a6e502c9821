"""Report rendering — the A8 sink (markdown match table) + B10 age formatter.

The reference replies to a repost with a markdown table of matches
(/root/reference/app.py:179-206: columns Link | Posted | Match %) using a
cascading human age label (database.py:678-694) built on a month-delta
helper (database.py:58-67). Batch equivalent: a small driver-side render of
the top clusters/edges — never part of the hot path.
"""

from __future__ import annotations

_MONTH_US = None  # months are calendar-dependent; approximated below


def month_delta(earlier_s: int, later_s: int) -> int:
    """Whole months between two epoch-second stamps (calendar-true,
    mirroring the reference's date arithmetic at database.py:58-67)."""
    import datetime as dt

    a = dt.datetime.fromtimestamp(earlier_s, dt.timezone.utc)
    b = dt.datetime.fromtimestamp(later_s, dt.timezone.utc)
    months = (b.year - a.year) * 12 + (b.month - a.month)
    if b.day < a.day:
        months -= 1
    return max(0, months)


def humanize_age(earlier_s: int, later_s: int) -> str:
    """Cascading label: months → days → hours → minutes → seconds
    (reference semantics, database.py:678-694)."""
    m = month_delta(earlier_s, later_s)
    if m > 0:
        return f"{m} month{'s' if m != 1 else ''}"
    secs = max(0, later_s - earlier_s)
    days = secs // 86_400
    if days > 0:
        return f"{days} day{'s' if days != 1 else ''}"
    hours = secs // 3_600
    if hours > 0:
        return f"{hours} hour{'s' if hours != 1 else ''}"
    mins = secs // 60
    if mins > 0:
        return f"{mins} minute{'s' if mins != 1 else ''}"
    return f"{secs} second{'s' if secs != 1 else ''}"


def render_match_table(rows: list[dict]) -> str:
    """rows: [{url, original_url, age, score}] -> the reference's markdown
    match table (app.py:185-195 layout, generalized)."""
    lines = [
        "| Original | Age at repost | Match % |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['original_url']} | {r['age']} | {r['score']:.1f} |")
    return "\n".join(lines)


def render_cluster_report(clusters_df, edges_df, top_k: int = 20,
                          max_rows_per_cluster: int = 50) -> str:  # noqa: ANN001
    """Driver-side render of the largest repost clusters (pandas inputs —
    call on small/limited results only). Edge scores are pre-indexed into a
    dict (one pass) so rendering is O(members), not O(members × edges)."""
    out = ["# Repost report", ""]
    sizes = (
        clusters_df[clusters_df["cluster_size"] > 1]
        .groupby("cluster_id")["cluster_size"].first()
        .sort_values(ascending=False).head(top_k)
    )
    wanted = set(sizes.index)
    members_df = clusters_df[clusters_df["cluster_id"].isin(wanted)]
    ts = dict(zip(members_df["url"], members_df["warc_ts"]))
    best: dict[str, float] = {}
    for a, b, sc in zip(edges_df["url_a"], edges_df["url_b"], edges_df["score"]):
        if best.get(a, -1.0) < sc:
            best[a] = sc
        if best.get(b, -1.0) < sc:
            best[b] = sc
    by_cluster = dict(iter(members_df.groupby("cluster_id")))
    for cid, size in sizes.items():
        members = by_cluster[cid]
        orig = members[members["is_original"]]["url"].iloc[0]
        out.append(f"## cluster {cid} ({int(size)} posts, original: {orig})")
        rows = []
        t0 = ts[orig]
        for u in members[~members["is_original"]]["url"].head(max_rows_per_cluster):
            age = humanize_age(int(t0.timestamp()), int(ts[u].timestamp()))
            rows.append({"url": u, "original_url": orig, "age": age,
                         "score": best.get(u, 100.0)})
        out.append(render_match_table(rows))
        out.append("")
    return "\n".join(out)
