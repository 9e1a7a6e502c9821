"""repostcheckerbot_ray — a Ray-Data-native entity-resolution (repost/duplicate
detection) engine built from scratch.

Capability parity target: A1igator/RepostCheckerBot (see SURVEY.md) — an
incremental fingerprint → exact-lookup → fuzzy-scan → cluster pipeline —
re-expressed as a batch Ray Data pipeline over Parquet web-page tables:

    read_parquet(pages)
      -> map_batches(ExtractFingerprint actor pool)   # warmed HTML parser
      -> exact dedup on url (groupby)                 # SURVEY.md 2.D1
      -> exact-match edges on content_hash (groupby)  # SURVEY.md 2.D2
      -> MinHash-LSH / SimHash banding (flat-map + groupby, hot bands salted)
      -> within-block pairwise scoring (map_groups)   # SURVEY.md 2.D3/F1-F4
      -> edge dedup (groupby pair key)                # SURVEY.md 2.D4
      -> union-find transitive closure -> clusters
      -> write_parquet (edges, clusters, metrics), per-partition checkpoints

Everything here derives from public knowledge only: the Ray Data / pyarrow
public APIs and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
