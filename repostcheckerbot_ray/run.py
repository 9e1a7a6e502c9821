"""CLI entry point: `python -m repostcheckerbot_ray.run --pages <dir> --out <dir>`.

The `ray job submit` target (SURVEY.md §3 engine lifecycle): owns a Ray
session (library code never does), builds RepostConfig from flags, runs the
flagship pipeline, prints a summary. A second subcommand runs a single
registered stage by name for ad-hoc use.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:  # noqa: ANN001
    p = argparse.ArgumentParser(prog="repostcheckerbot_ray")
    p.add_argument("--pages", required=True, help="input pages parquet dir")
    p.add_argument("--out", required=True, help="output/checkpoint dir")
    p.add_argument("--threshold", type=float, default=5.0)
    p.add_argument("--num-parts", type=int, default=16)
    p.add_argument("--max-block", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--ttl-cutoff-us", type=int, default=None)
    p.add_argument("--source-tag", default="new",
                   help="provenance tag for rows without a source column "
                        "(top/hot/new, B11)")
    p.add_argument("--tombstones", default=None,
                   help="parquet file/dir with a url column of dead urls "
                        "(D5 anti-join)")
    p.add_argument("--delta-against", default=None, metavar="HISTORY_OUT",
                   help="incremental mode (A2): block+score --pages against "
                        "the fingerprint history checkpointed under this "
                        "prior --out dir, without re-fingerprinting it")
    p.add_argument("--edges-only", action="store_true",
                   help="with --delta-against: the steady-state re-poll "
                        "shape — edges/upgrades/metrics sinks only, no "
                        "corpus-sized cluster emit or report per poll")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local session size (default: all cores)")
    p.add_argument("--stage", default=None,
                   help="run one registered stage instead of the pipeline")
    p.add_argument("--query", default=None, metavar="NAME",
                   help="run one registered corpus/embedding query (any "
                        "__ray_entry__.queries() name) over --pages "
                        "(interpreted as the sf table dir) and write the "
                        "result to --out as parquet")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        import ray.data as rd

        if args.query:
            # the curation/query family as a CLI job with a parquet sink —
            # --pages is the sf table dir (documents/events/embeddings)
            import pyarrow as pa

            import __ray_entry__ as entry_mod

            qs = entry_mod.queries()
            if args.query not in qs:
                print(f"unknown query {args.query!r}; known: "
                      f"{sorted(qs)}", file=sys.stderr)
                return 2
            out = qs[args.query](args.pages)
            if isinstance(out, pa.Table):
                out = rd.from_arrow(out)
            elif not hasattr(out, "write_parquet"):  # pandas DataFrame
                out = rd.from_pandas(out)
            # materialize once, then write + count the materialized blocks —
            # count() on the lazy ds would re-execute the whole query DAG
            # (for repost_clusters that is a second full pipeline run)
            out = out.materialize()
            out.write_parquet(args.out)
            print(json.dumps({"query": args.query, "rows": out.count(),
                              "out": args.out}))
            return 0

        if args.stage:
            from .stages import registry

            ds = rd.read_parquet(args.pages)
            out = registry.get(args.stage).apply(
                ds, {"num_parts": args.num_parts, "batch_size": args.batch_size})
            out.write_parquet(args.out)
            print(json.dumps({"stage": args.stage, "rows": out.count()}))
            return 0

        from .pipelines.repost import (
            RepostConfig,
            run_repost_delta,
            run_repost_pipeline,
        )

        cfg = RepostConfig(
            threshold=args.threshold, num_parts=args.num_parts,
            max_block=args.max_block, batch_size=args.batch_size,
            ttl_cutoff_us=args.ttl_cutoff_us, source_tag=args.source_tag,
        )
        tombstones = None
        if args.tombstones:
            tombstones = rd.read_parquet(args.tombstones, columns=["url"])
        if args.delta_against:
            res = run_repost_delta(args.delta_against, args.pages, args.out,
                                   cfg, tombstones=tombstones,
                                   emit_clusters=not args.edges_only)
        else:
            res = run_repost_pipeline(args.pages, args.out, cfg,
                                      tombstones=tombstones)
        summary = {
            "edges": res["edges"].count(),
            "clusters": (res["clusters"].count()
                         if res["clusters"] is not None else None),
            "out": args.out,
        }
        print(json.dumps(summary))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
