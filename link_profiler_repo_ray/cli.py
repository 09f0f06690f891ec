"""CLI entry point — the ``ray job submit`` surface.

    ray job submit -- python -m link_profiler_repo_ray.cli crawl \\
        --sf-dir /root/testdata/sf0.01 --checkpoint /tmp/ck --resume

Subcommands:
- ``crawl``    run the politeness-budgeted frontier crawl (checkpointed,
               resumable)
- ``bfs``      politeness-off BFS mode
- ``profiles`` full-corpus link-profile aggregation to Parquet
- ``curate``   end-to-end corpus curation (clean → gates → dedup →
               scrub → partitioned Parquet corpus + packing bin map)
- ``query``    run any registry.queries() entry; ``stats`` prints a
               crawl's per-round metrics stream
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="link_profiler_repo_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("crawl", "bfs"):
        c = sub.add_parser(name)
        c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        c.add_argument("--multiplier", type=int, default=1)
        c.add_argument("--checkpoint", default=None)
        c.add_argument("--output", default=None)
        c.add_argument("--resume", action="store_true")
        c.add_argument("--max-pages", type=int, default=None)
        c.add_argument("--max-depth", type=int, default=3)
        c.add_argument("--budget", type=int, default=2, help="max fetches per host per round")
        c.add_argument("--shards", type=int, default=8)
        c.add_argument("--fetchers", type=int, default=8)
        c.add_argument("--checkpoint-every", type=int, default=1)
        c.add_argument("--politeness-mode", choices=["fixed", "adaptive"], default="fixed")
        c.add_argument(
            "--seen-backend", choices=["exact", "cuckoo"], default=None,
            help="default: exact (cuckoo under --scale-profile)",
        )
        c.add_argument("--no-breaker", action="store_true")
        c.add_argument(
            "--fetch-mode", choices=["replay", "real"], default="replay",
            help="'real' crawls live HTTP (requires --seeds-file)",
        )
        c.add_argument(
            "--seeds-file", default=None,
            help="JSON file: [{url, priority}] explicit seed list (or CDX output)",
        )
        c.add_argument(
            "--scale-profile", action="store_true",
            help="CrawlConfig.scale(): no driver collection, cuckoo seen "
                 "backend — the 100-TB defaults (requires --output or --checkpoint)",
        )
        c.add_argument(
            "--alerting", action="store_true",
            help="evaluate alert rules per page update in the fetch actors "
                 "(alert_service.py shape); raw alerts persist to <out>/alerts/",
        )

    st = sub.add_parser("stats", help="print a crawl run's per-round metrics stream (A8)")
    st.add_argument("--dir", required=True, help="crawl output/checkpoint dir holding stats.jsonl")
    st.add_argument("--tail", type=int, default=None, help="only the last N rounds")

    p = sub.add_parser("profiles")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--multiplier", type=int, default=1)
    p.add_argument("--out", required=True)

    cu = sub.add_parser(
        "curate",
        help="end-to-end corpus curation: clean → gates → dedup → scrub "
        "→ partitioned corpus + sequence-packing bin map",
    )
    cu.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    cu.add_argument("--out", required=True)
    cu.add_argument("--budget", type=int, default=512, help="tokens per packed sequence")

    en = sub.add_parser(
        "encode",
        help="chunk documents and encode them into the embeddings-table "
        "layout (vec_id-sorted parquet) for the ANN/quantize/semdedup "
        "consumers",
    )
    en.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    en.add_argument("--out", required=True)
    en.add_argument("--dim", type=int, default=16)
    en.add_argument("--chunk-size", type=int, default=128)
    en.add_argument("--stride", type=int, default=96)

    co = sub.add_parser(
        "compact",
        help="compact a crawl's page-delta log into a host-sharded, "
        "URL-deduplicated, manifest-tracked table (idempotent)",
    )
    co.add_argument("--pages-dir", required=True, help="crawl output's pages/ directory")
    co.add_argument("--out", required=True)
    co.add_argument("--shards", type=int, default=16)

    # generic job-type dispatch (the reference's 12-type registry,
    # crawl_service.py:215-264 → registry.queries())
    q = sub.add_parser("query")
    q.add_argument("--name", required=True, help="a registry.queries() key, or 'list'")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out", default=None, help="output path (default: print row count)")
    q.add_argument(
        "--fmt", choices=["parquet", "csv", "jsonl", "excel", "pdf"], default="parquet"
    )

    args = ap.parse_args(argv)

    if getattr(args, "scale_profile", False) and not (args.output or args.checkpoint):
        # scale() turns off all driver-side collection, so a run with
        # no persistence target would silently discard every result
        ap.error("--scale-profile requires --output or --checkpoint")

    if args.cmd == "query" and args.name == "list":
        from .registry import queries

        print(json.dumps(sorted(queries())))
        return 0

    if args.cmd == "stats":
        # pure file read — no Ray session
        import os

        path = os.path.join(args.dir, "stats.jsonl")
        if not os.path.exists(path):
            print(json.dumps({"error": f"no stats.jsonl under {args.dir!r}"}))
            return 2
        with open(path) as fh:
            rows = [json.loads(line) for line in fh if line.strip()]
        for r in rows[-args.tail:] if args.tail else rows:
            print(json.dumps(r))
        timers = ("t_admit", "t_fetch", "t_order", "t_expand", "t_checkpoint")
        busy = sum(sum(r.get(k, 0.0) for k in timers) for r in rows)
        pages = sum(r.get("pages_fetched", 0) for r in rows)
        print(
            json.dumps(
                {
                    "rounds": len(rows),
                    "pages_fetched": pages,
                    "busy_sec": round(busy, 3),
                    "pages_per_sec": round(pages / busy, 3) if busy else 0.0,
                }
            ),
            file=sys.stderr,
        )
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    try:
        if args.cmd in ("crawl", "bfs"):
            from .pipelines.crawl import CrawlConfig, run_crawl

            seeds = None
            if args.seeds_file:
                with open(args.seeds_file) as fh:
                    seeds = json.load(fh)
            ctor = CrawlConfig.scale if args.scale_profile else CrawlConfig
            kwargs = dict(
                politeness=(args.cmd == "crawl"),
                politeness_mode=args.politeness_mode,
                max_pages=args.max_pages,
                max_depth=args.max_depth,
                max_per_host_per_round=args.budget,
                num_seen_shards=args.shards,
                num_fetchers=args.fetchers,
                checkpoint_dir=args.checkpoint,
                output_dir=args.output,
                collect_edges=False,
                resume=args.resume,
                checkpoint_every=args.checkpoint_every,
                breaker_enabled=not args.no_breaker,
                fetch_mode=args.fetch_mode,
                seeds=seeds,
                alerting=args.alerting,
            )
            if args.seen_backend is not None:
                kwargs["seen_backend"] = args.seen_backend
            elif not args.scale_profile:
                kwargs["seen_backend"] = "exact"
            cfg = ctor(**kwargs)
            res = run_crawl(args.sf_dir, cfg, multiplier=args.multiplier)
            out = {
                k: v
                for k, v in res.counters.items()
                if k != "seen_urls" and not k.startswith("t_")
            }
            # authoritative seen-set size comes from the shard actors
            # (counters["seen_total"]), not the optionally-collected
            # driver list (round-1 advice: the CLI printed 0 for
            # "not collected")
            print(json.dumps(out))
        elif args.cmd == "compact":
            from .pipelines.compact import compact_pages

            m = compact_pages(args.pages_dir, args.out, num_shards=args.shards)
            print(json.dumps({k: m[k] for k in ("num_shards", "total_rows", "total_bytes")}))
        elif args.cmd == "encode":
            from .pipelines.encode import write_embeddings_fixture

            path = write_embeddings_fixture(
                args.sf_dir, args.out, dim=args.dim,
                chunk_size=args.chunk_size, stride=args.stride,
            )
            import pyarrow.parquet as _pq

            print(json.dumps({"written": path,
                              "rows": _pq.ParquetFile(path).metadata.num_rows}))
        elif args.cmd == "curate":
            from .pipelines.curate import curate_corpus

            print(json.dumps(curate_corpus(args.sf_dir, args.out, budget=args.budget)))
        elif args.cmd == "profiles":
            from .pipelines import graph

            graph.link_profiles(args.sf_dir, multiplier=args.multiplier).write_parquet(args.out)
            print(json.dumps({"written": args.out}))
        elif args.cmd == "query":
            import pyarrow as pa
            import ray.data as rd

            from .pipelines import export
            from .registry import queries

            reg = queries()
            if args.name not in reg:
                print(json.dumps({"error": f"unknown query {args.name!r}", "known": sorted(reg)}))
                return 2
            res = reg[args.name](args.sf_dir)
            if isinstance(res, pa.Table):
                res = rd.from_arrow(res)
            if args.out is None:
                print(json.dumps({"query": args.name, "rows": res.count()}))
            elif args.fmt == "excel":
                export.write_excel(res, args.out)
                print(json.dumps({"query": args.name, "written": args.out}))
            elif args.fmt == "pdf":
                export.write_pdf_report(res, args.out, title=args.name)
                print(json.dumps({"query": args.name, "written": args.out}))
            else:
                getattr(export, f"write_{'jsonl' if args.fmt == 'jsonl' else args.fmt}")(res, args.out)
                print(json.dumps({"query": args.name, "written": args.out}))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
