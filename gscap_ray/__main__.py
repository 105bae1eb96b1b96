"""CLI entrypoint — the ``ray job submit`` target.

    ray job submit -- python -m gscap_ray run \
        --pages /data/pages --out /data/labeled --fingerprint crawl-2024-01

Subcommands:
    synth   generate a deterministic pages world
    run     checkpointed flagship run (resumable; skips valid partitions)
    bench   one benchmark JSON line (same as bench.py)

This module owns its Ray session (guarded init; the library never calls
ray.init)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="gscap_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("synth", help="generate a deterministic pages world")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=100_000)
    g.add_argument("--hosts", type=int, default=64)
    g.add_argument("--days", type=int, default=6)
    g.add_argument("--seed", type=int, default=42)

    r = sub.add_parser("run", help="checkpointed flagship run (resumable)")
    r.add_argument("--pages", required=True, help="pages parquet dir")
    r.add_argument("--out", required=True, help="output dir (partitioned)")
    r.add_argument("--fingerprint", required=True,
                   help="input fingerprint; partitions with a matching "
                        "manifest are skipped")
    r.add_argument("--polygons", action="store_true",
                   help="enable the builtin polygon context layer")
    r.add_argument("--num-cpus", type=int, default=None)

    sub.add_parser("bench", help="print one benchmark JSON line")

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from gscap_ray.synth import ensure_pages

        out = ensure_pages(args.out, args.pages, n_hosts=args.hosts,
                           days=args.days, seed=args.seed)
        print(json.dumps({"pages_dir": out, "rows": args.pages}))
        return 0

    if args.cmd == "bench":
        # same artifact/summary split as `python bench.py`: the full
        # per-query map (~12 KB) goes to bench_full_local.json; the last
        # stdout line is the <= 1.8 KB summary (drivers tail ~2,000 chars
        # of stdout — the r4 'parsed: null' overflow)
        import os

        from bench import _summary, run_bench

        full = run_bench()
        artifact = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_full_local.json")
        with open(artifact, "w") as fh:
            json.dump(full, fh, indent=1)
        print(json.dumps(_summary(full)))
        return 0

    # run
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR",
                 **({"num_cpus": args.num_cpus} if args.num_cpus else {}))
    try:
        from gscap_ray.config import load_context_layer
        from gscap_ray.pipelines.flagship import run_checkpointed

        polys = load_context_layer("polygons") if args.polygons else None
        summary = run_checkpointed(args.pages, args.out, args.fingerprint,
                                   polygons=polys)
        print(json.dumps(summary))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
