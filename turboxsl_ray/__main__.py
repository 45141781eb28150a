"""CLI: ``python -m turboxsl_ray run --input ... --output ...``.

The turboxsltproc analog (/root/reference/xsltproc/turboxsltproc.c):
init → build engine → process → write. This entry point OWNS the Ray
session (guarded init, shutdown at exit); library code never does.

On a real cluster the same module is the ``ray job submit`` payload:

    ray job submit --working-dir . -- python -m turboxsl_ray run \
        --input s3://bucket/transcripts --features s3://bucket/feats \
        --output s3://bucket/out --num-partitions 4096
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="turboxsl_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run the point-in-time feature pass")
    run.add_argument("--input", required=True, help="transcripts parquet path/dir")
    run.add_argument("--features", default=None, help="as-of feature table path/dir")
    run.add_argument("--output", required=True, help="output directory")
    run.add_argument("--spec", default=None,
                     help="JSON pipeline spec (the compiled-processor "
                          "analog; see turboxsl_ray/spec.py). CLI flags "
                          "override spec values when given explicitly")
    run.add_argument("--num-partitions", type=int, default=None)
    run.add_argument("--session-gap-minutes", type=int, default=None)
    run.add_argument("--salt-threshold-rows", type=int, default=None)
    run.add_argument("--no-resume", action="store_true")
    run.add_argument("--num-cpus", type=int, default=None,
                     help="local only; omit on a cluster")

    qry = sub.add_parser("query", help="run one registry pipeline")
    qry.add_argument("name", help="query name (see `query --list`)")
    qry.add_argument("--sf", default="/root/testdata/sf0.001",
                     help="input table directory")
    qry.add_argument("--out", default=None,
                     help="write result parquet here (else print row count)")
    qry.add_argument("--num-cpus", type=int, default=None)

    lst = sub.add_parser("queries", help="list registry pipelines")

    args = ap.parse_args(argv)

    if args.cmd == "queries":
        from turboxsl_ray import registry as R

        sqls = R.oracle_sql()
        for name in R.queries():
            print(f"{name}\t{'oracle' if name in sqls else 'rows-only'}")
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kw = {"include_dashboard": False}
        if args.num_cpus is not None:
            kw.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kw)

    if args.cmd == "query":
        try:
            import pyarrow as pa
            import ray.data as rd

            from turboxsl_ray import registry as R
            from turboxsl_ray.context import tune_context

            tune_context()
            qs = R.queries()
            if args.name not in qs:
                print(f"unknown query {args.name!r}; run `queries` to list",
                      file=sys.stderr)
                return 2
            res = qs[args.name](args.sf)
            if args.out is not None:
                if isinstance(res, rd.Dataset):
                    res.write_parquet(args.out)
                else:
                    import pyarrow.parquet as pq

                    t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(
                        res, preserve_index=False)
                    import os

                    os.makedirs(args.out, exist_ok=True)
                    pq.write_table(t, f"{args.out}/part-00000.parquet")
                print(json.dumps({"query": args.name, "out": args.out}))
            else:
                n = res.count() if isinstance(res, rd.Dataset) else len(res)
                print(json.dumps({"query": args.name, "rows": n}))
        finally:
            if owns_session:
                ray.shutdown()
        return 0

    try:
        from dataclasses import replace

        from turboxsl_ray.engine import Engine, EngineConfig

        if args.spec is not None:
            from turboxsl_ray.spec import compile_engine_config, load_spec

            cfg = compile_engine_config(load_spec(args.spec))
        else:
            cfg = EngineConfig()
        overrides = {
            k: v
            for k, v in (
                ("num_partitions", args.num_partitions),
                ("session_gap_minutes", args.session_gap_minutes),
                ("salt_threshold_rows", args.salt_threshold_rows),
            )
            if v is not None
        }
        eng = Engine(replace(cfg, **overrides) if overrides else cfg)
        metrics = eng.run(
            args.input, args.features, args.output, resume=not args.no_resume
        )
        metrics.pop("manifest", None)
        metrics.pop("stats", None)
        print(json.dumps(metrics))
    finally:
        # never tear down a session the caller owns (tests, notebooks)
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
