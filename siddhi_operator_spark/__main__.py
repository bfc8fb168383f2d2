"""Engine entry point: run a `.siddhi` app file or a SiddhiProcess CR.

    python -m siddhi_operator_spark run app.siddhi [--mode batch|streaming]
        [--source NAME=PATH ...] [--write-sinks] [--show N] [--timeout S]
    python -m siddhi_operator_spark run-cr process.yaml [same flags]

The deliverable shape from SURVEY.md §4.2: the reference's k8s operator
boots `siddhi-runner` pods that load `.siddhi` files (entry point A);
here the same app file runs on Spark via `spark-submit`-able Python —
`run_app` (batch/analytics) or `run_app_streaming` + declared
`@source`/`@sink` annotations (streaming). `run-cr` accepts the
operator's actual user input — a `kind: SiddhiProcess` YAML — and runs
every `spec.apps[*].script` it carries (`siddhiql/cr.py`).

`--source NAME=PATH` binds a declared stream to a parquet path,
overriding (or standing in for) its `@source` annotation — the
operator's ConfigMap-mounted data analog for ad-hoc runs.
"""

from __future__ import annotations

import argparse
import sys


def _add_run_flags(r: argparse.ArgumentParser) -> None:
    r.add_argument("--mode", choices=["batch", "streaming"], default="batch")
    r.add_argument(
        "--source",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="bind stream NAME to a parquet path (overrides @source)",
    )
    r.add_argument(
        "--write-sinks",
        action="store_true",
        help="batch mode: also write outputs declared with @sink(type='file')",
    )
    r.add_argument("--show", type=int, default=20, help="rows to print per output")
    r.add_argument(
        "--timeout",
        type=float,
        default=None,
        help="streaming mode: stop after S seconds (default: run until Ctrl-C)",
    )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="siddhi_operator_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="run a SiddhiQL app file")
    r.add_argument("app_path")
    _add_run_flags(r)
    c = sub.add_parser(
        "run-cr", help="run every app inside a SiddhiProcess CR YAML"
    )
    c.add_argument("cr_path")
    _add_run_flags(c)
    q = sub.add_parser(
        "sql",
        help="on-demand (store) query: ad-hoc SQL over the engine's "
        "state tables (SURVEY.md §4.3)",
    )
    q.add_argument("query")
    q.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="table directory registered as views (default sf0.001)",
    )
    q.add_argument("--show", type=int, default=20)
    args = p.parse_args(argv)

    from .session import build_session
    from .siddhiql import run_app, run_app_streaming

    if args.cmd == "sql":
        # §4.3 on-demand queries: the reference's runtime.query() pull
        # path — here every table/window/rollup is a queryable view, so
        # the surface is full Spark SQL rather than the restricted
        # OnDemandQuery grammar (documented superset).
        from .catalog import register_views

        spark = build_session(app_name="siddhi-ondemand")
        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.show, truncate=False)
        return 0

    if args.cmd == "run-cr":
        from .siddhiql.cr import load_cr_scripts

        with open(args.cr_path) as f:
            scripts = load_cr_scripts(f.read())
        app_label = args.cr_path
    else:
        with open(args.app_path) as f:
            scripts = [f.read()]
        app_label = args.app_path

    spark = build_session(app_name=f"siddhi-app:{app_label}")
    binds = {}
    for item in args.source:
        name, _, path = item.partition("=")
        if not path:
            p.error(f"--source needs NAME=PATH, got {item!r}")
        binds[name] = spark.read.parquet(path)

    if args.mode == "batch":
        for text in scripts:
            outputs = run_app(text, binds, spark=spark, write_sinks=args.write_sinks)
            for name, df in outputs.items():
                print(f"== {name} ==")
                df.show(args.show, truncate=False)
        return 0

    queries = []
    for text in scripts:
        outs = run_app_streaming(text, binds, spark=spark)
        for name, df in outs.items():
            q = (
                df.writeStream.format("console")
                .outputMode("append")
                .option("numRows", str(args.show))
                .option("truncate", "false")
                .queryName(name)
                .start()
            )
            queries.append(q)
    if args.timeout is not None:
        import time

        time.sleep(args.timeout)
        for q in queries:
            q.stop()
    else:  # pragma: no cover - interactive path
        spark.streams.awaitAnyTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
