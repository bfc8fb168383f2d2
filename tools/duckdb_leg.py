"""DuckDB side of a scale leg, ONE QUERY PER PROCESS.

Why this exists (r12, the ×10000 lesson): bench.py times both engines
in one process, and its DuckDB analog of Spark's noop sink is a
`CREATE OR REPLACE TEMP TABLE __bench AS <oracle>` materialization.
At events ×10000 (1 B rows) the heavy queries' sort/join spill plus
the materialized result exceeded the box's free disk and the whole
nine-query run died with nothing recorded. This harness replicates
bench.py's DuckDB protocol (same views, same warm-then-median-of-3,
same temp-table materialization) but isolates each query in its own
process so temp space is returned between queries and one
out-of-disk query costs only itself.

``--sink csv`` swaps the materialization for
`COPY (<oracle>) TO '/dev/null' (FORMAT CSV)` — streams every result
row without storing it (closer to Spark's noop sink for queries whose
RESULT is itself huge, at the cost of CSV serialization; record which
mode a number came from).

Usage: python tools/duckdb_leg.py <sf_dir> <query_name> [--sink csv]
Prints one JSON line: {"query": ..., "median_s": ..., "times": [...],
"rows": ..., "sink": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = 3


def main() -> None:
    import duckdb

    from siddhi_operator_spark.catalog import TABLES
    from siddhi_operator_spark.suite import REGISTRY

    # argparse, not argv sniffing (ADVICE r12): the old
    # `"csv" in sys.argv` form let ANY bare 'csv' token flip the sink
    # mode and ignored the value actually following --sink
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir")
    ap.add_argument("query_name")
    ap.add_argument("--sink", choices=("table", "csv"), default="table")
    ap.add_argument(
        "--runs", type=int, default=N_RUNS,
        help="timed repetitions after the warm run (default 3)",
    )
    ap.add_argument(
        "--memory-limit", default=None,
        help="DuckDB memory_limit (e.g. 60GB) — below the OS ceiling so "
        "big materializations SPILL to temp_directory instead of dying "
        "on a failed allocation (the x10000 window_session warm run "
        "OOM'd at the ~102GB default, r13)",
    )
    ap.add_argument(
        "--no-preserve-order", action="store_true",
        help="SET preserve_insertion_order=false — drops DuckDB's "
        "order buffers on huge CTAS results (memory reducer; result "
        "order is irrelevant to the timing protocol, but record that "
        "the flag was used)",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    name = args.query_name
    sink = args.sink
    if name not in REGISTRY:
        raise SystemExit(f"unknown query {name!r}")
    spec = REGISTRY[name]
    if not spec.oracle:
        raise SystemExit(f"{name} has no oracle SQL")

    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count() or 32}")
    con.execute("SET temp_directory = '/tmp/duckdb_leg_tmp'")
    if args.memory_limit:
        con.execute(f"SET memory_limit = '{args.memory_limit}'")
    if args.no_preserve_order:
        con.execute("SET preserve_insertion_order = false")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")

    if sink == "table":
        def run():
            con.execute(f"CREATE OR REPLACE TEMP TABLE __bench AS {spec.oracle}")
    else:
        def run():
            con.execute(
                f"COPY ({spec.oracle}) TO '/dev/null' (FORMAT CSV)"
            )

    run()  # warm (page cache + any plan caching)
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        run()
        times.append(round(time.perf_counter() - t0, 4))
    rows = None
    if sink == "table":
        rows = con.execute("SELECT count(*) FROM __bench").fetchone()[0]
    print(
        json.dumps(
            {
                "query": name,
                "median_s": round(statistics.median(times), 4),
                "times": times,
                "rows": rows,
                "sink": sink,
                "sf_dir": sf_dir,
                "memory_limit": args.memory_limit,
                "preserve_insertion_order": not args.no_preserve_order,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
