"""Round-16 optimization round — plan capture + registry-wide plan audit.

Two legs:

  bench [out_dir]   write `.explain("formatted")` for every bench query
                    at sf0.1 to plans/r16/<name>_<tag>.txt (tag from
                    argv, default "before").
  audit [out.jsonl] build EVERY registry row's DataFrame at sf0.01 and
                    record plan-shape stats (Exchange count, join
                    strategies, Python-boundary nodes, scan
                    PushedFilters emptiness) — the measure-first sweep
                    over all 273 operators without executing them.

Usage:
  python tools/r15_plans.py bench before
  python tools/r15_plans.py audit plans/r16/audit.jsonl
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import contextlib

sys.path.insert(0, "/root/repo")

PLAN_DIR = "/root/repo/plans/r16"


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(
            re.findall(
                r"\bExchange (hashpartitioning|rangepartitioning|"
                r"RoundRobinPartitioning|SinglePartition)",
                plan,
            )
        ),
        "broadcast_exchanges": len(re.findall(r"BroadcastExchange", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "python_eval": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
        ),
        "map_in_pandas": len(
            re.findall(r"MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
        ),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "window_execs": len(re.findall(r"\bWindow \[|WindowGroupLimit", plan)),
        "scans": len(re.findall(r"Scan parquet|Scan ExistingRDD", plan)),
    }


def bench(tag: str = "before", sf_dir: str = "/root/testdata/sf0.1") -> None:
    import bench as B
    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY

    spark = build_session("r15-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(PLAN_DIR, exist_ok=True)
    for name in B.BENCH_QUERIES:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = formatted_plan(df)
        with open(f"{PLAN_DIR}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(name, json.dumps(plan_stats(plan)))


def audit(out_path: str = f"{PLAN_DIR}/audit.jsonl",
          sf_dir: str = "/root/testdata/sf0.01") -> None:
    from siddhi_operator_spark.session import build_session
    from siddhi_operator_spark.suite import REGISTRY

    spark = build_session("r15-audit")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        for name, spec in REGISTRY.items():
            try:
                df = spec.fn(spark, sf_dir)
                plan = formatted_plan(df)
                rec = {"name": name, **plan_stats(plan)}
            except Exception as e:  # noqa: BLE001 — audit must not abort
                rec = {"name": name, "error": f"{type(e).__name__}: {e}"[:200]}
            f.write(json.dumps(rec) + "\n")
            f.flush()
            print(rec)


def main() -> None:
    leg = sys.argv[1] if len(sys.argv) > 1 else "bench"
    if leg == "bench":
        bench(*sys.argv[2:])
    elif leg == "audit":
        audit(*sys.argv[2:])
    else:
        raise SystemExit(f"unknown leg {leg}")


if __name__ == "__main__":
    main()
