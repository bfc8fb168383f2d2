"""Round-15 third session — decade A/B for `shard_assign`'s two-level
formulation (`pipeline/curation.py`).

Claim under test: the naive GLOBAL shard numbering — one
`Window.orderBy(source, doc_id)` cumsum — serializes the corpus
through one partition (one task sorts and scans everything), while the
shipped two-level formulation (per-source offset census + per-source
keyed windows) keeps the corpus-sized work parallel.  At sf0.1 both
finish in a blink; this harness replicates `documents` vertically
(doc_id offset per replica, SAME 20 sources — the direction that grows
every per-source window, the worst case for the keyed arm too) and
measures both arms at ×100 / ×1000 / ×10000 with row-identity asserted
at the smallest leg.

Legs (each a fresh process):

  build N          write /tmp/shard_scale_N/documents.parquet
                   (N× replicated, doc_id offset by replica)
  ab N [reps]      alternating naive,two,two,naive,... medians of
                   `reps` per arm over the N× fixture; asserts
                   row-count equality every rep and full row-set
                   equality once per run at N ≤ 100.

Usage:
  python tools/r15_shard.py build 1000
  python tools/r15_shard.py ab 1000 3
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
BUDGET = 512


def _dir(n: int) -> str:
    return f"/tmp/shard_scale_{n}"


def build(n: int) -> None:
    from pyspark.sql import functions as F

    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = docs.count()
    reps = spark.range(n).select(F.col("id").alias("_rep"))
    out = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * base).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    out.repartition(32).write.mode("overwrite").parquet(
        f"{_dir(n)}/documents.parquet"
    )
    print(f"built {_dir(n)}: {base * n} docs, sources unchanged")


def _arms(spark, n: int):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from siddhi_operator_spark.pipeline import curation as C

    docs = spark.read.parquet(f"{_dir(n)}/documents.parquet")
    docs.write.format("noop").mode("overwrite").save()  # warm page cache

    toks = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != ""))

    def naive():
        d = docs.select(
            "source", "doc_id", toks.cast("bigint").alias("n_tokens")
        )
        gw = Window.orderBy("source", "doc_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return d.select(
            "source",
            "doc_id",
            "n_tokens",
            F.floor(
                (F.sum("n_tokens").over(gw) - F.col("n_tokens")) / BUDGET
            ).alias("shard_id"),
        )

    def two():
        return C.shard_assign(docs, budget=BUDGET)

    return naive, two


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def ab(n: int, reps: int = 3) -> None:
    from siddhi_operator_spark.session import build_session

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    naive, two = _arms(spark, n)

    if n <= 100:
        a = {tuple(r) for r in naive().collect()}
        b = {tuple(r) for r in two().collect()}
        assert a == b, f"row-set mismatch: {len(a)} vs {len(b)}"
        print(f"row-set equality: {len(a)} rows identical")

    t_n: list[float] = []
    t_t: list[float] = []
    order = ["naive", "two", "two", "naive"] * ((reps + 1) // 2)
    for arm in order[: 2 * reps]:
        (t_n if arm == "naive" else t_t).append(
            _noop(naive() if arm == "naive" else two())
        )
    cn = naive().count()
    ct = two().count()
    assert cn == ct, (cn, ct)
    print(
        f"x{n}: rows={cn} naive={[round(t, 2) for t in t_n]} "
        f"two={[round(t, 2) for t in t_t]} "
        f"median naive={statistics.median(t_n):.2f}s "
        f"two={statistics.median(t_t):.2f}s "
        f"ratio={statistics.median(t_t) / statistics.median(t_n):.3f}"
    )


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "build":
        build(int(sys.argv[2]))
    elif cmd == "ab":
        ab(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    else:
        raise SystemExit(f"unknown leg {cmd!r}")
