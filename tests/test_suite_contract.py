"""Registry-wide driver-contract invariants, checked WITHOUT running
Spark — they gate the whole suite in seconds:

- no DuckDB oracle may output a HUGEINT column: DuckDB widens integer
  ``sum()`` to int128, whose driver-side canonicalization differs from
  Spark's BIGINT — the exact bug behind round 3/4's only red rows
  (text_chunk_dedup_ratio / corpus_token_budget). CAST such sums to
  BIGINT in the oracle.
- every oracle must at least DESCRIBE cleanly against the sf0.001
  views (syntax + column resolution), so a typo'd oracle fails here
  instead of at driver time.
"""

from __future__ import annotations

import duckdb
import pytest

from siddhi_operator_spark.suite import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    return c


def test_no_oracle_outputs_hugeint(con):
    offenders = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        for col, typ, *_ in desc:
            if "HUGEINT" in typ:
                offenders.append((name, col))
    assert not offenders, (
        f"HUGEINT oracle outputs (CAST the integer sum to BIGINT): {offenders}"
    )


def test_every_oracle_describes(con):
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        con.execute(f"DESCRIBE {spec.oracle}")  # raises on bad SQL


def test_bench_queries_resolve():
    """bench.py is the driver's per-round benchmark entry — every
    headline query must exist in the registry and carry an oracle (the
    scale mode times the DuckDB side from it)."""
    import bench

    for name in bench.BENCH_QUERIES:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle, name
