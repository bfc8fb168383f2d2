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


def test_no_oracle_outputs_nested_types(con):
    """Round-6's only reds: the driver's canonicalizer pandas-sorts raw
    result cells, and a top-level ARRAY (or MAP/STRUCT) column raises
    ``TypeError: unhashable type: 'list'`` before any value compare —
    embedding_normalize / text_inverted_index shipped exactly this.
    Serialize nested outputs at the registry edge (array_to_string /
    to_json on BOTH sides); this gate keeps the registry at zero
    nested-output rows."""
    offenders = []
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        for col, typ, *_ in desc:
            t = typ.upper()
            if "[]" in t or t.startswith(("STRUCT(", "MAP(", "LIST(", "UNION(")):
                offenders.append((name, col, typ))
    assert not offenders, (
        "nested-type oracle outputs (serialize with array_to_string/to_json "
        f"at the registry edge — the driver canonicalizer dies on them): {offenders}"
    )


def test_every_oracle_describes(con):
    for name, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        con.execute(f"DESCRIBE {spec.oracle}")  # raises on bad SQL


def test_readme_counts_match_reality():
    """Round-5 verdict: README's layout-section stats drifted from the
    actual registry/test counts across rounds (166 vs 186 queries, 240
    vs 287 tests), eroding trust in the claims ledger. Enforce: every
    'N queries' / 'N-entry registry' figure in README equals
    len(REGISTRY), and every 'N test functions' figure equals the
    statically-counted number of test functions under tests/."""
    import ast
    import glob
    import re

    text = open("/root/repo/README.md").read()

    registry_claims = [
        int(m)
        for m in re.findall(r"(\d+) queries|(\d+)-entry registry", text)
        for m in m
        if m
    ]
    assert registry_claims, "README no longer states the registry count"
    for n in registry_claims:
        assert n == len(REGISTRY), (
            f"README claims {n} registry queries, actual {len(REGISTRY)}"
        )

    n_tests = 0
    for p in glob.glob("/root/repo/tests/test_*.py"):
        tree = ast.parse(open(p).read())
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ) and node.name.startswith("test"):
                n_tests += 1
    test_claims = [int(m) for m in re.findall(r"(\d+) test functions", text)]
    assert test_claims, "README no longer states the test count"
    for n in test_claims:
        assert n == n_tests, (
            f"README claims {n} test functions, actual {n_tests}"
        )


def test_bench_queries_resolve():
    """bench.py is the driver's per-round benchmark entry — every
    headline query must exist in the registry and carry an oracle (the
    scale mode times the DuckDB side from it)."""
    import bench

    for name in bench.BENCH_QUERIES:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle, name
