"""Suite registry: name → (spark builder, duckdb oracle SQL, tags).

Conventions enforced here (they ARE the driver contract):
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates are rounded to 4 decimals on BOTH sides so
  summation-order FP noise can't flip the value hash;
- results must be deterministic (no collect_set ordering, no ties
  broken arbitrarily — always add a tiebreak column to row_number).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def module_code_token(mod) -> str:
    """8-hex md5 of a module's source file — THE stale-cache key
    ingredient for every `_READY`-gated scratch layout in the suite
    (r12 review: three hand-rolled copies of this idiom had already
    drifted into existence; one helper keeps the contract — "a code
    change to the writer invalidates layouts it wrote" — in one
    place)."""
    with open(mod.__file__, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()[:8]


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate suite query {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn

    return deco
