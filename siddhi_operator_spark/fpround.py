"""Epsilon-biased rounding for oracle-comparable float outputs.

The fixture data carries exact-decimal inputs (2-dp values, 2-dp
prices), so derived quotients like sum/count frequently land *exactly*
on a 4-decimal rounding boundary (e.g. 2975.92/64 = 46.49875). The
true value is on the boundary; each engine's summation-order ulp noise
then decides the rounding direction — a structural, not random,
source of cross-engine mismatch.

Fix: bias by +1e-9 before rounding, on BOTH the Spark side (this
helper) and the DuckDB oracle side (`round(x + 1e-9, d)`). The bias is
3+ orders of magnitude above ulp noise (~1e-13 here) and well below the
smallest structural nonzero boundary distance (~5e-8 for counts ≤ 1e5),
so every exact-boundary value rounds up deterministically in both
engines and every non-boundary value is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-9


def r4(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + F.lit(EPS), scale)
