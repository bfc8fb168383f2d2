"""Out-of-order correction (SURVEY.md §3.9 `reorder:` namespace —
`[ext:reorder]` kslack/akslack).

The reference buffers events and re-emits them in timestamp order
with at most K-slack delay. Spark's native answer is the watermark:
stateful operators already tolerate disorder up to the watermark
delay and drop later events — the same contract kslack provides
(bounded-delay correction, late events beyond the bound discarded).

So the streaming mapping is `withWatermark` (a thin annotation, kept
as an explicit operator so apps porting `reorder:kslack(ts, K)` have a
1:1 target); the batch mapping is a keyed sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kslack(stream: DataFrame, ts: str, slack: str) -> DataFrame:
    """`reorder:kslack(tsAttr, K)` → event-time tolerance of K on every
    downstream stateful operator. Late events beyond the slack are
    dropped (the reference emits them out-of-order or drops per
    config; we standardize on drop — the stricter contract)."""
    return stream.withWatermark(ts, slack)
