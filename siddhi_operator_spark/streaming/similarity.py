"""Streaming IVFADC index maintenance — the serving-tier ingest loop.

Reference parity: the reference keeps long-lived state fresh by
applying per-event updates to resident stores (SURVEY §2 table
upserts, §3.10 state persistence); a vector-serving deployment needs
the same property for its ANN index. `pipeline.similarity` provides
the batch halves (`ivfpq_index_write` lays the index out partitioned
by cell; `ivfpq_index_append` encodes NEW vectors with the FROZEN
quantizers and appends their 8-byte code rows); this module closes
the loop by driving the append from a Structured Streaming source, so
a probe (`ivfpq_index_topk`) between any two micro-batches serves the
union corpus with no re-index batch job.

100 TB shape: per-trigger work is batch-sized by construction — one
broadcast of the two bounded quantizer artifacts, two keyed windows
over the arriving batch, and a partitioned append that touches only
the cells the batch lands in. The index never rewrites; the corpus
never rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..pipeline.similarity import ivfpq_index_append


def ivfpq_ingest_sink(
    stream: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
) -> StreamingQuery:
    """`foreachBatch` partitioned append into the
    :func:`~..pipeline.similarity.ivfpq_index_write` layout: every
    arriving micro-batch of (id, vector) rows is cell-assigned and
    PQ-encoded with the index's frozen quantizers and appended to
    ``{path}/codes``'s cell partitions. Because the quantizers are
    frozen constants, probe-after-ingest is bit-identical to a full
    rebuild over the union corpus (the `similarity_ivfpq_stream_serve`
    oracle row and `tests/test_pipeline.py`'s stream-equals-rebuild
    test both pin it).

    Delivery: with a checkpoint the file source replays unprocessed
    batches after a crash, and a torn append can duplicate a batch's
    code rows (at-least-once — the standard foreachBatch file-sink
    caveat). Re-running a batch through `ivfpq_index_append` is
    harmless for ranking only if dedup happens at probe time, so
    deployments that need exactly-once should append to batch-id-keyed
    subdirectories and commit a manifest; the gate fixture replays
    once, single process, so the simple append is the honest shape to
    test."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivfpq_index_append(batch_df, path, id_col=id_col, vec_col=vec_col)

    w = stream.writeStream.foreachBatch(_append)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
