"""Structured Streaming execution layer (SURVEY.md §3.10, §8.1 L1-L2).

Streaming twins of the batch operators: event-time windows with
watermarks (native), stream-stream/stream-static joins (native),
stateful custom operators via ``applyInPandasWithState`` for the
semantics Spark lacks (count windows, CEP NFA, absence timers), and
sinks including the keyed-table upsert (`foreachBatch` merge).

Checkpointing (offsets + state store) replaces the reference's
snapshot persistence (`[core] util/snapshot/SnapshotService.java`) —
strictly stronger: exactly-once with idempotent sinks vs the
reference's at-least-once NATS redelivery.
"""
