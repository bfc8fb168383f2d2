"""siddhi_operator_spark — a PySpark-native streaming analytics engine.

A from-scratch rebuild of the query/data-processing surface of the system
deployed by siddhi-io/siddhi-operator (the SiddhiQL engine: continuous
queries over typed event streams — filters, windows, joins, incremental
aggregations, CEP patterns, rate limits, tables) expressed idiomatically
on Spark: DataFrame/SQL + Catalyst for the stateless relational core,
Structured Streaming (event time + watermarks) for unbounded execution,
and `applyInPandasWithState` only for the stateful semantics Spark lacks
natively (count windows, CEP NFA).

Layout (mirrors SURVEY.md §8.1):
- ``session``    — SparkSession builder tuned for the engine.
- ``catalog``    — testdata schemas + loaders.
- ``operators``  — batch/analytics implementations of the window/join/
                   agg/pattern operator inventory (SURVEY.md §3).
- ``streaming``  — Structured Streaming twins + stateful custom ops.
- ``functions``  — scalar function namespaces (str:/math:/time:/json:/…).
- ``pipeline``   — LLM-data-pipeline extras (dedup, similarity, text).
- ``suite``      — the registered query suite + DuckDB oracles (the
                   correctness gate consumed by ``__spark_entry__``).
"""

__version__ = "0.1.0"
