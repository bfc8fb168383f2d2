"""Batch/analytics-mode implementations of the reference operator
inventory (SURVEY.md §3). Streaming twins live in ``..streaming``.

Every function here takes and returns DataFrames and stays inside
Catalyst-optimizable expressions (no Python UDFs in the hot path), so
predicate pushdown / column pruning / whole-stage codegen apply.
"""
