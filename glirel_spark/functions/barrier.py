"""Optimizer-proof per-row materialization barrier.

Catalyst's CollapseProject inlines alias references: any lambda that
indexes a *derived* array column re-evaluates the producing expression
per element, turning O(n) stages into O(n^2)-per-row plans (measured:
minutes instead of seconds at sf0.1 — see BENCH/BASELINE.md notes).
``withColumn`` projection boundaries are NOT a reliable fence; the
optimizer may still merge them.

``materialized(expr)`` wraps the expression in a benign nondeterministic
guard: ``when(monotonically_increasing_id() >= 0, expr)``. The id is
always non-negative, so the value is unchanged — but Catalyst must not
duplicate or inline nondeterministic expressions, so the column is
computed exactly once per row and every downstream reference is a plain
attribute read. Cost: one long comparison per row.

Use it for every expensive array column that downstream lambdas index
into (`arr[i]`) or re-reference per element.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def materialized(expr: Column) -> Column:
    return F.when(F.monotonically_increasing_id() >= 0, expr)
