"""Single-job lowering for bounded linear recurrences over tiny ordered tables.

The recursive-CTE family (CUSUM, Kaplan-Meier, Holt, Holt-Winters, Kalman,
GARCH) computes a sequential state recurrence over a ~report-length day
table: state_t = step(state_{t-1}, row_t). Spark 4's WITH RECURSIVE
executes that as one JOB PER RECURSION LEVEL — ~30 sequential micro-jobs
whose per-level scheduling overhead dominates (measured ~4.5-5.8 s per
query at sf0.1 on local[32], constant in data size but pure dead weight
per invocation; guide-§1.2 "remove unnecessary passes").

This helper lowers the same recurrence to ONE job: collect the ordered day
rows into an array (`sort_array(collect_list(struct(rn, ...)))` — rn is a
ROW_NUMBER, so struct ordering == rn ordering), left-fold the per-step
expression with the `aggregate` higher-order function, and explode the
(row, state) pairs back to rows.

Exactness contract: `aggregate` evaluates its merge lambda sequentially
left-to-right over the array (ArrayAggregate is a single-threaded fold —
there is no partial/merge tree), so the fold applies THE SAME per-step
arithmetic in THE SAME order as the recursive CTE's level-by-level
evaluation. Integer state stays exact trivially; double state (Kalman
gain chain, KM survival product, GARCH variance) performs the identical
IEEE operation sequence, hence produces bit-identical values. Each
caller's step expression is copied from (or built from the same constant
as) the shared recursion body its DuckDB oracle still runs — the oracles
are untouched, and the planted-truth tests plus the sf0.01/sf0.1
differential suites pin the equivalence per query.

Scale shape: unchanged. The corpus-scaled work is still the ONE map-side
combinable day reduce; the fold itself touches report-length data (~30
rows) inside a single task. The eager `localCheckpoint` the recursion
needed (to keep ~30 recursion levels from re-deriving the corpus reduce)
becomes unnecessary — the day table is referenced exactly once — so the
whole query is one linear plan: scan -> day reduce -> rn window ->
collect fold -> explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_states(h: DataFrame, row_fields: list[str], init_sql: str,
                step_sql: str, out_sql: list[str]) -> DataFrame:
    """Fold a sequential recurrence over a tiny ordered table in one job.

    ``h``          tiny DataFrame whose first column in ``row_fields`` is a
                   dense 1..N ``rn`` (ROW_NUMBER) — the fold order.
    ``row_fields`` columns collected into the per-row struct ``t``.
    ``init_sql``   SQL text producing the state struct for row 1; the
                   placeholder ``{r0}`` is replaced by row 1's struct.
    ``step_sql``   SQL text producing the state struct for row t from the
                   previous state; placeholders ``{acc}`` (previous state
                   struct) and ``t`` (current row struct) are in scope.
    ``out_sql``    output projections over ``e.t`` (row) / ``e.s`` (state).

    Empty ``h`` yields an empty result (the recursion's base case over an
    empty feeder), guarded without ANSI out-of-bounds access.
    """
    struct_cols = ", ".join(row_fields)
    arr = h.agg(F.expr(
        f"sort_array(collect_list(struct({struct_cols}))) AS rows"))
    folded = arr.select(F.expr(f"""
        CASE WHEN size(rows) = 0 THEN array()
        ELSE aggregate(
            slice(rows, 2, size(rows) - 1),
            array(named_struct('t', element_at(rows, 1),
                               's', {init_sql.format(r0='element_at(rows, 1)')})),
            (acc, t) -> array_append(acc,
                named_struct('t', t,
                             's', {step_sql.format(acc='element_at(acc, -1).s')})))
        END AS st"""))
    return folded.select(F.explode("st").alias("e")).selectExpr(*out_sql)
