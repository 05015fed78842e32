"""Engine-portable determinism helpers (SURVEY.md §7.3.1).

The driver hash-compares Spark results against DuckDB bit-for-bit, which
rules out two classes of engine divergence:

1. ``ROUND`` semantics: Spark's ``round`` on doubles goes through Java's
   ``BigDecimal.valueOf(double)`` (i.e. the *decimal string*), DuckDB rounds
   the *binary* value — ``round(70160.805, 2)`` differs. Fix: never use the
   engines' ROUND; use identical IEEE algebra ``floor(x * s + 0.5) / s`` on
   both sides (``pround`` / ``sql_round``).

2. Floating-point addition order: SUM/AVG over doubles depends on partial
   aggregation order (Spark partials vs DuckDB's accumulation / window
   segment trees), so no amount of post-rounding is safe near a boundary.
   Fix: quantize each row to an integer unit count (deterministic per-row
   IEEE ops), sum exactly in int64, divide at the end (``qint`` /
   ``sql_qint``). Integer partial sums are exact in any order; quotients of
   exact integers are single deterministic IEEE divisions.

Per-row transcendental functions (sqrt/ln/cos similarity) are identical
IEEE-ops-on-identical-inputs across engines, so ``pround`` suffices there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, d: int) -> Column:
    """Portable per-row rounding: floor(x * 10^d + 0.5) / 10^d."""
    s = float(10 ** d)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_round(expr: str, d: int) -> str:
    """SQL twin of ``pround`` (identical IEEE operation sequence). Literals
    use e-notation: ``100.0`` parses as DECIMAL in Spark SQL but ``1e2`` is
    DOUBLE in both Spark SQL and DuckDB."""
    s = f"1e{d}"
    return f"(FLOOR(({expr}) * {s} + 5e-1) / {s})"


def qint(col: Column, d: int = 2) -> Column:
    """Quantize to integer 10^-d units (e.g. cents for d=2): deterministic
    per-row, exact to sum in any order."""
    s = float(10 ** d)
    return F.floor(col * F.lit(s) + F.lit(0.5)).cast("long")


def sql_qint(expr: str, d: int = 2) -> str:
    s = f"1e{d}"
    return f"CAST(FLOOR(({expr}) * {s} + 5e-1) AS BIGINT)"


def exact_sum(col: Column, d: int = 2) -> Column:
    """Order-independent SUM of a double column: quantized integer sum
    scaled back to a double."""
    s = float(10 ** d)
    return F.sum(qint(col, d)) / F.lit(s)


def sql_exact_sum(expr: str, d: int = 2) -> str:
    s = f"1e{d}"
    return f"(CAST(SUM({sql_qint(expr, d)}) AS BIGINT) / {s})"


def exact_avg(col: Column, d: int = 2) -> Column:
    """Order-independent AVG: exact integer sum / (count * scale)."""
    s = float(10 ** d)
    return F.sum(qint(col, d)) / (F.count(F.lit(1)) * F.lit(s))


def sql_exact_avg(expr: str, d: int = 2) -> str:
    s = f"1e{d}"
    return f"(CAST(SUM({sql_qint(expr, d)}) AS BIGINT) / (COUNT(*) * {s}))"
