"""Differential oracle testing (SURVEY.md §5.2.1) — the local mirror of the
driver's t2 gate: every registered query with an oracle must match DuckDB on
row count, column names/types, and an order-insensitive value comparison.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import pytest

from project_etl_spark.registry import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # queries round explicitly; this guard only absorbs representation noise
        return round(v, 9)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


_KIND = {
    "tinyint": "i", "smallint": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f", "boolean": "b", "string": "s",
    "date": "d", "timestamp": "t", "timestamp_ntz": "t",
}

def _arrow_kind(t) -> str:
    import pyarrow.types as pt
    if pt.is_integer(t):
        return "i"
    if pt.is_floating(t) or pt.is_decimal(t):
        return "f"
    if pt.is_boolean(t):
        return "b"
    if pt.is_string(t) or pt.is_large_string(t):
        return "s"
    if pt.is_timestamp(t):
        return "t"
    if pt.is_date(t):
        return "d"
    return "?"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb(name, spark, ddb, sf_dir):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir)
    spark_cols = sdf.columns
    spark_kinds = {f.name: _KIND.get(f.dataType.simpleString(), "?")
                   for f in sdf.schema.fields}
    spark_rows = [tuple(r) for r in sdf.collect()]

    arrow = ddb.execute(spec.oracle).fetch_arrow_table()
    ddb_cols = arrow.schema.names
    ddb_kinds = {f.name: _arrow_kind(f.type) for f in arrow.schema}
    ddb_rows = [tuple(r.values()) for r in arrow.to_pylist()]

    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: column names differ: spark={spark_cols} duckdb={ddb_cols}")
    kind_mismatch = {c: (spark_kinds[c], ddb_kinds[c]) for c in spark_kinds
                     if spark_kinds[c] != ddb_kinds[c]}
    assert not kind_mismatch, f"{name}: dtype-kind mismatches: {kind_mismatch}"
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duckdb={len(ddb_rows)}")

    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(ddb_rows, ddb_cols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 5: {mismatches[:5]}")


BITEXACT = os.environ.get("SPARK_GRAFT_BITEXACT", "") not in ("", "0", "false")


@pytest.mark.skipif(not BITEXACT, reason="set SPARK_GRAFT_BITEXACT=1 to run")
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_duckdb_bitexact(name, spark, ddb, sf_dir):
    """The external driver hashes raw cell values — no rounding grace. This
    sweep pins FLOAT-HEX identity: every double must be the same 64 bits in
    both engines (the portable floor-algebra makes that true by
    construction; a bare transcendental or reduction-order-dependent sum
    would fail here first)."""
    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir)

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            tuple((r[i].hex() if isinstance(r[i], float) else str(r[i]))
                  for i in order)
            for r in rows)

    arrow = ddb.execute(spec.oracle).fetch_arrow_table()
    s = canon([tuple(r) for r in sdf.collect()], sdf.columns)
    d = canon([tuple(r.values()) for r in arrow.to_pylist()],
              arrow.schema.names)
    assert s == d, f"{name}: outputs are not bit-identical"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40
