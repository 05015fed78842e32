"""Declared-query registry: the SURVEY.md §2 implementation contract.

Every operator the engine claims is registered here as a ``QuerySpec``:
a stable name, a builder ``(SparkSession, sf_dir) -> DataFrame``, and —
for SQL-expressible semantics — an ANSI-SQL oracle string that DuckDB runs
on the same parquet fixtures. The verification driver hash-compares the two
(row count + schema + order-insensitive value hash), so builders follow the
determinism discipline from SURVEY.md §2/§7.3:

- float aggregates are ``round()``-ed identically on both sides;
- every LIMIT / top-k has a total-order tie-break;
- collected lists are sorted;
- timestamps are emitted as formatted strings or integer epochs (UTC),
  never raw timestamp objects, to dodge engine serialization differences.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None          # DuckDB SQL twin; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a builder to the registry under ``name``."""
    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle,
                                   doc=(fn.__doc__ or "").strip(), tags=tags)
        return fn
    return deco


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration)."""
    global _LOADED
    if not _LOADED:
        from project_etl_spark import operators  # noqa: F401
        operators.load()
        _LOADED = True
    return REGISTRY
