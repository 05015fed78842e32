"""Operator library — one module per SURVEY.md §2 family.

Importing ``load()`` registers every declared query in
``project_etl_spark.registry.REGISTRY``.
"""

from __future__ import annotations

from importlib import import_module

# Registration order drives the external verification sweep, which checks
# queries in this order and has a bounded per-round budget (~50 entries in
# round 1). Families whose driver-side correctness evidence is thinnest go
# FIRST so the budget lands on them; the families already hash-verified in
# CORRECTNESS_r01.json go last.
_MODULES = (
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "llm_multimodal",
    "udfs",
    "streaming_twins",
    "functions",
    "windows",
    "streaming_live",
    "scans",
    "filters",
    "joins",
    "aggregates",
    "composite",
    "sorts",
    "setops",
)


def load() -> None:
    for m in _MODULES:
        import_module(f"{__name__}.{m}")
