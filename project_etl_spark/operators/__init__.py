"""Operator library — one module per SURVEY.md §2 family.

Importing ``load()`` registers every declared query in
``project_etl_spark.registry.REGISTRY``.
"""

from __future__ import annotations

from importlib import import_module

_MODULES = (
    "scans",
    "filters",
    "joins",
    "aggregates",
    "composite",
    "windows",
    "sorts",
    "setops",
    "functions",
    "streaming_twins",
    "streaming_live",
    "udfs",
    "llm_dedup",
    "llm_similarity",
    "llm_text",
    "llm_multimodal",
)


def load() -> None:
    for m in _MODULES:
        import_module(f"{__name__}.{m}")
