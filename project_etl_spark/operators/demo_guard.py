"""Fail-fast input bound for deliberately-quadratic exact demo queries.

Two registered queries keep an exact all-pairs plan on purpose —
``ext_dedup_near_jaccard`` (shingle self-join) and
``ext_dup_embedding_cosine`` (per-label all-pairs) — because they are the
ground-truth twins the differential tests compare the LSH flagships
against. Their cost grows quadratically with input size, so running them
on a production-scale corpus is always a mistake: the candidate-bounded
flagships (``ext_dedup_near_lsh_verified``,
``ext_dup_embedding_lsh_verified``) compute the same contract at
candidate-pair cost.

``guard_demo_scale`` makes that mistake impossible to hit silently: it
counts the input (a columnless parquet count — row-group metadata plus an
empty projection, no data columns read) and raises ``DemoScaleError``
naming the scale-safe flagship when the input exceeds the documented
bound. The bound is sized an order of magnitude above the largest test
fixture (sf0.1: 5 000 documents / 2 000 embeddings), so every fixture,
oracle sweep, and bench run passes untouched while a 100 TB corpus fails
in seconds instead of shuffling for hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Input-row ceiling for quadratic demos — 10x the sf0.1 fixture.
DEMO_MAX_ROWS = 50_000


class DemoScaleError(RuntimeError):
    """Raised when a quadratic demo query is run on an oversized input."""


def guard_demo_scale(df: DataFrame, *, query: str, flagship: str,
                     max_rows: int = DEMO_MAX_ROWS) -> DataFrame:
    """Return ``df`` unchanged if it has at most ``max_rows`` rows, else
    raise ``DemoScaleError`` pointing at the scale-safe ``flagship``."""
    n = df.count()
    if n > max_rows:
        raise DemoScaleError(
            f"{query} is an exact quadratic demo bounded to {max_rows:,} "
            f"input rows (got {n:,}); run {flagship} instead — it computes "
            f"the same contract with candidate-bounded (LSH) cost.")
    return df
