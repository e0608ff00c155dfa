"""Blocklist (badword) document gating — the C4-style "dirty word
fraction" filter every web-scale curation pipeline runs ahead of
training (north-star extension; reference parity: the closest reference
surface is the word-filter fork in
flink-streaming_2.10 TwitterStream.java:60-75, which routes tweets by
term membership — this is the corpus-curation generalisation).

Per document: total word runs, blocklist hits, and a keep/drop verdict
at a permille threshold. Everything is ONE scan-local projection of
compiled-regex counts (``regexp_count`` — JVM-side, whole-stage
codegen, no token arrays materialised, no explode, no shuffle); the
verdict is an integer cross-multiplication, so no float ever exists
and the DuckDB oracle replays it exactly.

A "word" is a maximal ``\\w+`` run of the lowercased text and a hit is
such a run equal to a blocklist entry — matched as
``\\b(?:t1|t2|…)\\b``, whole-run-anchored so Java and RE2 alternation
semantics agree (same contract as ``textstats._stop_hits``).

At 100 TB this is the cheapest possible shape: narrow map over the
scan, prunes to (ids, two longs, bool) immediately — the gate runs
ahead of every expensive operator and shrinks what they see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.textstats import (
    WORD_RUN_PATTERN,
    _stop_pattern,
)

#: Demo blocklist: frequent corpus terms so the gate exercises both
#: verdicts on the synthetic tables. Real deployments pass their own.
DEFAULT_BLOCKLIST: tuple[str, ...] = ("slow", "big", "stale")

#: Default gate: drop documents where blocklist runs exceed 5% of word
#: runs (50‰ — the C4 heuristic's order of magnitude).
DEFAULT_MAX_PERMILLE = 50


def blocklist_stats(
    df: DataFrame,
    terms: tuple[str, ...] = DEFAULT_BLOCKLIST,
    max_permille: int = DEFAULT_MAX_PERMILLE,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """``(doc_id, extra..., n_words, blocklist_hits, keep)`` — keep iff
    ``hits · 1000 ≤ n_words · max_permille`` (exact integer cross-
    multiply; an empty document has 0 hits ≤ 0 and is kept)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    lowered = F.lower(F.col(text_col))
    n_words = F.regexp_count(lowered, F.lit(WORD_RUN_PATTERN)).cast("long")
    hits = F.regexp_count(lowered, F.lit(_stop_pattern(list(terms)))).cast(
        "long"
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n_words.alias("n_words"),
        hits.alias("blocklist_hits"),
        (
            hits * F.lit(1000) <= n_words * F.lit(int(max_permille))
        ).alias("keep"),
    )


def blocklist_oracle_sql(
    terms: tuple[str, ...] = DEFAULT_BLOCKLIST,
    max_permille: int = DEFAULT_MAX_PERMILLE,
) -> str:
    """DuckDB mirror of :func:`blocklist_stats` on the ``documents``
    view — identical counting formulation (regex match counts on the
    lowered text) and identical integer verdict."""
    pat = _stop_pattern(list(terms))
    return f"""
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '\\w+'))
                    AS BIGINT) AS n_words,
               CAST(len(regexp_extract_all(lower(text), '{pat}'))
                    AS BIGINT) AS blocklist_hits,
               len(regexp_extract_all(lower(text), '{pat}')) * 1000
                 <= len(regexp_extract_all(lower(text), '\\w+'))
                    * {int(max_permille)} AS keep
        FROM documents"""
