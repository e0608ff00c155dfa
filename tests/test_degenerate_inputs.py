"""Degenerate-input (empty / single-row table) oracle parity — the class
the r16 fuzz campaign proved real (Spark `GROUP BY CUBE` returns zero
rows over an empty input where ANSI/DuckDB emit the () grand-total row).

The full 134-query x 3-variant sweep is `tools/degenerate_sweep.py`
(variants: all tables EMPTY, all tables SINGLE-ROW, and EMPTYFACT —
facts empty with dimensions populated, the join-against-empty /
emptied-slice shape)
(run + recorded in COVERAGE.md each round); this suite pins a durable
subset: the six operators the r17 sweep actually caught diverging
(driver-side collects raising where the oracle returns well-defined
rows, a VOID-typed struct crashing analysis, and power-iteration
div-by-zero semantics), plus the aggregate/grouping-set/pivot/window
shapes the r16 verdict named as highest-risk for ANSI divergence.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sweep_mod():
    spec = importlib.util.spec_from_file_location(
        "degenerate_sweep", os.path.join(ROOT, "tools", "degenerate_sweep.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

#: The r17 sweep's actual catches (fixed same round) + the verdict's
#: named high-risk shapes (grouping sets, pivot, rollup tiers, global
#: aggregates, HAVING / scalar-subquery TPC-H shapes, windows).
PINNED = [
    # caught by the r17 sweep, fixed in pca/centroids/clustering/nbaffinity
    "pca_top_component",
    "embedding_direction_scores",
    "nearest_centroid",
    "hard_negatives",
    "semantic_kmeans",
    "affinity_lang_report",
    # r16's original find (fixed r16) — keep it pinned here too
    "pricing_cube",
    # verdict-named aggregate/pivot/window shapes
    "table_profile",
    "event_type_pivot",
    "hypertable_rollup",
    "corpus_summary",
    "length_histogram",
    "retention_cohorts",
    "event_transitions",
    "tpch_q22_sales_opportunity",
    "tpch_q11_important_stock",
    "tpch_q18_large_orders",
    "embedding_covariance",
]


@pytest.fixture(scope="module")
def degen_dirs(tmp_path_factory):
    sweep = _sweep_mod()
    root = tmp_path_factory.mktemp("degen")
    dirs = {}
    for variant, rows in (("empty", 0), ("onerow", 1), ("emptyfact", 0)):
        d = str(root / variant)
        sweep.build_variant(
            sweep.SF_BASE, d, rows, facts_only=(variant == "emptyfact")
        )
        dirs[variant] = d
    return dirs


def _duck_for(d: str):
    sweep = _sweep_mod()
    con = duckdb.connect()
    for name in sweep.TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{d}/{name}.parquet'")
    return con


@pytest.fixture(scope="module")
def ducks(degen_dirs):
    cons = {v: _duck_for(d) for v, d in degen_dirs.items()}
    yield cons
    for con in cons.values():
        con.close()


@pytest.mark.parametrize("name", [n for n in PINNED if n in QUERIES])
@pytest.mark.parametrize("variant", ["empty", "onerow", "emptyfact"])
def test_degenerate_matches_oracle(spark, degen_dirs, ducks, name, variant):
    sweep = _sweep_mod()
    a = QUERIES[name](spark, degen_dirs[variant]).toPandas()
    b = ducks[variant].sql(ORACLES[name]).df()
    diff = sweep.compare(a, b)
    assert diff is None, f"{name} [{variant}]: {diff}"


def test_pinned_names_still_exist():
    """A rename must update the pin list, not silently skip it."""
    missing = [n for n in PINNED if n not in QUERIES]
    assert not missing, missing


def test_empty_schema_equals_onerow_schema(spark, degen_dirs):
    """The r17 fixes return hand-built empty frames on degenerate
    inputs for the six caught operators; their column names must never
    drift from the computed path's."""
    for name in (
        "pca_top_component",
        "embedding_direction_scores",
        "nearest_centroid",
        "hard_negatives",
        "semantic_kmeans",
        "affinity_lang_report",
    ):
        empty_cols = QUERIES[name](spark, degen_dirs["empty"]).columns
        onerow_cols = QUERIES[name](spark, degen_dirs["onerow"]).columns
        assert empty_cols == onerow_cols, name
