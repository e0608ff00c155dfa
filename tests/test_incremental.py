"""IncrementalLearningSkeleton shape (streaming/incremental.py).

Strategy: hand-built training windows with exact boundary checks; the
event-time scorer against a brute reference; bounded-replay parity — the
union of hot-swap-scored micro-batches must equal the one-shot batch
score regardless of batch slicing; and the driver query's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.streaming.incremental import (
    build_partial_models,
    run_incremental_scoring,
    score_stream_with_models,
    score_with_models,
)
from tests.test_streaming import _stream_lines, _write_text_files

ROWS = [
    # (event_id, k, t, vc) — two keys, window 10
    (1, "a", 0, 100), (2, "a", 4, 300), (3, "a", 9, 200),   # win -> model_t 10
    (4, "a", 10, 250), (5, "a", 16, 100),                   # win -> model_t 20
    (6, "a", 25, 999),                                      # win -> model_t 30
    (7, "b", 12, 50),                                       # win -> model_t 20
]


def _events(spark):
    return spark.createDataFrame(ROWS, ["event_id", "k", "t", "vc"])


def test_partial_models_window_end_and_exact_stats(spark):
    models = {
        (r["k"], r["model_t"]): (r["sum_units"], r["n_samples"])
        for r in build_partial_models(
            _events(spark), on=["k"], time_col="t", value_units_col="vc",
            window=10,
        ).collect()
    }
    assert models == {
        ("a", 10): (600, 3),
        ("a", 20): (350, 2),
        ("a", 30): (999, 1),
        ("b", 20): (50, 1),
    }


def test_scoring_uses_newest_closed_model_inclusive(spark):
    ev = _events(spark)
    models = build_partial_models(
        ev, on=["k"], time_col="t", value_units_col="vc", window=10
    )
    got = {
        r["event_id"]: (r["m_model_t"], r["above_model"])
        for r in score_with_models(
            ev, models, on=["k"], event_time="t", value_units_col="vc"
        ).collect()
    }
    assert got == {
        # first window: no model closed yet -> NULL score
        1: (None, None), 2: (None, None), 3: (None, None),
        # t=10 uses model_t=10 (inclusive): mean 200, vc 250 -> above
        4: (10, True),
        5: (10, False),  # vc 100 < mean 200
        # t=25 uses model_t=20 (newest closed): mean 175, vc 999 -> above
        6: (20, True),
        7: (None, None),  # b's first model closes at 20 > 12
    }


def test_broadcast_and_sortwindow_scorers_agree(spark):
    ev = _events(spark)
    models = build_partial_models(
        ev, on=["k"], time_col="t", value_units_col="vc", window=10
    )
    kw = dict(on=["k"], event_time="t", value_units_col="vc")

    def snap(df):
        return sorted(
            (r["event_id"], r["m_model_t"], r["m_n_samples"], r["above_model"])
            for r in df.collect()
        )

    # broadcast=False is the test-only sort-window cross-validation path;
    # it must agree with the broadcast default exactly.
    assert snap(score_with_models(ev, models, broadcast=False, **kw)) == snap(
        score_with_models(ev, models, **kw)
    )


def test_hot_swap_replay_equals_batch_score(spark, tmp_path):
    """run_incremental_scoring with per-batch model refresh: the union of
    scored micro-batches must be byte-identical to the one-shot batch
    score, for any batch slicing (here: one event per micro-batch)."""
    ev = _events(spark)
    models = build_partial_models(
        ev, on=["k"], time_col="t", value_units_col="vc", window=10
    )
    kw = dict(on=["k"], event_time="t", value_units_col="vc")
    expected = sorted(
        (r["event_id"], r["m_model_t"], r["above_model"])
        for r in score_with_models(ev, models, **kw).collect()
    )

    src = str(tmp_path / "events")
    _write_text_files(src, [f"{e},{k},{t},{v}" for e, k, t, v in ROWS])
    parts = F.split(F.col("text"), ",")
    stream = _stream_lines(spark, src).select(
        F.element_at(parts, 1).cast("long").alias("event_id"),
        F.element_at(parts, 2).alias("k"),
        F.element_at(parts, 3).cast("long").alias("t"),
        F.element_at(parts, 4).cast("long").alias("vc"),
    )
    got: list = []
    refreshes: list = []

    def refresh(batch_id: int):
        refreshes.append(batch_id)
        return models  # the append-only history a batch trainer maintains

    run_incremental_scoring(
        stream,
        str(tmp_path / "ck"),
        refresh_models=refresh,
        score_batch=lambda bdf, m: score_with_models(bdf, m, **kw),
        sink=lambda sdf, _bid: got.extend(
            (r["event_id"], r["m_model_t"], r["above_model"])
            for r in sdf.collect()
        ),
    )
    assert sorted(got) == expected
    assert len(refreshes) >= 2  # the model table was hot-swapped per batch


def test_streaming_scorer_parity_bounded_and_streamed(spark, tmp_path):
    ev = _events(spark)
    models = build_partial_models(
        ev, on=["k"], time_col="t", value_units_col="vc", window=10
    )
    kw = dict(on=["k"], event_time="t", value_units_col="vc")
    expected = sorted(
        (r["event_id"], r["m_model_t"], r["above_model"])
        for r in score_with_models(ev, models, **kw).collect()
    )
    # bounded: the broadcast-history scorer on the same bounded frame
    bounded = sorted(
        (r["event_id"], r["m_model_t"], r["above_model"])
        for r in score_stream_with_models(ev, models, **kw).collect()
    )
    assert bounded == expected

    src = str(tmp_path / "ev2")
    _write_text_files(src, ["\n".join(f"{e},{k},{t},{v}" for e, k, t, v in ROWS)])
    parts = F.split(F.col("text"), ",")
    stream = _stream_lines(spark, src, per_file=False).select(
        F.element_at(parts, 1).cast("long").alias("event_id"),
        F.element_at(parts, 2).alias("k"),
        F.element_at(parts, 3).cast("long").alias("t"),
        F.element_at(parts, 4).cast("long").alias("vc"),
    )
    from tests.stream_util import collect_stream

    batches = collect_stream(
        score_stream_with_models(stream, models, **kw),
        str(tmp_path / "ck2"),
        output_mode="append",
    )
    streamed = sorted(
        (r["event_id"], r["m_model_t"], r["above_model"])
        for b in batches for r in b
    )
    assert streamed == expected


def test_incremental_query_matches_oracle(spark, duck):
    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMALL, assert_df_matches_oracle

    df = entrymod.queries()["incremental_model_scoring"](spark, SF_SMALL)
    assert_df_matches_oracle(
        df, duck, entrymod.oracle_sql()["incremental_model_scoring"]
    )
