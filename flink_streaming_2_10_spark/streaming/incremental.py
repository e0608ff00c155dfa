"""Incremental-learning program shape: stream scoring against a
batch-refreshed, hot-swapped model — the engine's analog of the
pom-advertised ``IncrementalLearningSkeleton`` (pom.xml:179; source
stripped from the fork).

Upstream Flink's skeleton has three parts: a training stream folded into
PARTIAL MODELS (one per training window), a prediction stream, and a
predictor that always scores with the NEWEST model while models keep
arriving (hot swap via a connected stream). The Spark-first re-expression
splits the same roles across the engine's existing primitives:

* **partial model building is a batch aggregation** —
  :func:`build_partial_models`: one model per (key, tumbling training
  window), exact integer statistics (sum of scaled units + count — never
  a float mean, which would be order-dependent and oracle-unstable),
  effective from the window END (a model exists only once its training
  window has closed — the skeleton's ``PartialModelBuilder`` contract).
* **"score with the newest model" is an as-of join** —
  :func:`score_with_models`: each event takes the latest model whose
  ``model_t <= event_t`` per key. Event-time formulation makes the
  program REPROCESSING-DETERMINISTIC: replaying the same events through
  any micro-batch slicing yields byte-identical scores, unlike the
  processing-time "whatever model happened to be current" coupling
  (which Flink's skeleton exhibits and which cannot be replayed).
* **the live face is zero-state stream enrichment** —
  :func:`score_stream_with_models` broadcasts the model history via
  ``asof_enrich_stream`` (streaming/runners.py) — no streaming state,
  same answers as the batch scorer.
* **hot swap per micro-batch** — :func:`run_incremental_scoring`: a
  ``foreachBatch`` loop that re-invokes the caller's model-refresh
  function on every micro-batch and scores the batch against the fresh
  table — the deployment shape when models retrain continuously out of
  band (the batch-refreshed half of the skeleton).

At 100 TB: training aggregation is one hash agg over (key, window);
the model table is tiny by construction (keys × windows), so scoring
broadcasts; event bodies never shuffle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.operators.temporal import _floor_div, asof_join
from flink_streaming_2_10_spark.streaming.runners import (
    asof_enrich_stream,
    run_update_stream,
)


def build_partial_models(
    training: DataFrame,
    on: list[str],
    time_col: str,
    value_units_col: str,
    window: int,
) -> DataFrame:
    """One partial model per (key, tumbling ``window``-sized training
    window): ``(keys..., model_t, sum_units, n_samples)``.

    ``model_t`` is the window END (exact integer floor-div bucketing, so
    epoch-ns magnitudes can't misbucket) — the model becomes usable only
    after its training data is complete. The model statistic is kept as
    an exact (Σ scaled-integer units, count) pair; consumers compare
    ``value·n >= Σ`` instead of dividing, so scoring is float-free.
    """
    w = int(window)
    if w <= 0:
        raise ValueError(f"window must be > 0, got {window}")
    model_t = ((_floor_div(f"`{time_col}`", w) + F.lit(1)) * F.lit(w)).alias(
        "model_t"
    )
    return training.groupBy(*[F.col(c) for c in on], model_t).agg(
        F.sum(F.col(value_units_col)).alias("sum_units"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def _above_expr(value_units_col: str, prefix: str) -> Column:
    """``value >= model mean`` without division: v·n >= Σ (exact longs).
    NULL when no model qualified (before the first window closes)."""
    n = F.col(f"{prefix}n_samples")
    s = F.col(f"{prefix}sum_units")
    return F.when(
        n.isNotNull(), F.col(value_units_col) * n >= s
    ).alias("above_model")


def score_with_models(
    events: DataFrame,
    models: DataFrame,
    on: list[str],
    event_time: str,
    value_units_col: str,
    right_prefix: str = "m_",
    broadcast: bool = True,
) -> DataFrame:
    """Batch scorer: every event with its newest applicable model's
    columns (``{prefix}model_t``/``sum_units``/``n_samples``, NULL before
    the first model) and ``above_model`` — whether the event's value is
    at or above the model mean. The skeleton's predictor, reformulated on
    event time.

    ``broadcast`` defaults to the broadcast model-history probe
    (:func:`streaming.runners.asof_enrich_stream`'s machinery on a
    bounded frame): the model table is TINY by construction — one row
    per (key, training window), so its size is keys × windows regardless
    of event volume — while the key domain is often low-cardinality
    (event types, sources). The alternative union+sort-window merge-asof
    (``broadcast=False``) would shuffle EVERY event into |keys|
    partitions — a parallelism collapse at scale — and exists only as a
    cross-validation path for tests (both faces must agree; results are
    identical since model_t is unique per key, so tie semantics never
    engage). Pass ``broadcast=False`` outside tests only if the model
    table genuinely outgrows executor memory (more distinct keys ×
    windows than a broadcast can hold), which inverts the trade.
    """
    join = asof_enrich_stream if broadcast else asof_join
    enriched = join(
        events,
        models,
        on=on,
        left_time=event_time,
        right_time="model_t",
        right_prefix=right_prefix,
    ).drop(*[f"{right_prefix}{k}" for k in on])
    return enriched.withColumn(
        "above_model", _above_expr(value_units_col, right_prefix)
    )


def score_stream_with_models(
    stream: DataFrame,
    models: DataFrame,
    on: list[str],
    event_time: str,
    value_units_col: str,
    right_prefix: str = "m_",
    min_event_time: int | None = None,
    max_history: int | None = None,
) -> DataFrame:
    """Streaming scorer: same semantics as :func:`score_with_models` on an
    unbounded event stream — the model history broadcasts; zero streaming
    state (see ``asof_enrich_stream`` for the bounding knobs)."""
    enriched = asof_enrich_stream(
        stream,
        models,
        on=on,
        left_time=event_time,
        right_time="model_t",
        right_prefix=right_prefix,
        min_event_time=min_event_time,
        max_history=max_history,
    )
    # asof_enrich_stream prefixes every dim column, including the join
    # keys; drop the duplicated keys to match the batch scorer's shape.
    return enriched.drop(*[f"{right_prefix}{k}" for k in on]).withColumn(
        "above_model", _above_expr(value_units_col, right_prefix)
    )


def run_incremental_scoring(
    stream: DataFrame,
    checkpoint_dir: str,
    refresh_models: Callable[[int], DataFrame],
    score_batch: Callable[[DataFrame, DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
) -> None:
    """Hot-swap loop: per micro-batch, pull a FRESH model table
    (``refresh_models(batch_id)`` — typically re-reading a table a batch
    trainer refreshes out of band), score the batch against it, hand the
    scored frame to ``sink``. With an event-time scorer and a
    ``refresh_models`` that returns the (append-only) model history, the
    union of all sunk batches is byte-identical to the one-shot batch
    score — micro-batch boundaries don't leak into results."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink(score_batch(batch_df, refresh_models(batch_id)), batch_id)

    run_update_stream(stream, checkpoint_dir, on_batch, output_mode="append")
