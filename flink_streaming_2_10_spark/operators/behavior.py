"""Event-behavior analytics: cohort retention and rolling-window
anomaly flags over the events stream.

Both operators follow the engine's exactness discipline (README
"oracle-stable arithmetic"): every aggregate and comparison is integer
arithmetic on scaled units or date arithmetic on truncated weeks, so an
independent engine reproduces results bit-for-bit — no float
mean/stddev in any decision.

Builds on the keyed-aggregation surface the reference establishes
(keyBy + rolling aggregates, WindowWordCount.java / TopSpeedWindowing
family); these are the corpus-monitoring faces a training-data
pipeline runs over its ingestion event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from flink_streaming_2_10_spark.functions.money import to_units


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: ``(cohort_week, week_offset, n_active)``
    — users grouped by the ISO week of their FIRST event (emitted as
    the week's Monday as a ``yyyy-MM-dd`` string: DATE/TIMESTAMP pandas
    representations differ between engines, strings compare exactly);
    for each cohort and week offset, how many of them were active.

    The ``week_offset = 0`` row is the cohort's size by construction
    (every user is active in their first week), so retention rates are
    ``n_active / n_active@offset0`` downstream — emitted as exact
    integers, never a float ratio.

    Scale shape — ONE corpus-scale exchange: the per-user week set is
    built with a single ``groupBy(user)`` + ``collect_set(week)`` whose
    map-side partial aggregation collapses duplicate (user, week) pairs
    before the shuffle, replacing the textbook distinct → first-week agg
    → self-join chain (three exchanges) with one. Per-user state is
    bounded by the calendar (one entry per active week — ~520 for a
    10-year log), not by event volume; the cohort/offset re-aggregation
    downstream runs on user-week rows, which are already tiny. Week
    truncation is ISO-Monday ``date_trunc('week')`` — identical in
    DuckDB — and the offset is ``datediff div 7`` on week-truncated
    dates (always an exact multiple of 7).

    NULL users are excluded up front: a cohort needs an identity, and
    the canonical SQL form (user-week set JOINed to its first-week
    aggregate on user equality) drops them anyway — the one-exchange
    groupBy here would otherwise invent a NULL-user cohort the oracle
    can never contain (r18 nullkey sweep). The filter is scan-pushed.
    """
    per_user = (
        events.filter(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.to_date(F.date_trunc("week", F.col(time_col))).alias("__wk"),
        )
        .groupBy("__u")
        .agg(F.collect_set("__wk").alias("__wks"))
    )
    exploded = per_user.select(
        F.array_min("__wks").alias("__cw"),
        F.explode("__wks").alias("__wk"),
    )
    return (
        exploded.select(
            F.date_format("__cw", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("cast(datediff(__wk, __cw) div 7 as int)").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def rolling_zscore_flags(
    events: DataFrame,
    key_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window: int = 100,
    min_n: int = 30,
    z_thresh: int = 3,
) -> DataFrame:
    """Per-key rolling anomaly flags: for each event, compare its value
    against the mean/stddev of the PRECEDING ``window`` events of the
    same key (frame ``ROWS BETWEEN window PRECEDING AND 1 PRECEDING`` —
    the event never sees itself, so a spike cannot mask its own
    detection). Returns ``(event_id, <key>, <time>, <value>, window_n,
    is_anomaly)``.

    Exactness: the z-test ``|v − μ| > z·σ`` is evaluated WITHOUT
    computing μ or σ — values scale to integer units (``money.
    to_units``) and the inequality is squared into pure int64 terms::

        (v·n − S)² > z² · (n·SS − S²)        [n ≥ min_n]

    with ``S = Σv``, ``SS = Σv²`` over the frame (population σ). Both
    sides are exact 64-bit integers — overflow-safe while
    ``n·max(v)² < 2⁶³/z²``, i.e. values to ~10⁶ units at window 100 —
    so the flag is deterministic and the DuckDB oracle reproduces it
    bit-for-bit (no float mean/variance anywhere).

    Scale shape: one exchange on the key + one ordered window pass;
    running sums over a rows-frame are O(1) per row. Keys are
    low-cardinality event types, so per-key ordering parallelism is
    bounded by key count — the same documented caveat as plain
    ``sessionize`` (a degenerate hot key serializes in one task;
    sessionize grew a two-phase ``bucket_width`` escape hatch in r18,
    but a rolling z-score needs the full running prefix, so here the
    caveat stands).
    ``z_thresh`` must be an integer (it enters the inequality squared).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not (1 <= min_n <= window):
        raise ValueError("min_n must be in [1, window]")
    v = to_units(value_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window, -1)
    )
    scaled = events.select(
        id_col,
        key_col,
        time_col,
        value_col,
        v.alias("__v"),
    )
    framed = scaled.select(
        id_col,
        key_col,
        time_col,
        value_col,
        "__v",
        F.count("__v").over(w).alias("__n"),
        F.coalesce(F.sum("__v").over(w), F.lit(0)).alias("__s"),
        F.coalesce(F.sum(F.col("__v") * F.col("__v")).over(w), F.lit(0)).alias(
            "__ss"
        ),
    )
    lhs = F.col("__v") * F.col("__n") - F.col("__s")
    rhs = F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")
    return framed.select(
        id_col,
        key_col,
        time_col,
        value_col,
        F.col("__n").cast("int").alias("window_n"),
        (
            (F.col("__n") >= F.lit(int(min_n)))
            & (lhs * lhs > F.lit(int(z_thresh) ** 2) * rhs)
        ).alias("is_anomaly"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "t",
    tie_col: str = "event_id",
) -> DataFrame:
    """Markov transition census over per-user event sequences:
    ``(from_type, to_type, n_transitions, share)`` — every adjacent
    (previous, next) event-type pair in each user's time-ordered
    stream, counted corpus-wide, with ``share`` the pair's fraction of
    all transitions. The first-order behavioral fingerprint (what
    users do next) that funnels hard-code one path of; feeding the
    full matrix to downstream analytics is the sequence-mining face.

    100 TB shape: ONE exchange on the user key for the lag window
    (sort bounded per user), then the pair aggregation collapses to at
    most |types|² rows map-side; the total for ``share`` is a 1-row
    broadcast back (keyword_search totals-row pattern) and one exact
    long division. Total order inside a user is (time, tie_col), so
    the census is deterministic under any row order.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(time_col).asc(), F.col(tie_col).asc()
    )
    pairs = df.select(
        F.lag(F.col(type_col)).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    # The aggregated table is bounded at |types|² rows, so the total is
    # a single-partition window over it (NOT over the corpus) — one tiny
    # exchange instead of re-evaluating the aggregation for a broadcast
    # totals row.
    total = F.sum("n_transitions").over(Window.partitionBy())
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / total.cast("double")
        ).alias("share"),
    )


def event_type_pivot(
    events: DataFrame,
    time_col: str = "ts",
    type_col: str = "event_type",
    types: tuple[str, ...] = ("view", "click", "purchase", "error", "signup"),
) -> DataFrame:
    """Daily event-type matrix via PIVOT: ``(day, n_<type>..., n_other,
    n_total)`` — one row per day, one exact count column per declared
    event type (the wide dashboard face of the events log; the
    long/narrow face is ``hypertable_rollup``).

    ``types`` is EXPLICIT on purpose: ``pivot(col)`` without a value
    list runs a distinct-scan job to discover columns, making the
    output schema data-dependent — a schema that changes when a new
    event type appears breaks downstream consumers and the oracle
    contract. Undeclared types land in ``n_other`` so totals still
    reconcile (``n_total`` = declared + other, asserted in tests).

    Scale shape: pivot-with-values plans as ONE hash aggregation with
    |types|+2 conditional-count partials — map-side combined, one
    exchange on the day key, no per-type scan, no distinct discovery
    job. Day truncation to a ``yyyy-MM-dd`` string (the engine's
    DATE-representation-safe convention, same as retention_cohorts).
    """
    day = F.date_format(
        F.date_trunc("day", F.col(time_col)), "yyyy-MM-dd"
    ).alias("day")
    t = F.col(type_col)
    aggs = [
        F.sum(F.when(t == F.lit(ty), 1).otherwise(0))
        .cast("long")
        .alias(f"n_{ty}")
        for ty in types
    ]
    aggs.append(
        F.sum(F.when(t.isin(*types), 0).otherwise(1))
        .cast("long")
        .alias("n_other")
    )
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_total"))
    return events.select(day, t).groupBy("day").agg(*aggs)
