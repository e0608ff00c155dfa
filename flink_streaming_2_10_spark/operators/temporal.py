"""Temporal joins the DataFrame API lacks as primitives: as-of join and
interval (range) join.

The reference's stream–stream joins are window-bucketed equi joins
(JoinExample.scala — see operators/join.py); real event pipelines also
need the two temporal shapes Flink exposes as ``intervalJoin`` and the
table API's temporal/as-of join, and which training-data pipelines use
for attribution and session stitching. Both are implemented as
compositions of shuffles Catalyst already plans well — no Python, no
driver loops.

* **As-of join** — for each left row, the single latest right row with
  ``right_time <= left_time`` (optionally within a tolerance window) per
  key. Implementation: tag and union both sides, hash-partition by key,
  ONE per-partition sort by (time, side, tie), and a running
  ``last(right_payload, ignorenulls=True)`` window — the distributed
  merge-asof. Cost: one exchange per input + one sort; no join explosion,
  no per-row probes. Skewed keys concentrate in single partitions (the
  price of per-key ordering) — AQE skew handling does not split windows,
  so for skew-prone keys use ``bucketed=True``: the window partitions by
  (key, coarse time bucket) with right rows replicated one bucket
  forward, which is exact under ``tolerance`` and bounds any partition
  to one tolerance-width slice of one key.

* **Interval join** — all pairs with ``right_time ∈ [left_time + lower,
  left_time + upper]`` per key. Implementation: quantize time into
  buckets of width ``upper − lower``; each left row lands in the (at
  most two) buckets its window overlaps, each right row in exactly one,
  so an equi join on (key, bucket) + an exact range filter finds every
  pair while shuffling each right row once and each left row at most
  twice — the standard symmetric-interval-join bucketing, and the same
  idea as the reference's window-bucketed join generalized to arbitrary
  offsets.

Time columns are NUMERIC (e.g. ``unix_micros`` longs): integer
comparisons are exact and oracle-reproducible, while timestamp-typed
arithmetic differs subtly across engines. Callers project timestamps to
µs first (see __spark_entry__.q_asof_join_attribution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import StructType


def _floor_div(expr_sql: str, width: int) -> Column:
    """Exact floor division of a long SQL expression by an int width.

    ``F.floor(col / width)`` goes through double division, and for
    |t| > 2^53 (the epoch-ns regime catalog.py guards against with
    ``div``-not-``/``) float rounding can shift the bucket by one —
    silently breaking the replicated-one-bucket invariant. Integer
    ``div`` truncates toward zero, so emulate floor on negatives with
    the ``((t + 1) div W) - 1`` identity. Exact for all int64 inputs.
    """
    e = f"CAST(({expr_sql}) AS BIGINT)"
    w = int(width)
    return F.expr(f"IF({e} >= 0, {e} div {w}, (({e} + 1) div {w}) - 1)")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    tolerance: int | None = None,
    tie_cols: list[str] | None = None,
    right_prefix: str = "r_",
    direction: str = "backward",
    bucketed: bool = False,
) -> DataFrame:
    """Distributed merge-asof: latest right row at-or-before each left row
    (``direction="backward"``, the default) or earliest right row
    at-or-after it (``"forward"``).

    ``bucketed=True`` (requires ``tolerance``) is the skew-hardened path:
    the sort window is partitioned by (key, ``floor(time/tolerance)``)
    instead of key alone, with each right row replicated into its own and
    the next bucket. Any right row within tolerance of a left row at
    bucket ``b`` has bucket ``b-1`` or ``b``, so the replicated bucket
    holds every candidate — the result is IDENTICAL to the plain path
    (matches beyond tolerance are nulled either way), but a hot key's
    rows spread across ``time_span/tolerance`` partitions instead of
    concentrating in one. Cost: 2× the right side in the shuffle. Use it
    when one key can dominate (default/null user ids, bot traffic).

    Returns every ``left`` row with all ``right`` columns appended as
    ``{right_prefix}{col}`` — NULL when no right row qualifies.
    ``tolerance`` (same units as the time columns) drops matches further
    than that from ``left_time``. When several right rows share a
    (key, time), ``tie_cols`` break the tie deterministically (the
    greatest wins for backward, the smallest for forward — pandas
    ``merge_asof`` sort-order semantics; mirror any oracle with ORDER BY
    time DESC, ties DESC / time ASC, ties ASC respectively).

    Forward is backward on the time-reversed axis: both time columns are
    negated (exact for int64 magnitudes), the backward machinery runs
    unchanged, and the negation never escapes — payload columns are
    emitted from untouched structs. Same plan: one exchange per input,
    one per-key sort, one running-last window.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if direction == "forward":
        neg = "__neg_t"
        lneg = left.withColumn(neg, -F.col(left_time).cast("long"))
        rneg = right.withColumn(neg, -F.col(right_time).cast("long"))
        # ties negate too: greatest(-tie) on the reversed axis == smallest
        # tie in forward order.
        neg_ties = []
        for i, c in enumerate(tie_cols or []):
            nt = f"__neg_tie{i}"
            rneg = rneg.withColumn(nt, -F.col(c).cast("long"))
            lneg = lneg.withColumn(nt, F.lit(None).cast("long"))
            neg_ties.append(nt)
        out = asof_join(
            lneg,
            rneg,
            on=on,
            left_time=neg,
            right_time=neg,
            tolerance=tolerance,
            tie_cols=neg_ties,
            right_prefix=right_prefix,
            direction="backward",
            bucketed=bucketed,
        )
        drop = [neg, f"{right_prefix}{neg}"]
        drop += neg_ties + [f"{right_prefix}{t}" for t in neg_ties]
        return out.drop(*drop)
    if bucketed and tolerance is None:
        raise ValueError("asof_join: bucketed=True requires a tolerance")
    if tie_cols is None:
        tie_cols = []
    r_struct = F.struct(*[F.col(c) for c in right.columns]).alias("__r")
    r_type = StructType(right.schema.fields)
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l_type = StructType(left.schema.fields)

    # JOIN null semantics, not GROUP BY semantics: a NULL join key never
    # matches (pandas merge_asof and SQL equi-join agree; the r18
    # nullkey sweep caught the window's null PARTITION matching
    # null-key clicks to null-key views, which both the oracle's
    # lateral join and attribution sense reject). Dropping null-keyed
    # RIGHT rows is sufficient and scan-pushed: the null partition then
    # holds no candidates, so null-keyed LEFT rows keep their place in
    # the output with NULL right columns — exactly a left join.
    r_nonnull = right
    for c in on:
        r_nonnull = r_nonnull.filter(F.col(c).isNotNull())
    tagged_r = r_nonnull.select(
        *[F.col(c) for c in on],
        F.col(right_time).cast("long").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).cast("long").alias(f"__tie{i}") for i, c in enumerate(tie_cols)],
        F.lit(None).cast(l_type).alias("__l"),
        r_struct,
    )
    tagged_l = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).cast("long").alias("__t"),
        F.lit(1).alias("__side"),
        # Left rows sort AFTER any right row at the same (t, side) — the
        # tie columns only order right rows among themselves, so a left
        # row pins them to +inf.
        *[F.lit(None).cast("long").alias(f"__tie{i}") for i in range(len(tie_cols))],
        l_struct,
        F.lit(None).cast(r_type).alias("__r"),
    )
    part_cols: list[Column] = [F.col(c) for c in on]
    if bucketed:
        # Coarse time buckets of width == tolerance. A candidate right row
        # (rt in [t - tolerance, t]) has bucket(rt) in {bucket(t) - 1,
        # bucket(t)}, so replicating right rows one bucket forward makes
        # each left row's own bucket self-sufficient; anything older is
        # outside tolerance and nulled by the filter below regardless.
        bucket = _floor_div("__t", max(int(tolerance), 1))
        tagged_r = tagged_r.withColumn(
            "__bucket", F.explode(F.array(bucket, bucket + F.lit(1)))
        )
        tagged_l = tagged_l.withColumn("__bucket", bucket)
        part_cols.append(F.col("__bucket"))
    # Right rows order before left rows at equal time (asof is inclusive);
    # nulls_last puts left rows after all right tie values.
    order: list[Column] = [F.col("__t").asc(), F.col("__side").asc()]
    order += [F.col(f"__tie{i}").asc_nulls_last() for i in range(len(tie_cols))]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_r.unionByName(tagged_l).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    matched = merged.filter(F.col("__side") == 1)
    match = F.col("__match")
    if tolerance is not None:
        in_window = match[right_time].cast("long") >= F.col("__t") - F.lit(tolerance)
        match = F.when(in_window, match)
    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[match[c].alias(f"{right_prefix}{c}") for c in right.columns],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: int,
    upper: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with ``right_time`` in ``[left_time +
    lower, left_time + upper]`` per key (bounds inclusive, same units as
    the numeric time columns; ``lower <= upper``).

    Bucket width = window length: each right row is shuffled once, each
    left row at most twice, and the equi join on (key, bucket) bounds
    candidate pairs to adjacent buckets — output size is the only
    quadratic term, and only when the data genuinely has that many pairs.
    """
    if lower > upper:
        raise ValueError(f"interval_join: lower {lower} > upper {upper}")
    width = max(upper - lower, 1)
    lt = F.col(left_time).cast("long")
    rt = F.col(right_time).cast("long")

    # Exact integer floor-div buckets (_floor_div above — double division
    # would misbucket |t| > 2^53, and raw `div` misbuckets negatives).
    lt_sql = f"CAST(`{left_time}` AS BIGINT)"
    lo_bucket = _floor_div(f"{lt_sql} + ({int(lower)})", width)
    hi_bucket = _floor_div(f"{lt_sql} + ({int(upper)})", width)
    l_exp = left.withColumn(
        "__bucket",
        F.explode(F.array_distinct(F.array(lo_bucket, hi_bucket))),
    ).withColumn("__lt", lt)
    r_exp = right.select(
        _floor_div(f"CAST(`{right_time}` AS BIGINT)", width).alias("__bucket"),
        rt.alias("__rt"),
        *[F.col(c) for c in on],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    cond = (
        (F.col("__rt") >= F.col("__lt") + F.lit(lower))
        & (F.col("__rt") <= F.col("__lt") + F.lit(upper))
    )
    return (
        l_exp.join(r_exp, on=[*on, "__bucket"])
        .filter(cond)
        .drop("__bucket", "__lt", "__rt")
    )


def sessionize(
    df: DataFrame,
    on: list[str],
    time_col: str,
    gap: int,
    tie_cols: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Inactivity-gap sessionization: assign every event a per-key
    ``session_idx`` (1-based), where a new session starts only when the
    gap from the key's previous event EXCEEDS ``gap`` (same numeric
    units as ``time_col``). A delta of exactly ``gap`` stays in-session:
    Flink's ``EventTimeSessionWindows.withGap`` assigns [t, t+gap) per
    event and ``TimeWindow.intersects`` is INCLUSIVE
    (``start <= other.end && end >= other.start``), so abutting windows
    merge — reference parity. Spark's built-in ``session_window`` (used
    by operators/windows.py ``session_window_agg``) merges the exact-gap
    boundary the same way on Spark 4.1.2 (verified by the r15
    randomized gap sweep — an earlier note here claimed it diverged).

    The event-level face of session windows (operators/windows.py
    ``session_window_agg`` aggregates; this LABELS, so downstream can
    join events back to their session or compute arbitrary per-session
    features). Implementation: one per-key sort, ``lag`` for the
    previous time, and a running sum of new-session flags — the
    standard distributed sessionization, one exchange + one window.
    ``tie_cols`` totally order simultaneous events so labels are
    deterministic.

    ``bucket_width`` (two-phase, the skew escape hatch — SCALE_r17
    measured a ×2.8 single-straggler penalty on the plain path at a 95%
    hot key, the null/bot-user-id shape at 100 TB): when set, the
    per-key prefix runs in TWO result-invariant phases instead of one
    single-partition sort per key. Phase 1 sessionizes LOCALLY inside
    each (key, ``floor(time/bucket_width)``) partition — the hot key
    spreads over ``time_span/bucket_width`` tasks. Phase 2 stitches
    buckets per key over ONE tiny summary row per non-empty bucket
    (first/last event time, local session count): bucket ``b``'s first
    local session merges into the previous non-empty bucket's last
    session iff ``first_t(b) - last_t(prev) <= gap`` — the exact
    new-session test on real event times, so the result is
    bit-identical to the plain path for ANY width (gap boundaries ON
    the bucket edge included; only ties can't straddle buckets, and
    equal times always share a bucket). Global index = running sum of
    (local sessions − merge flag) over earlier buckets, plus the local
    index, minus this bucket's merge flag. Cost: the phase-2 summary
    shuffle (rows = non-empty buckets, not events) and a broadcast-size
    join back on (key, bucket). Pick a width giving ≥ O(cores) buckets
    over the hottest key's time span — same guidance as
    ``asof_join(bucketed=True)``, which this mirrors (SCALE_r18
    measures the straggler flattened).
    """
    tie_cols = tie_cols or []
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in tie_cols]
    t = F.col(time_col).cast("long")
    if bucket_width is None:
        w = Window.partitionBy(*[F.col(c) for c in on]).orderBy(*order)
        wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        prev = F.lag(t).over(w)
        is_new = F.when(
            prev.isNull() | (t - prev > F.lit(gap)), F.lit(1)
        ).otherwise(F.lit(0))
        return df.withColumn("session_idx", F.sum(is_new).over(wrun))
    width = int(bucket_width)
    if width <= 0:
        raise ValueError(f"sessionize: bucket_width must be > 0, got {width}")
    bucket = _floor_div(f"`{time_col}`", width)
    key_cols = [F.col(c) for c in on]
    # Phase 1 (events pass, the ONE full-width shuffle): local
    # sessionization inside each (key, bucket). The first row of a
    # bucket always opens local session 1; whether it really starts a
    # new GLOBAL session is phase 2's call.
    w1 = Window.partitionBy(*key_cols, F.col("__bucket")).orderBy(*order)
    w1run = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev1 = F.lag(t).over(w1)
    is_new1 = F.when(
        prev1.isNull() | (t - prev1 > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    local = df.withColumn("__bucket", bucket).withColumn(
        "__lj", F.sum(is_new1).over(w1run)
    )
    # Phase 2 summaries are derived from a NARROW (key, bucket, t)
    # projection, NOT from `local`: a self-join on `local` would make
    # Spark recompute the full-width phase-1 pipeline on both join
    # branches (measured ~2× on the r18 probe). Session boundaries
    # depend only on times — tie order never moves a gap — so the
    # narrow branch's session count per bucket provably equals
    # max(__lj), while shuffling only three columns.
    narrow = df.select(*key_cols, t.alias("__t"), bucket.alias("__bucket"))
    wn = Window.partitionBy(*key_cols, F.col("__bucket")).orderBy(
        F.col("__t").asc()
    )
    prevn = F.lag(F.col("__t")).over(wn)
    is_newn = F.when(
        prevn.isNull() | (F.col("__t") - prevn > F.lit(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    summ = (
        narrow.withColumn("__new", is_newn)
        .groupBy(*key_cols, F.col("__bucket"))
        .agg(
            F.min("__t").alias("__first_t"),
            F.max("__t").alias("__last_t"),
            F.sum("__new").alias("__nsess"),
        )
    )
    # Per-KEY stitch over summaries only (rows = non-empty buckets, not
    # events: tiny even for the hottest key). Bucket b's first local
    # session merges into the previous non-empty bucket's last session
    # iff the real inter-event delta is within gap.
    w2 = Window.partitionBy(*key_cols).orderBy(F.col("__bucket").asc())
    w2run = w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_last = F.lag(F.col("__last_t")).over(w2)
    merge = F.when(
        prev_last.isNotNull()
        & (F.col("__first_t") - prev_last <= F.lit(gap)),
        F.lit(1),
    ).otherwise(F.lit(0))
    summ = summ.withColumn("__merge", merge).withColumn(
        "__adj", F.col("__nsess") - F.col("__merge")
    )
    summ = summ.withColumn(
        "__prefix", F.sum("__adj").over(w2run) - F.col("__adj")
    ).select(
        *[F.col(c).alias(f"__s_{c}") for c in on],
        F.col("__bucket").alias("__s_bucket"),
        "__merge",
        "__prefix",
    )
    # Null-safe equi join back (list-form `on=` uses null-UNSAFE
    # equality and would drop null-keyed rows the plain path labels).
    cond = F.col("__bucket").eqNullSafe(F.col("__s_bucket"))
    for c in on:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__s_{c}"))
    out = local.join(summ, cond).withColumn(
        "session_idx",
        (F.col("__prefix") + F.col("__lj") - F.col("__merge")).cast("long"),
    )
    return out.select(*[F.col(c) for c in df.columns], F.col("session_idx"))
