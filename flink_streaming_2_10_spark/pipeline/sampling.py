"""Corpus sampling for training-data pipelines (north-star extensions):
deterministic stratified sampling and domain-mixture reweighting.

Both operators are built for the 100 TB shape:

* ``stratified_sample`` is a pure narrow FILTER — the keep/drop decision
  is a per-row hash threshold, so it runs scan-side (no shuffle, no
  state, no RNG service), prunes at the parquet reader when stacked
  under other predicates, and is reproducible run-to-run and
  engine-to-engine (the DuckDB oracle computes the identical md5-derived
  key). Seeded by a string salt so re-draws are independent.
* ``domain_mixture`` reduces the corpus to one tiny per-stratum
  aggregate (hash agg with map-side partials; the shuffle carries one
  row per language), then derives sampling weights against a uniform
  target share with a fixed-order double expression both engines
  evaluate bit-identically.

Deterministic hash sampling (vs ``df.sample``) is the standard trick for
reproducible corpus draws: membership depends only on (salt, doc_id), so
a 1 % draw is a subset of the 10 % draw and rejection studies can replay
exact cohorts.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import duckdb_hash60_sql

#: 2^60 as an exactly-representable double: the hash key below is 60 bits,
#: so ``key / 2^60`` is uniform on [0, 1).
_TWO_POW_60 = float(1 << 60)


def duckdb_double_lit(x: float) -> str:
    """Render a Python float as a DuckDB literal that parses DIRECTLY
    as DOUBLE — exponent form forces DOUBLE typing, so the value is the
    correctly-rounded ``strtod`` parse, bit-identical to the Python
    float Spark gets via ``F.lit``.

    A BARE decimal literal would be typed DECIMAL(p, s); at 17
    significant digits (full ``repr`` of an arbitrary double, e.g.
    ``3/13 = 0.23076923076923078``) the decimal's integer mantissa
    exceeds 2^53, so the DECIMAL→DOUBLE cast rounds TWICE and can land
    one ulp off the direct parse — found by
    ``test_budget_plan_oracle_parity_randomized`` as a shortfall
    mismatch (0.6923076923076923 vs ...24). Wrapping in
    ``CAST(... AS DOUBLE)`` does NOT avoid this: the literal is typed
    before the cast.

    Non-finite values raise: ``repr(inf)`` would render as ``infe0``,
    which DuckDB rejects — better a clear error at oracle-build time
    than a broken query at run time."""
    v = float(x)
    if not math.isfinite(v):
        raise ValueError(f"duckdb_double_lit requires a finite float, got {v!r}")
    r = repr(v)
    return r if ("e" in r or "E" in r) else r + "e0"


def _sample_key(id_col: Column, salt: str) -> Column:
    """60-bit md5-derived key of ``salt || ':' || id`` as a double in
    [0, 2^60) — bit-identical to the DuckDB oracle's expression (same
    construction as dedup._hash60; see duckdb_hash60_sql)."""
    seeded = F.concat(F.lit(f"{salt}:"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


def sample_key_sql(id_expr: str, salt: str) -> str:
    """DuckDB SQL reproducing :func:`_sample_key` exactly."""
    return duckdb_hash60_sql(f"'{salt}:' || CAST({id_expr} AS VARCHAR)")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff ``hash(salt, id) / 2^60 < rate(stratum)`` —
    deterministic per-stratum Bernoulli sampling with no shuffle.

    The comparison is done in doubles (``cast(key as double) < rate *
    2^60``): the long→double cast and the product round identically
    under IEEE-754 in Spark and DuckDB, so the oracle keeps the exact
    same rows. Monotone in the rate: raising a stratum's rate only adds
    rows (hash thresholding), which tests assert.
    """
    key = _sample_key(F.col(id_col), salt).cast("double")
    rate: Column = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    return df.filter(key < rate * F.lit(_TWO_POW_60)).select(
        id_col, strata_col
    )


def stratified_sample_oracle(
    rates: dict[str, float],
    default_rate: float = 0.0,
    table: str = "documents",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "sample",
) -> str:
    """DuckDB mirror of :func:`stratified_sample` (same CASE order, same
    double arithmetic)."""
    case = " ".join(
        f"WHEN {strata_col} = '{stratum}' THEN {duckdb_double_lit(r)}"
        for stratum, r in sorted(rates.items(), reverse=True)
    )
    key = sample_key_sql(id_col, salt)
    return f"""
        SELECT {id_col}, {strata_col}
        FROM {table}
        WHERE CAST({key} AS DOUBLE) <
              (CASE {case} ELSE {duckdb_double_lit(default_rate)} END) * {_TWO_POW_60!r}
    """


def _validate_fractions(fractions: dict[str, float], names: list[str]) -> None:
    """Shared guard for :func:`holdout_split` / :func:`holdout_split_oracle`:
    every fraction must lie in (0, 1] AND the set must sum to 1 — a
    negative or zero fraction would pass a sum-only check and silently
    yield an empty band with its mass shifted to later splits."""
    if not names:
        raise ValueError("fractions must not be empty")
    for n in names:
        f = float(fractions[n])
        if not 0.0 < f <= 1.0:
            raise ValueError(
                f"fraction for split '{n}' must be in (0, 1], got {f}"
            )
    total = sum(float(fractions[n]) for n in names)
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"fractions must sum to 1, got {total}")


def holdout_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: each row gets
    the ``split`` label of the hash-threshold band its
    ``hash(salt, id) / 2^60`` value falls in — cumulative fractions over
    alphabetically-sorted split names, remainder to the LAST name.

    Scan-side (one narrow projection, zero shuffle, no sampling pass),
    reproducible (re-running assigns identically — the property a
    training pipeline needs so a document can never migrate between
    train and a held-out set across reruns), and monotone-stable:
    growing one split's fraction only moves rows across the ONE adjacent
    boundary. Exactly mirrored in DuckDB (:func:`holdout_split_oracle`),
    same IEEE-double band arithmetic as :func:`stratified_sample`.
    """
    return df.select(
        id_col, holdout_label(F.col(id_col), fractions, salt).alias("split")
    )


def holdout_label(
    id_col: Column, fractions: dict[str, float], salt: str = "split"
) -> Column:
    """The split-label EXPRESSION :func:`holdout_split` projects — public
    so composing operators (e.g. ``pipeline.leakage``) can attach the
    label scan-side to any row carrying the id, with no join."""
    names = sorted(fractions)
    _validate_fractions(fractions, names)
    key = _sample_key(id_col, salt).cast("double")
    # First-match-wins when-chain over cumulative band edges — the exact
    # CASE shape the oracle emits.
    label: Column | None = None
    cum = 0.0
    for name in names[:-1]:
        cum += float(fractions[name])
        cond = key < F.lit(cum) * F.lit(_TWO_POW_60)
        label = F.when(cond, name) if label is None else label.when(cond, name)
    return F.lit(names[-1]) if label is None else label.otherwise(names[-1])


def holdout_split_oracle(
    fractions: dict[str, float],
    table: str = "documents",
    id_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """DuckDB mirror of :func:`holdout_split` — same cumulative bands,
    same double arithmetic, same remainder-to-last rule."""
    return f"""
        SELECT {id_col},
               {holdout_label_sql(id_col, fractions, salt)} AS split
        FROM {table}
    """


def holdout_label_sql(
    id_expr: str, fractions: dict[str, float], salt: str = "split"
) -> str:
    """DuckDB mirror of :func:`holdout_label` (a CASE expression)."""
    names = sorted(fractions)
    _validate_fractions(fractions, names)
    key = sample_key_sql(id_expr, salt)
    whens, cum = [], 0.0
    for name in names[:-1]:
        cum += float(fractions[name])
        whens.append(
            f"WHEN CAST({key} AS DOUBLE) < {duckdb_double_lit(cum)} * {_TWO_POW_60!r} "
            f"THEN '{name}'"
        )
    if not whens:
        return f"'{names[-1]}'"
    return f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"


def domain_mixture(
    df: DataFrame,
    token_col_expr: Column,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    max_weight: float = 8.0,
) -> DataFrame:
    """Per-stratum corpus composition and uniform-target resampling
    weights: ``weight = min(target_share / actual_share, max_weight)``
    where ``target_share = 1 / n_strata`` and ``actual_share`` is the
    stratum's token fraction.

    One hash aggregation over the corpus (map-side partials; the
    exchange carries one row per stratum), then a broadcast cross join
    against the 1-row total — nothing re-scans or re-shuffles the
    corpus. Upsampling weights are capped at ``max_weight`` (the Pareto
    guard every mixture schedule applies so rare strata don't explode).
    """
    per = df.select(F.col(strata_col), token_col_expr.alias("_tok")).groupBy(
        strata_col
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
    )
    totals = F.broadcast(
        per.agg(
            F.sum("n_tokens").alias("_total_tokens"),
            F.count(F.lit(1)).alias("_n_strata"),
        )
    )
    share = F.col("n_tokens").cast("double") / F.col("_total_tokens").cast("double")
    target = F.lit(1.0) / F.col("_n_strata").cast("double")
    return (
        per.crossJoin(totals)
        .select(
            strata_col,
            "n_docs",
            "n_tokens",
            share.alias("share"),
            F.least(target / share, F.lit(float(max_weight))).alias("weight"),
        )
    )


def domain_mixture_oracle(
    token_expr_sql: str,
    table: str = "documents",
    strata_col: str = "lang",
    max_weight: float = 8.0,
) -> str:
    """DuckDB mirror of :func:`domain_mixture`: identical aggregation and
    the same fixed-order double expression for share/weight."""
    return f"""
        WITH per AS (
            SELECT {strata_col}, count(*) AS n_docs,
                   CAST(sum({token_expr_sql}) AS BIGINT) AS n_tokens
            FROM {table} GROUP BY {strata_col}
        ),
        tot AS (SELECT sum(n_tokens) AS total_tokens,
                       count(*) AS n_strata FROM per)
        SELECT {strata_col}, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS share,
               least((1.0 / CAST(n_strata AS DOUBLE)) /
                     (CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)),
                     {duckdb_double_lit(max_weight)}) AS weight
        FROM per, tot
    """


def priority_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "priority",
    prefilter_buckets: int | None = None,
) -> DataFrame:
    """EXACT-size deterministic per-stratum sample: the ``k`` rows with
    the smallest hash priorities per stratum — the fixed-size complement
    of :func:`stratified_sample`'s Bernoulli draw (which only hits its
    rate in expectation). Output ``(id, stratum, priority,
    sample_rank)``.

    Properties that make this the reproducible-cohort primitive:
    membership depends only on (salt, id), so re-runs and other engines
    draw the same rows (the priority is the shared md5-60 key); and the
    draw NESTS — ``priority_sample(k)`` is a strict prefix of
    ``priority_sample(k+1)`` per stratum, so scaling a study up keeps
    every previously selected document.

    Scale: identical shape to :func:`source_quality_cap` — ranking
    windows partitioned by stratum, with the same result-invariant
    two-pass bucketed top-k (``prefilter_buckets``) bounding per-task
    state under a mega-stratum; only (id, stratum, 8-byte priority)
    ever shuffles.
    """
    from pyspark.sql import Window

    keyed = df.select(
        F.col(id_col),
        F.col(strata_col),
        _sample_key(F.col(id_col), salt).alias("priority"),
    )
    order = [F.col("priority").asc(), F.col(id_col).asc()]
    if prefilter_buckets is not None:
        w1 = Window.partitionBy(
            F.col(strata_col),
            F.pmod(F.hash(F.col(id_col)), F.lit(prefilter_buckets)),
        ).orderBy(*order)
        keyed = (
            keyed.withColumn("__r", F.row_number().over(w1))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    w = Window.partitionBy(strata_col).orderBy(*order)
    return keyed.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def priority_sample_oracle(
    k: int,
    table: str = "documents",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    salt: str = "priority",
) -> str:
    """DuckDB mirror of :func:`priority_sample` (same md5-60 priority,
    same (priority, id) order)."""
    key = sample_key_sql(id_col, salt)
    return f"""
        WITH keyed AS (
            SELECT {id_col}, {strata_col},
                   CAST({key} AS BIGINT) AS priority
            FROM {table}
        ),
        r AS (SELECT *, row_number() OVER (
                  PARTITION BY {strata_col}
                  ORDER BY priority, {id_col}) AS sample_rank
              FROM keyed)
        SELECT {id_col}, {strata_col}, priority,
               CAST(sample_rank AS INT) AS sample_rank
        FROM r WHERE sample_rank <= {int(k)}
    """


def source_quality_cap(
    df: DataFrame,
    cap: int = 100,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    prefilter_buckets: int | None = None,
) -> DataFrame:
    """Cap every source (domain) at its ``cap`` highest-quality documents
    — the "domain capping" pass real pretraining mixtures apply so one
    mega-crawl domain can't dominate the corpus. Quality is the shared
    heuristic (textstats.quality_exprs), ties broken by doc_id; output is
    ``(doc_id, source, quality, rank_in_source)``.

    Scale: ranking is a window partitioned by source — a mega-domain
    would concentrate in one task, so ``prefilter_buckets=B`` enables the
    two-pass top-k: pass 1 ranks within (source, hash-bucket of doc_id)
    and keeps ``cap`` rows per bucket (any row in a source's global
    top-``cap`` is necessarily in its bucket's top-``cap``, so this
    prunes without changing the answer); pass 2 ranks the surviving
    ``≤ B·cap`` rows per source. Per-task state is bounded by
    ``max(rows/B, B·cap)`` — pick B ≈ sqrt(hot_rows/cap). Quality is
    computed scan-side BEFORE any shuffle; only (id, source, quality)
    ever moves.
    """
    from pyspark.sql import Window

    from flink_streaming_2_10_spark.pipeline.textstats import quality_exprs

    scored = df.select(
        F.col(id_col),
        F.col(source_col),
        quality_exprs(F.col(text_col))["quality"].alias("quality"),
    )
    order = [F.col("quality").desc(), F.col(id_col).asc()]
    if prefilter_buckets is not None:
        # result-invariant prune: the bucket hash needs no cross-engine
        # contract (nothing downstream depends on WHICH bucket, only
        # that each is capped), so the cheap JVM hash is fine.
        w1 = Window.partitionBy(
            F.col(source_col), F.pmod(F.hash(F.col(id_col)), F.lit(prefilter_buckets))
        ).orderBy(*order)
        scored = (
            scored.withColumn("__r", F.row_number().over(w1))
            .filter(F.col("__r") <= cap)
            .drop("__r")
        )
    w = Window.partitionBy(source_col).orderBy(*order)
    return scored.withColumn("rank_in_source", F.row_number().over(w)).filter(
        F.col("rank_in_source") <= cap
    )


def mixture_budget_plan(
    df: DataFrame,
    token_col_expr: Column,
    targets: dict[str, float],
    budget_tokens: int,
    strata_col: str = "lang",
) -> DataFrame:
    """Token-budget mixture plan: given ABSOLUTE token budget and target
    mixture weights, the per-stratum keep rates that realize it — the
    planning step a 100 TB corpus runs before resampling down to a
    training budget (the Pile/Dolma-style recipe: "B tokens total,
    w_s of them from stratum s"), and the budgeted complement of
    :func:`domain_mixture` (which reweights toward a uniform target
    with no absolute budget).

    Per stratum: ``desired = budget · w_s``; ``keep_rate =
    min(1, desired / n_tokens)``; ``planned_tokens = min(desired,
    n_tokens)``; ``shortfall = max(0, desired − n_tokens)`` — an
    OVERSUBSCRIBED stratum (corpus has fewer tokens than its budget
    share asks for) clamps to keeping everything and reports the unmet
    mass instead of silently upsampling (duplication is a curation
    decision, not a planner default). A stratum observed in the corpus
    but absent from ``targets`` gets weight 0 (keep nothing, report it)
    so typos in the recipe surface as zero-rate rows, never as silent
    corpus passthrough. The mirror case is also reported: a TARGET
    stratum entirely absent from the corpus emits a zero-count row
    (``n_docs = n_tokens = 0``, ``keep_rate = 0``, full-``desired``
    shortfall) instead of vanishing, so a recipe naming a nonexistent
    stratum is visible as unmet budget mass rather than silently
    dropping its share.

    Scale shape: ONE hash aggregation over the corpus (map-side
    partials; the exchange carries one row per stratum); everything
    after is per-stratum literal arithmetic in a fixed operation order
    both engines evaluate bit-identically. Feed the resulting rates to
    :func:`stratified_sample` (same strata column) to execute the plan
    scan-side.

    ``targets`` must be nonnegative and sum to 1 (within 1e-9).
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if not targets:
        raise ValueError("targets must be non-empty")
    for name, w in targets.items():
        if not (w >= 0.0):
            raise ValueError(f"target weight for {name!r} must be >= 0")
    total_w = sum(float(w) for w in targets.values())
    if abs(total_w - 1.0) > 1e-9:
        raise ValueError(f"target weights must sum to 1, got {total_w!r}")

    # Target strata absent from the corpus must still emit a row (full
    # shortfall), so the corpus rows are unioned with one PHANTOM row
    # per target (``_real = 0, _tok = 0``) BEFORE the aggregation:
    # ``n_docs = sum(_real)`` counts only real documents, present
    # targets absorb a harmless +0, absent targets materialize as
    # zero-count strata. This keeps the plan at EXACTLY ONE hash
    # aggregation over the corpus (map-side partials; the union's
    # literal side is one local partition) — an anti-join or
    # post-agg re-union would add a second exchange or reference the
    # corpus aggregate twice.
    from pyspark.sql.types import StructType

    real = df.select(
        F.col(strata_col),
        token_col_expr.alias("_tok"),
        F.lit(1).alias("_real"),
    )
    phantoms = df.sparkSession.createDataFrame(
        [(name,) for name in sorted(targets)],
        StructType([real.schema[strata_col]]),
    ).select(
        F.col(strata_col),
        F.lit(0).cast(real.schema["_tok"].dataType).alias("_tok"),
        F.lit(0).alias("_real"),
    )
    per = (
        real.unionByName(phantoms)
        .groupBy(strata_col)
        .agg(
            F.sum("_real").alias("n_docs"),
            F.sum("_tok").alias("n_tokens"),
        )
    )
    weight = F.lit(0.0)
    for name in sorted(targets):
        weight = F.when(
            F.col(strata_col) == F.lit(name), F.lit(float(targets[name]))
        ).otherwise(weight)
    desired = F.lit(float(budget_tokens)) * weight
    tok_d = F.col("n_tokens").cast("double")
    return per.select(
        strata_col,
        "n_docs",
        "n_tokens",
        weight.alias("target_share"),
        F.when(tok_d > F.lit(0.0), F.least(F.lit(1.0), desired / tok_d))
        .otherwise(F.lit(0.0))
        .alias("keep_rate"),
        F.least(desired, tok_d).alias("planned_tokens"),
        F.greatest(F.lit(0.0), desired - tok_d).alias("shortfall"),
    )


def mixture_budget_plan_oracle(
    token_expr_sql: str,
    targets: dict[str, float],
    budget_tokens: int,
    table: str = "documents",
    strata_col: str = "lang",
) -> str:
    """DuckDB mirror of :func:`mixture_budget_plan` — same CASE order
    (sorted target names, later WHEN wins exactly as the chained
    ``F.when`` does), same fixed-order double arithmetic. Every numeric
    literal is wrapped in ``CAST(... AS DOUBLE)``: DuckDB types bare
    decimal literals as DECIMAL and would otherwise compute
    ``desired = budget * weight`` in exact decimal arithmetic while
    Spark computes it in IEEE doubles (e.g. budget 3 x weight 0.1 is
    0.3 exactly in DECIMAL but 0.30000000000000004 as doubles). Target
    strata are seeded as phantom zero rows BEFORE the aggregation
    (``_real = 0``), mirroring the Spark side's single-aggregation
    shape exactly — including the edge where a present target stratum
    with an all-NULL token expression sums to 0, not NULL."""
    whens = " ".join(
        f"WHEN {strata_col} = '{name}'"
        f" THEN CAST({duckdb_double_lit(targets[name])} AS DOUBLE)"
        for name in sorted(targets, reverse=True)
    )
    w = f"(CASE {whens} ELSE CAST(0.0 AS DOUBLE) END)"
    desired = f"(CAST({duckdb_double_lit(budget_tokens)} AS DOUBLE) * {w})"
    tok_d = "CAST(n_tokens AS DOUBLE)"
    one_d = "CAST(1.0 AS DOUBLE)"
    zero_d = "CAST(0.0 AS DOUBLE)"
    tgt_values = ", ".join(f"('{name}')" for name in sorted(targets))
    return f"""
        WITH per AS (
            SELECT {strata_col},
                   CAST(sum(_real) AS BIGINT) AS n_docs,
                   CAST(sum(_tok) AS BIGINT) AS n_tokens
            FROM (
                SELECT {strata_col}, {token_expr_sql} AS _tok, 1 AS _real
                FROM {table}
                UNION ALL
                SELECT t.{strata_col}, 0 AS _tok, 0 AS _real
                FROM (VALUES {tgt_values}) AS t({strata_col})
            )
            GROUP BY {strata_col}
        )
        SELECT {strata_col}, n_docs, n_tokens,
               {w} AS target_share,
               CASE WHEN {tok_d} > {zero_d}
                    THEN least({one_d}, {desired} / {tok_d})
                    ELSE {zero_d} END AS keep_rate,
               least({desired}, {tok_d}) AS planned_tokens,
               greatest({zero_d}, {desired} - {tok_d}) AS shortfall
        FROM per
    """


def training_shard_budgeted(
    df: DataFrame,
    token_col_expr: Column,
    targets: dict[str, float],
    budget_tokens: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Planner → executor in ONE recipe: run
    :func:`mixture_budget_plan`, execute its per-stratum keep rates as
    a deterministic hash-threshold draw (the :func:`stratified_sample`
    mechanism), and report realized vs planned token mass per stratum —
    the end-to-end "B tokens at mixture w" contract a training-shard
    build actually ships, not just the rates.

    Output per stratum (corpus strata ∪ target strata): ``target_share``,
    ``keep_rate``, ``planned_tokens``, ``realized_docs``,
    ``realized_tokens``. The hash draw is Bernoulli per document, so
    ``realized_tokens`` tracks ``planned_tokens`` within sampling noise
    (tests pin the tolerance); strata with ``keep_rate`` 0 or absent
    from the corpus report realized 0.

    Scale shape: TWO corpus scans total — the planner's single
    per-stratum hash aggregation (collected: one row per stratum, a
    driver-sized plan by construction, same pattern as the DSIR literal
    count tables), then one scan-side filter + per-stratum hash agg for
    the realized masses. The final plan⋈realized join is
    strata-count-sized on both sides. The collected ``keep_rate``
    doubles are re-literalized bit-exactly, so the draw is reproducible
    engine-to-engine (the DuckDB oracle selects the identical rows).
    """
    plan = mixture_budget_plan(
        df, token_col_expr, targets, budget_tokens, strata_col
    )
    plan_rows = plan.collect()
    rates = {row[strata_col]: float(row["keep_rate"]) for row in plan_rows}

    key = _sample_key(F.col(id_col), salt).cast("double")
    rate: Column = F.lit(0.0)
    # Only non-NULL, non-zero rates enter the WHEN chain: a NULL stratum
    # never matches an equality WHEN (it falls through to the 0.0
    # default, exactly as the oracle's inner join drops it), and a
    # zero-rate branch is identical to that default — skipping both
    # bounds the chain at |targets| instead of |corpus strata| (a
    # high-cardinality strata_col would otherwise build a plan-sized
    # codegen expression) and keeps sorted() off unorderable None keys.
    for stratum, r in sorted(
        (k, v) for k, v in rates.items() if k is not None and v != 0.0
    ):
        rate = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate)
    realized = (
        df.filter(key < rate * F.lit(_TWO_POW_60))
        .select(F.col(strata_col), token_col_expr.alias("_tok"))
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("realized_docs"),
            F.sum("_tok").alias("realized_tokens"),
        )
    )
    plan_lit = df.sparkSession.createDataFrame(plan_rows, plan.schema)
    return (
        plan_lit.join(F.broadcast(realized), strata_col, "left")
        .select(
            strata_col,
            "target_share",
            "keep_rate",
            "planned_tokens",
            F.coalesce(F.col("realized_docs"), F.lit(0).cast("long")).alias(
                "realized_docs"
            ),
            F.coalesce(
                F.col("realized_tokens"), F.lit(0).cast("long")
            ).alias("realized_tokens"),
        )
    )


def training_shard_budgeted_oracle(
    token_expr_sql: str,
    targets: dict[str, float],
    budget_tokens: int,
    table: str = "documents",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> str:
    """DuckDB mirror of :func:`training_shard_budgeted`: embeds
    :func:`mixture_budget_plan_oracle` as the plan CTE (identical
    double arithmetic → identical keep-rate bits), replays the same
    md5 hash-threshold draw, and left-joins realized masses back onto
    the plan."""
    plan_sql = mixture_budget_plan_oracle(
        token_expr_sql, targets, budget_tokens, table, strata_col
    )
    key = sample_key_sql(f"d.{id_col}", salt)
    return f"""
        WITH plan AS (
            SELECT {strata_col}, target_share, keep_rate, planned_tokens
            FROM ({plan_sql})
        ),
        sampled AS (
            SELECT d.{strata_col} AS {strata_col},
                   {token_expr_sql} AS _tok
            FROM {table} d JOIN plan p ON d.{strata_col} = p.{strata_col}
            WHERE CAST({key} AS DOUBLE) < p.keep_rate * {_TWO_POW_60!r}
        ),
        realized AS (
            SELECT {strata_col},
                   count(*) AS realized_docs,
                   CAST(sum(_tok) AS BIGINT) AS realized_tokens
            FROM sampled GROUP BY {strata_col}
        )
        SELECT p.{strata_col}, p.target_share, p.keep_rate,
               p.planned_tokens,
               COALESCE(r.realized_docs, CAST(0 AS BIGINT))
                   AS realized_docs,
               COALESCE(r.realized_tokens, CAST(0 AS BIGINT))
                   AS realized_tokens
        FROM plan p LEFT JOIN realized r ON p.{strata_col} = r.{strata_col}
    """
