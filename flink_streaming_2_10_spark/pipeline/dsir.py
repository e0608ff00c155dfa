"""DSIR-style importance scoring — hashed n-gram domain-affinity
weights for targeted data selection (north-star extension; same
tokenizer lineage as the text family, reference WordCount.java:106-122).

The published method this reproduces: Data Selection via Importance
Resampling (Xie et al. 2023) — estimate, for every raw document, how
much its hashed n-gram distribution looks like a TARGET domain
(Wikipedia-quality text, a language, an in-house eval set) relative to
the raw corpus, then upsample high-ratio documents. The estimator
hashes n-grams into a FIXED number of buckets so both "models" are
bounded-size count tables no matter how large the corpus — that is
what makes the method (and this implementation) viable at 100 TB.

Why no logarithms: DSIR's importance weight is Σ log(p_target/p_raw),
and ``ln`` differs in the last ulp across math libraries — the same
cross-engine hazard ``lm.py`` documents. The score here is the MEAN
BUCKET-COUNT RATIO instead: score = (Σᵢ (c_t(bᵢ)+1)/(c_r(bᵢ)+1)) / n
over the document's gram positions i, each term ONE division of two
exact longs (add-one smoothing keeps unseen buckets finite), summed in
FIXED position order. Monotone in the same direction as the DSIR
weight (grams common in the target and rare in the raw corpus push it
up), bit-identical doubles in any engine.

Scale shape (the part that matters at 100 TB):

1. the two count tables are hash aggregations whose OUTPUT is at most
   ``num_buckets`` rows (one shuffle each, 8-byte keys, map-side
   partials) — corpus-size-independent by construction;
2. each collapses to a ONE-ROW map literal that broadcast-cross-joins
   into the scoring scan (the keyword_search totals-row pattern);
3. scoring is then ENTIRELY scan-local — one pass over the corpus,
   per-row array fold, no posting explode, no doc_id re-aggregation,
   zero corpus-scale shuffles. (Compare lm.py, whose vocabulary-sized
   tables cannot be broadcast and must join postings.)

``hasher="md5"`` makes the DuckDB oracle reproduce the bucket keys
bit-for-bit; xxhash64 is the cheaper production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _words_sql


def _grams_from_ws_sql(ws: str, n: int) -> str:
    """SQL for the n-gram array over an ALREADY-PROJECTED token-array
    column ``ws`` (space-joined adjacent tokens, position order
    preserved). The token array must be projected once in a parent
    select — the repetition_stats pattern — so the tokenizer runs once
    per document, not once per gram access."""
    if n == 1:
        return ws
    parts = " || ' ' || ".join(
        f"{ws}[i + {j}]" if j else f"{ws}[i]" for j in range(n)
    )
    return (
        f"CASE WHEN size({ws}) >= {n} THEN "
        f"transform(sequence(0, size({ws}) - {n}), i -> {parts}) "
        f"ELSE cast(array() as array<string>) END"
    )


def _with_grams(
    df: DataFrame, id_col: str | None, text_col: str, n: int
) -> DataFrame:
    """``(doc_id?, __grams)`` with the token array projected once below
    the gram projection. For PROJECTION consumers only — exploding this
    column is a performance trap (see :func:`_exploded_grams`)."""
    cols = (
        [F.col(id_col).alias("doc_id")] if id_col is not None else []
    )
    base = df.select(
        *cols, F.expr(_words_sql(text_col)).alias("__ws")
    )
    return base.select(
        *(["doc_id"] if id_col is not None else []),
        F.expr(_grams_from_ws_sql("__ws", n)).alias("__grams"),
    )


def _exploded_grams(
    df: DataFrame,
    id_col: str | None,
    text_col: str,
    n: int,
    with_pos: bool = False,
) -> DataFrame:
    """One row per gram occurrence, with the gram expression INLINE as
    the generator over the projected token array — the crossdoc shape.

    Why not ``_with_grams(...).select(explode("__grams"))``: Spark's
    InferFiltersFromGenerate adds ``size(generator input) > 0`` below
    the Generate, and pushing that filter through the gram PROJECTION
    inlines the tokenizer into every ``__ws[i]`` access inside the
    gram-building lambda — O(tokens²) regex splits per document
    (measured: a 0.3 s explode pass became 14 s at sf0.1). With the
    gram expression as the generator itself, the inferred filter lands
    ABOVE the ``__ws`` projection and evaluates the token array once
    per row."""
    ids = [F.col(id_col).alias("doc_id")] if id_col is not None else []
    keep = ["doc_id"] if id_col is not None else []
    base = df.select(*ids, F.expr(_words_sql(text_col)).alias("__ws"))
    gexpr = F.expr(_grams_from_ws_sql("__ws", n))
    if with_pos:
        return base.select(
            *keep, F.posexplode(gexpr).alias("p0", "__g")
        ).select(
            *keep,
            (F.col("p0") + 1).cast("int").alias("pos"),
            F.col("__g"),
        )
    return base.select(*keep, F.explode(gexpr).alias("__g"))


def _bucket_sql(gram_sql: str, num_buckets: int, hasher: str) -> str:
    """SQL for the gram's bucket id under the 60-bit hash (md5 values
    are in [0, 2^60) so pmod == % in every engine)."""
    if hasher == "xxhash64":
        h = f"xxhash64({gram_sql}, 0)"
    elif hasher == "md5":
        h = f"cast(conv(substring(md5({gram_sql}), 1, 15), 16, 10) as bigint)"
    else:
        raise ValueError(f"unknown hasher: {hasher}")
    return f"cast(pmod({h}, {int(num_buckets)}) as int)"


def hashed_gram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 4096,
    hasher: str = "xxhash64",
) -> DataFrame:
    """``(doc_id, pos, bucket)`` — one row per gram position (1-based),
    bucket = hash60(gram) mod num_buckets. The posting face; the
    scorer itself never materializes this for the corpus."""
    return _exploded_grams(df, id_col, text_col, n, with_pos=True).select(
        "doc_id",
        "pos",
        F.expr(_bucket_sql("__g", num_buckets, hasher)).alias("bucket"),
    )


def _bucket_count_map(
    df: DataFrame,
    text_col: str,
    n: int,
    num_buckets: int,
    hasher: str,
    out: str,
) -> DataFrame:
    """ONE-row DataFrame: ``out`` = DENSE array<long> of length
    ``num_buckets`` (index = bucket, 1-based in SQL) over every gram
    occurrence in ``df``, built from one bounded-output hash
    aggregation. Dense array, not a map, deliberately: Spark map
    literals are array-backed, so ``element_at(map, k)`` is a LINEAR
    scan of all B entries — O(B) per gram lookup turned the scoring
    pass quadratic-ish (measured 19 s at sf0.1, B=4096); the dense
    array's positional ``element_at`` is O(1) and the densification
    itself runs once on the one-row side."""
    counts = (
        _exploded_grams(df, None, text_col, n)
        .select(
            F.expr(_bucket_sql("__g", num_buckets, hasher)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dense = (
        f"transform(sequence(0, {int(num_buckets) - 1}), "
        f"i -> coalesce(element_at(__m, i), 0L))"
    )
    return (
        counts.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b"), F.col("c")))
            ).alias("__m")
        )
        .select(F.expr(dense).alias(out))
    )


def _bucket_count_maps_fused(
    df: DataFrame,
    text_col: str,
    target_pred: Column,
    n: int,
    num_buckets: int,
    hasher: str,
) -> DataFrame:
    """ONE-row DataFrame ``(__rmap, __tmap)`` — the raw AND target
    bucket-count arrays from a SINGLE gram pass (guide §1.2: don't scan
    twice what one conditional aggregation can count once).

    Equivalent to ``_bucket_count_map(df, ...)`` +
    ``_bucket_count_map(df.filter(target_pred), ...)`` when the target
    corpus is a predicate-selected subset of ``df`` — which is every
    registry caller (target = the ``lang == 'en'`` slice). The raw
    count is ``count(1)`` per bucket; the target count is
    ``count(CASE WHEN pred THEN 1 END)`` over the SAME exploded rows —
    rows whose predicate is NULL are skipped by ``count``, matching
    ``filter``'s NULL-drops semantics exactly, so both arrays are
    integer-identical to the two-pass form (pinned in test_dsir)."""
    base = df.select(
        target_pred.alias("__is_t"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    grams = base.select(
        "__is_t", F.explode(F.expr(_grams_from_ws_sql("__ws", n))).alias("__g")
    )
    counts = (
        grams.select(
            F.expr(_bucket_sql("__g", num_buckets, hasher)).alias("b"),
            "__is_t",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.count(F.when(F.col("__is_t"), 1)).alias("ct"),
        )
    )

    def dense(m: str) -> str:
        return (
            f"transform(sequence(0, {int(num_buckets) - 1}), "
            f"i -> coalesce(element_at({m}, i), 0L))"
        )

    return (
        counts.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b"), F.col("c")))
            ).alias("__m"),
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b"), F.col("ct")))
            ).alias("__mt"),
        )
        .select(
            F.expr(dense("__m")).alias("__rmap"),
            F.expr(dense("__mt")).alias("__tmap"),
        )
    )


def dsir_model(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 4096,
    hasher: str = "xxhash64",
) -> dict:
    """Train the two bounded count tables and return them as plain
    Python state: ``{"raw": [long]*B, "tgt": [long]*B, ...}``. The
    collect is 2·num_buckets longs — bounded by construction,
    independent of corpus size — which is exactly what makes DSIR's
    model SHIPPABLE: inline it as plan literals and any batch OR
    STREAM can score scan-locally with no join against anything
    (:func:`score_with_dsir_model`)."""
    raw = _bucket_count_map(
        df, text_col, n, num_buckets, hasher, "__m"
    ).collect()[0][0]
    tgt = _bucket_count_map(
        target, text_col, n, num_buckets, hasher, "__m"
    ).collect()[0][0]
    return {
        "raw": list(raw),
        "tgt": list(tgt),
        "n": int(n),
        "num_buckets": int(num_buckets),
        "hasher": hasher,
    }


def score_with_dsir_model(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a trained :func:`dsir_model` with the
    count arrays inlined as PLAN LITERALS — a pure narrow map (no
    joins, no shuffles, no broadcast variables), so the same call
    works on a batch DataFrame and on a streaming one (the streaming
    face of the importance filter; parity pinned in test_dsir). Same
    output contract as :func:`dsir_importance_scores`."""

    def lit_arr(xs: list) -> str:
        return "array(" + ", ".join(f"{int(x)}L" for x in xs) + ")"

    n, B, hasher = model["n"], model["num_buckets"], model["hasher"]
    buckets = F.expr(
        f"transform(__grams, g -> {_bucket_sql('g', B, hasher)})"
    )
    fold = (
        f"aggregate(__buckets, cast(0.0 as double), (acc, b) -> acc + "
        f"cast(element_at({lit_arr(model['tgt'])}, b + 1) + 1L as double) / "
        f"cast(element_at({lit_arr(model['raw'])}, b + 1) + 1L as double))"
    )
    return (
        _with_grams(df, id_col, text_col, n)
        .select("doc_id", buckets.alias("__buckets"))
        .select(
            "doc_id",
            F.size("__buckets").cast("long").alias("n_grams"),
            F.when(
                F.size("__buckets") > 0,
                F.expr(fold) / F.size("__buckets").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dsir_score"),
        )
    )


def importance_resample(
    scored: DataFrame,
    score_col: str = "dsir_score",
    id_col: str = "doc_id",
    scale: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """The resampling step that makes DSIR "importance RESAMPLING":
    keep each row with probability proportional to its score —
    deterministic acceptance sampling, keep iff

        u(id)  <  scale · score / max(score)

    with u(id) a 52-bit md5-derived unit hash (the sampling module's
    key, truncated to 52 bits so its double representation is EXACT).
    Membership depends only on (salt, id, the score column), so re-runs
    and the DuckDB oracle select identical rows; expected sample size
    is scale · Σ score / max(score).

    Scale shape: one 1-row max aggregation broadcast back (the
    keyword_search totals-row pattern), then a scan-local filter —
    no shuffle of the corpus. This is the weighted complement of
    ``sampling.stratified_sample`` (fixed per-stratum rates) and
    ``sampling.priority_sample`` (unweighted fixed-size): here the
    SCORE is the rate.
    """
    from flink_streaming_2_10_spark.pipeline.caching import tracked_persist
    from flink_streaming_2_10_spark.pipeline.sampling import _sample_key

    # `scored` feeds BOTH the 1-row max aggregate and the acceptance
    # filter below; its scoring pipeline is scan-local (no exchange for
    # runtime reuse to dedupe), so without a persist the full gram
    # explode → hash → ratio fold runs twice over the corpus. The scored
    # rows are narrow (id + two numbers) — the guide-§5 trade favors
    # caching them across the two consumers.
    scored = tracked_persist(scored)
    mx = scored.agg(F.max(F.col(score_col)).alias("__mx"))
    # Integer shift, NOT division: key/256 as a double would round the
    # 60-bit key before truncation.
    u = F.shiftright(_sample_key(F.col(id_col), salt), 8)
    # Fixed evaluation order for the rhs double product — mirrored
    # verbatim in the oracle so the comparison is bit-identical.
    rhs = (
        F.col(score_col)
        / F.col("__mx")
        * F.lit(float(scale))
        * F.lit(float(1 << 52))
    )
    return (
        scored.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("__mx") > 0)
            & (u.cast("double") < rhs)
        )
        .drop("__mx")
    )


def dsir_importance_scores(
    df: DataFrame,
    target: DataFrame | None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 4096,
    hasher: str = "xxhash64",
    target_pred: Column | None = None,
) -> DataFrame:
    """``(doc_id, n_grams, dsir_score)`` for every document of ``df``:
    the mean add-one-smoothed target/raw bucket-count ratio over the
    document's gram positions (see module docstring). ``target`` is
    the target-domain document set (usually a filtered subset of
    ``df``, or a separate clean corpus — only its ``text_col`` is
    read). Documents with no grams score 0.0.

    ``target_pred`` is the one-pass fast path for the
    subset-of-``df`` case: pass the predicate COLUMN that selects the
    target slice (e.g. ``F.col("lang") == "en"``) instead of a
    ``target`` frame, and both count tables are built by ONE gram pass
    over ``df`` with a conditional count
    (:func:`_bucket_count_maps_fused`) — identical integer counts,
    one fewer corpus-scale explode+digest pass and one broadcast
    instead of two. Mutually exclusive with ``target``.
    """
    if (target is None) == (target_pred is None):
        raise ValueError("pass exactly one of target / target_pred")
    if target_pred is not None:
        maps = [
            F.broadcast(
                _bucket_count_maps_fused(
                    df, text_col, target_pred, n, num_buckets, hasher
                )
            )
        ]
    else:
        maps = [
            F.broadcast(
                _bucket_count_map(df, text_col, n, num_buckets, hasher, "__rmap")
            ),
            F.broadcast(
                _bucket_count_map(
                    target, text_col, n, num_buckets, hasher, "__tmap"
                )
            ),
        ]
    # Buckets are hashed ONCE per gram into an int array; the fold then
    # costs two map lookups + one division per element (hashing inside
    # the fold would digest every gram twice).
    buckets = F.expr(
        f"transform(__grams, g -> {_bucket_sql('g', num_buckets, hasher)})"
    )
    ratio_fold = (
        "aggregate(__buckets, cast(0.0 as double), (acc, b) -> acc + "
        "cast(element_at(__tmap, b + 1) + 1L as double) / "
        "cast(element_at(__rmap, b + 1) + 1L as double))"
    )
    scored = _with_grams(df, id_col, text_col, n).select(
        "doc_id", buckets.alias("__buckets")
    )
    for m in maps:
        scored = scored.crossJoin(m)
    return (
        scored
        .select(
            "doc_id",
            F.size("__buckets").cast("long").alias("n_grams"),
            F.when(
                F.size("__buckets") > 0,
                F.expr(ratio_fold)
                / F.size("__buckets").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dsir_score"),
        )
    )
