"""Hashed linear text classifier INFERENCE — the fastText-style quality
filter every production curation pipeline runs over the raw corpus
(CCNet's fastText language/quality models, the FineWeb/DCLM quality
classifiers): featurize each document into hashed token buckets, score
it as the sum of a fixed weight vector over those buckets, and gate on
a threshold. North-star extension; builds on the reference's tokenizer
surface (WordCount.java:106-122) like the rest of the text family.

This module is the INFERENCE face only — training the weights is an
offline job (fastText/SGD on labeled data) whose output is a plain
``dim``-sized integer vector. What matters at 100 TB is applying it:

* **scan-local, zero shuffle**: bucket = ``hash60(token) mod dim``,
  weight lookup, and the per-document sum are all higher-order column
  functions (``transform`` + ``aggregate``) inside whole-stage codegen.
  The plan is Scan → Project. No Python, no exchange, no join: scoring
  100 TB costs exactly one pass over the text column.
* **weights broadcast as a literal**: a ``dim``-sized int vector is a
  few KB — it rides the serialized plan (Catalyst constant-folds the
  ``array()`` literal), the same way a broadcast-hash-join ships a dim
  table. ``weights=None`` derives the vector arithmetically from the
  bucket id (a deterministic stand-in for a trained model, so the
  pipeline is runnable and oracle-checkable without a model artifact —
  swap in the real trained vector in production).
* **integer-exact**: weights are integers and the score is an int64
  sum, so the DuckDB oracle reproduces every score bit-for-bit (the
  same hash-stability contract as the dedup family; md5-based
  ``_hash60`` is mirrored by ``duckdb_hash60_sql``).

Keep semantics: ``keep`` ⇔ ``score_num · keep_denom > n_toks ·
keep_num`` — "mean token weight above ``keep_num/keep_denom``" in pure
cross-engine int arithmetic (empty documents score 0 and are dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _hash60, _words_sql

#: Default feature-hash dimensionality. Real fastText quality models
#: use 1e5–1e7 buckets; 512 keeps the demo weight vector readable while
#: exercising the identical plan shape (the literal just gets longer).
DEFAULT_DIM = 512

#: Knuth multiplicative constant — the arithmetic stand-in weights are
#: ``((b+1)·K) mod 100003 mod 17 − 8`` ∈ [−8, 8], a deterministic
#: pseudo-random int per bucket either engine derives identically.
_KNUTH = 2654435761
_W_PRIME = 100003
_W_RANGE = 17
_W_SHIFT = 8


def synthetic_weights(dim: int) -> list[int]:
    """The arithmetic stand-in weight vector (see module docstring) —
    exposed so tests and the DuckDB oracle can materialize the same
    vector a trained model would replace."""
    return [
        ((b + 1) * _KNUTH) % _W_PRIME % _W_RANGE - _W_SHIFT
        for b in range(dim)
    ]


def _bucket_sql(tok_expr: str, dim: int) -> str:
    """Spark SQL: md5-60-bit hash of a token reduced to a bucket id.
    The hash is always non-negative (< 2^60), so plain ``%`` matches
    DuckDB."""
    return (
        f"cast(conv(substring(md5({tok_expr}), 1, 15), 16, 10) "
        f"as bigint) % {dim}"
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = DEFAULT_DIM,
    weights: list[int] | None = None,
    keep_num: int = 1,
    keep_denom: int = 4,
) -> DataFrame:
    """``(doc_id, n_toks, score_num, keep)`` — hashed-bag-of-words
    linear score per document, exact int64.

    ``weights`` is the trained ``dim``-sized integer vector (broadcast
    as a plan literal); ``None`` uses :func:`synthetic_weights`. A
    document is kept when its MEAN token weight exceeds
    ``keep_num/keep_denom``: ``score_num · keep_denom > n_toks ·
    keep_num`` (int-exact; empty docs have score 0 and fail the strict
    inequality).
    """
    if weights is not None and len(weights) != dim:
        raise ValueError(
            f"weights has {len(weights)} entries, dim is {dim}"
        )
    if weights is None:
        # Arithmetic lookup: no table at all — weight derived from the
        # bucket id inline (still whole-stage codegen).
        w_of_b = (
            f"(b + 1) * {_KNUTH}L % {_W_PRIME} % {_W_RANGE} - {_W_SHIFT}"
        )
        score = (
            f"aggregate(transform({_words_sql(text_col)}, "
            f"t -> {_bucket_sql('t', dim)}), 0L, "
            f"(acc, b) -> acc + ({w_of_b}))"
        )
        score_col = F.expr(score)
    else:
        warr = F.array(*[F.lit(int(w)) for w in weights])
        toks = F.expr(
            f"transform({_words_sql(text_col)}, "
            f"t -> cast({_bucket_sql('t', dim)} as int))"
        )
        score_col = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at(warr, b + 1).cast("long"),
        )
    n_toks = F.size(F.expr(_words_sql(text_col))).cast("long")
    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_toks.alias("n_toks"),
        score_col.alias("score_num"),
    )
    return out.withColumn(
        "keep",
        F.col("score_num") * F.lit(int(keep_denom))
        > F.col("n_toks") * F.lit(int(keep_num)),
    )


def classifier_oracle_sql(
    dim: int = DEFAULT_DIM, keep_num: int = 1, keep_denom: int = 4
) -> str:
    """DuckDB mirror of :func:`hashed_linear_score` with the synthetic
    weight vector — same md5 bucket, same arithmetic weight, same
    int-exact keep gate."""
    bucket = "(('0x' || substr(md5(t), 1, 15))::BIGINT % {dim})".format(
        dim=dim
    )
    w_of_b = (
        f"(({bucket} + 1) * {_KNUTH}) % {_W_PRIME} % {_W_RANGE}"
        f" - {_W_SHIFT}"
    )
    return f"""
        WITH w AS (SELECT doc_id,
                          list_filter(regexp_split_to_array(lower(text),
                                                            '\\W+'),
                                      x -> length(x) > 0) AS ws
                   FROM documents)
        SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_toks,
               CAST(COALESCE(list_sum(list_transform(ws,
                                                     t -> {w_of_b})),
                             0) AS BIGINT) AS score_num,
               CAST(COALESCE(list_sum(list_transform(ws,
                                                     t -> {w_of_b})),
                             0) AS BIGINT) * {keep_denom}
               > CAST(len(ws) AS BIGINT) * {keep_num} AS keep
        FROM w"""
