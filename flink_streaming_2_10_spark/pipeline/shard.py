"""Training-shard preparation: the composed pipeline a 100 TB corpus
actually runs ahead of tokenization — language gate, quality floor, exact
dedup, per-survivor token budget — as ONE Spark job with one shuffle.

Composition shape (the point of the module):

* a single narrow projection computes language prediction, quality score,
  token counts, and the dedup fingerprint from one pass over ``text`` —
  all built-in column expressions shared with ``pipeline/textstats.py``
  (``quality_exprs`` / ``language_pred_expr``), full codegen, no Python;
* the language/quality FILTER runs scan-side, before any exchange, so
  rejected documents never shuffle;
* the only shuffle is the dedup ``groupBy`` on the 32-byte md5
  fingerprint, carrying (id, two ints, a double) per row — never the
  document body;
* survivor stats ride along via ``min_by(col, id)`` aggregates (primitive
  buffers → hash aggregate with map-side partials), so no join-back to
  the corpus is needed.

Everything is deterministic and mirrored field-for-field in the DuckDB
oracle (``__spark_entry__._training_shard_oracle``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_streaming_2_10_spark.pipeline.textstats import (
    BPE_PATTERN,
    NONSPACE_RUN_PATTERN,
    language_pred_expr,
    quality_exprs,
)


def prepare_training_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality: float = 0.5,
) -> DataFrame:
    """Filter to ``lang`` documents with quality ≥ ``min_quality``,
    exact-dedup on normalized text (min-id survivor), and emit each
    survivor's token budget.

    Returns ``(doc_id, n_dups, ws_tokens, bpe_tokens, quality)`` — the
    manifest a downstream tokenizer shards on.
    """
    text = F.col(text_col)
    ws_tokens = F.regexp_count(text, F.lit(NONSPACE_RUN_PATTERN))
    proj = df.select(
        F.col(id_col),
        language_pred_expr(text).alias("lang_pred"),
        quality_exprs(text)["quality"].alias("quality"),
        ws_tokens.alias("ws_tokens"),
        F.regexp_count(text, F.lit(BPE_PATTERN)).alias("bpe_tokens"),
        F.md5(F.regexp_replace(F.lower(text), r"\s+", " ")).alias("fp"),
    )
    kept = proj.filter(
        (F.col("lang_pred") == lang) & (F.col("quality") >= F.lit(min_quality))
    )
    return (
        kept.groupBy("fp")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_dups"),
            F.min_by("ws_tokens", F.col(id_col)).alias("ws_tokens"),
            F.min_by("bpe_tokens", F.col(id_col)).alias("bpe_tokens"),
            F.min_by("quality", F.col(id_col)).alias("quality"),
        )
        .select(id_col, "n_dups", "ws_tokens", "bpe_tokens", "quality")
    )
