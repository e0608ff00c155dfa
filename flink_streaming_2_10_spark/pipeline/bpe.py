"""Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
training job every LLM data pipeline runs before anything else
(Sennrich et al. 2016; the GPT-2/Llama tokenizer family). North-star
extension; builds on the reference's tokenizer surface
(WordCount.java:106-122) the way the rest of the text family does.

The 100 TB insight: BPE never trains on the corpus — it trains on the
**word-count table**. The ONLY corpus-scale operation is one
tokenize-and-count aggregation (map-side partials, one shuffle of
(word, partial-count) pairs); from then on every pass runs over the
distinct-word table exploded to per-character symbols — vocabulary-
sized (≈ |vocab| · avg word length rows), independent of corpus bytes.
A 100 TB corpus and a 1 GB corpus with the same vocabulary train at
the same per-round cost.

Merge semantics are the standard greedy left-to-right application:
each round finds the globally most frequent adjacent symbol pair
(count-weighted by word frequency; ties break (pair_count DESC, left
ASC, right ASC) — deterministic cross-engine, binary string order both
sides) and merges its NON-OVERLAPPING occurrences scanning left to
right. Overlap only arises when left == right (runs like "aaaa" under
merge (a,a) → (aa)(aa), not (aa)(a)(a) or overlapping); the
relational formulation below gets greedy-left exactly right via a
gaps-and-islands parity argument:

- ``match(i)`` = (sym_i, sym_{i+1}) == (l, r). Consecutive match
  positions force l == r (a run of the same symbol), so maximal runs
  of consecutive matches ("islands") are exactly the ambiguous spots.
- Greedy-left takes the 1st, 3rd, 5th … match of each island — i.e.
  ``keep(i) = match(i) AND (i - island_start) % 2 == 0`` — and
  position i+1 is consumed iff ``keep(i)``. Everything is plain
  window algebra (lead, running sum, min-over-island, lag), identical
  in Spark and DuckDB, so the whole training loop is oracle-checkable
  round for round (the DuckDB oracle unrolls rounds as CTE blocks, the
  ``pagerank_fixed`` pattern).

Why windows and not a per-word fold UDF: the window formulation stays
in whole-stage codegen on vocabulary-sized data and is engine-portable;
a fold is Python-per-row and has no DuckDB mirror.

Scale notes: each round is (a) one lead() window pass + a pair-count
hash agg + a 1-row argmax collect (the per-round driver scalar — same
budget as ``graph.py``'s convergence probe), (b) three window passes to
apply the merge, all partitioned by word (perfectly parallel, bounded
rows per word), then a lineage truncation (``localCheckpoint`` locally;
on a real cluster pass ``checkpoint_dir`` for durable parquet rounds,
the ``iterate()`` convention). Rounds are inherently sequential — that
is BPE. Production trainers with 30k+ merges either run exactly this
loop (the word table is already aggregated; 30k vocab-sized passes is
hours, not days) or collect the word-count table to one node once it
fits (it always does after the corpus-scale agg — the standard
single-node shortcut this module deliberately does NOT take, so the
vocabulary itself never has to fit anywhere).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Row, SparkSession, Window, functions as F

from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

#: Schema of the merge table returned by :func:`train_bpe_merges`.
MERGE_SCHEMA = (
    "merge_rank BIGINT, left_sym STRING, right_sym STRING, "
    "pair_count BIGINT"
)


def word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(word, cnt)`` — the corpus word-frequency table, the ONE
    corpus-scale step of BPE training (hash agg with map-side
    partials; the shuffle moves (word, partial count), never text)."""
    toks = df.select(F.explode(F.expr(_words_sql(text_col))).alias("word"))
    return toks.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def _char_symbols(wc: DataFrame) -> DataFrame:
    """Explode ``(word, cnt)`` into ``(word, cnt, pos, sym)`` with one
    row per character, 1-based ``pos``. substring-per-index (not
    split-on-empty, whose boundary rows differ across engines)."""
    return wc.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(word)), "
                "i -> substring(word, i, 1))"
            )
        ).alias("p0", "sym"),
    ).select("word", "cnt", (F.col("p0") + 1).cast("long").alias("pos"), "sym")


def _apply_merge(s: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every greedy-left occurrence of adjacent (left, right) in
    the symbol table ``s`` (word, cnt, pos, sym) → same shape,
    positions re-ranked dense. Pure window algebra — see module
    docstring for the islands-parity correctness argument."""
    w = Window.partitionBy("word").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m = (
        s.withColumn("__nxt", F.lead("sym").over(w))
        .withColumn(
            "__mt",
            F.coalesce(
                (F.col("sym") == F.lit(left))
                & (F.col("__nxt") == F.lit(right)),
                F.lit(False),
            ),
        )
        .withColumn("__cum", F.sum(F.col("__mt").cast("long")).over(run))
        .withColumn(
            "__isl", F.when(F.col("__mt"), F.col("pos") - F.col("__cum"))
        )
    )
    isl_start = F.min(F.when(F.col("__mt"), F.col("pos"))).over(
        Window.partitionBy("word", "__isl")
    )
    m = m.withColumn(
        "__keep",
        F.col("__mt") & (((F.col("pos") - isl_start) % 2) == 0),
    ).withColumn(
        "__consumed", F.coalesce(F.lag("__keep").over(w), F.lit(False))
    )
    return (
        m.filter(F.col("__keep") | ~F.col("__consumed"))
        .select(
            "word",
            "cnt",
            F.row_number().over(w).cast("long").alias("pos"),
            F.when(
                F.col("__keep"), F.lit(left + right)
            ).otherwise(F.col("sym")).alias("sym"),
        )
    )


def train_bpe_merges(
    wc: DataFrame,
    n_merges: int,
    min_pair_count: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the word-count table ``wc``
    (``(word, cnt)``); returns the merge table ``(merge_rank, left_sym,
    right_sym, pair_count)`` — ``merge_rank`` 1-based in learn order.

    Stops early (fewer rows) if no adjacent pair reaches
    ``min_pair_count`` — only possible once every word is a single
    symbol or the corpus is near-empty; any real corpus sustains far
    more rounds than a query asks for. The per-round argmax is a 1-row
    collect (the driver-scalar budget of ``graph.py``); each round's
    state is lineage-truncated so plans stay round-sized.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    spark: SparkSession = wc.sparkSession
    # Lazy checkpoints: each round's 1-row argmax collect is the
    # materializing action for the round's state (the iterate() trick —
    # operators/iterate.py), so a round costs ONE job instead of two
    # (eager checkpoint + argmax). The plan is truncated at checkpoint
    # call time either way; only the job count changes.
    state = _char_symbols(wc).localCheckpoint(eager=False)
    merges: list[Row] = []
    w = Window.partitionBy("word").orderBy("pos")
    for rank in range(1, n_merges + 1):
        pairs = (
            state.withColumn("__nxt", F.lead("sym").over(w))
            .filter(F.col("__nxt").isNotNull())
            .groupBy("sym", "__nxt")
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(
            F.col("c").desc(), F.col("sym").asc(), F.col("__nxt").asc()
        ).limit(1).collect()
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right, c = best[0]["sym"], best[0]["__nxt"], int(best[0]["c"])
        merges.append(
            Row(
                merge_rank=rank,
                left_sym=left,
                right_sym=right,
                pair_count=c,
            )
        )
        state = _apply_merge(state, left, right).localCheckpoint(eager=False)
    if stats is not None:
        stats["rounds"] = len(merges)
    return spark.createDataFrame(merges, schema=MERGE_SCHEMA)


def segment_words(wc: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list (in rank order) to the word table:
    ``(word, cnt, pieces array<string>)`` — the tokenizer-application
    face, REFERENCE version. Same window machinery as training;
    ``len(merges)`` passes over the vocabulary-sized symbol table —
    exact and oracle-mirrorable, but a 30k-merge production table means
    30k sequential passes. For the inference path use
    :func:`segment_words_greedy` (scan-local, one pass), which this
    face exists to verify (``tests/test_bpe.py`` parity)."""
    state = _char_symbols(wc)
    for i, (left, right) in enumerate(merges):
        state = _apply_merge(state, left, right)
        # Truncate every few passes: plans grow ~5 windows per merge.
        if (i + 1) % 4 == 0:
            state = state.localCheckpoint(eager=True)
    return state.groupBy("word", "cnt").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, sym))), "
            "x -> x.sym)"
        ).alias("pieces")
    )


def segment_words_greedy(
    wc: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """``(word, cnt, pieces array<string>)`` — the SCAN-LOCAL tokenizer-
    application face: the standard lowest-rank-adjacent-pair loop every
    production BPE tokenizer runs (GPT-2's ``bpe()``), as one Arrow-
    batched pandas UDF with the rank table broadcast.

    Equivalence to :func:`segment_words` (rank-ordered global passes):
    by induction on applied rules. Both apply each matching rule
    greedy-left; applying rule k creates only adjacencies involving the
    new symbol ``l+r``, and any rule consuming ``l+r`` was necessarily
    TRAINED after the round that created ``l+r`` as a symbol, so it
    carries a HIGHER rank — a later merge can never create a pair an
    earlier (lower-rank) rule matches. Hence "apply rules in rank
    order, once each" and "repeatedly apply the lowest-rank pair
    present" pick the same rule sequence per word. (Precondition:
    ``merges`` comes from rank-ordered training — every rule's sides
    exist as symbols before the rule, which ``train_bpe_merges``
    guarantees. An adversarial hand-built table, e.g. rank 1
    ``(ab, c)`` with rank 2 ``(a, b)``, can violate it; real merge
    tables cannot.) Pinned by the parity tests in ``tests/test_bpe.py``
    on both planted and corpus-trained tables.

    100 TB shape: one narrow scan of the word table; the per-task state
    is the O(|merges|) rank dict (~1 MB of broadcast state for a
    30k-merge table, shipped once per executor); no shuffle at all —
    the Catalyst plan is Scan → ArrowEvalPython → project. Python-per-
    word is justified exactly here: the loop is data-dependent per word
    (no fixed-depth column expression exists), and the vectorized
    alternative (the training face) costs ``len(merges)`` window passes.
    """
    # NB: pandas is imported at module level — pandas_udf resolves the
    # string annotations (PEP 563 is in force module-wide) against the
    # function's __globals__, so "pd" must exist there.
    from pyspark.sql.types import ArrayType, StringType

    spark = wc.sparkSession
    ranks_bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    @F.pandas_udf(ArrayType(StringType()))
    def bpe_pieces(words: pd.Series) -> pd.Series:
        ranks = ranks_bc.value

        def encode(word: str) -> list[str]:
            syms = list(word)
            while len(syms) > 1:
                best_rank = None
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best = r, (syms[i], syms[i + 1])
                if best is None:
                    break
                left, right = best
                out: list[str] = []
                i = 0
                # Greedy-left, non-overlapping — same contract as
                # _apply_merge's islands-parity window formulation.
                while i < len(syms):
                    if (
                        i < len(syms) - 1
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return words.map(encode)

    return wc.select("word", "cnt", bpe_pieces(F.col("word")).alias("pieces"))
