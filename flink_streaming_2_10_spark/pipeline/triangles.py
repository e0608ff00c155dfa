"""Token co-occurrence graph + exact triangle counting (north-star
extension: corpus-structure analysis — triangle-dense neighborhoods in
the co-occurrence graph are the phrase/topic cliques collocation
mining surfaces one edge at a time; reference parity: graph analytics
generalises the reference's pair-stream topology examples, pom.xml
IterateExample family).

Two stages, cleanly split so the graph op is reusable on ANY edge
table (near-dup pairs from ``pipeline.dedup``, similarity pairs from
``pipeline.similarity``):

* :func:`cooccurrence_edges` — adjacency bigrams of the lowercased
  ``\\w+`` token stream, per-document distinct, unordered
  (``least/greatest``) with self-loops dropped, then document-frequency
  counted and pruned at ``min_df``. Corpus-scale cost: the shingling is
  a narrow map (one HOF pass per doc, same shape as
  ``dedup._shingles``); the count is ONE hash agg with map-side
  partials keyed on word pairs; everything downstream is
  VOCABULARY²-bounded and min_df-pruned — tiny.

* :func:`triangle_counts` — exact per-node triangle counts by the
  classic ordered-edge (compact-forward) join: edges stored once with
  ``a < b``, triangles enumerated exactly once as a<b<c via
  E(a,b) ⋈ E(b,c) ⋈ E(a,c). No node ever appears on the build side
  of a join keyed by itself twice, so the join tree is the standard
  MapReduce triangle plan; on the pruned co-occurrence graph both
  sides are vocabulary-sized (AQE broadcasts them in practice). The
  top-k cut is (triangles DESC, token ASC) via TakeOrderedAndProject.

At 100 TB: the only corpus-scale term is the one bigram aggregation;
the graph (and therefore all three joins) lives at vocabulary scale.
For billion-node NON-lexical graphs you would re-partition the edge
list by ``a`` and bucket-sort — the operator keeps that path open by
never assuming the edge table is broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_edges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
) -> DataFrame:
    """``(a, b, edge_df)`` — unordered adjacent-token pairs (a < b),
    per-document distinct, kept when shared by ≥ ``min_df`` docs."""
    from flink_streaming_2_10_spark.pipeline.dedup import _words_sql

    ws = df.select(
        F.col(id_col).alias("__id"),
        F.expr(_words_sql(text_col)).alias("__ws"),
    )
    pair_arr = (
        "array_distinct(filter(transform("
        "CASE WHEN size(__ws) >= 2 THEN sequence(0, size(__ws) - 2) "
        "ELSE cast(array() as array<int>) END, "
        "i -> struct(least(__ws[i], __ws[i+1]) AS a, "
        "greatest(__ws[i], __ws[i+1]) AS b)), p -> p.a <> p.b))"
    )
    return (
        ws.select("__id", F.explode(F.expr(pair_arr)).alias("p"))
        .groupBy(F.col("p")["a"].alias("a"), F.col("p")["b"].alias("b"))
        .agg(F.count(F.lit(1)).alias("edge_df"))
        .filter(F.col("edge_df") >= min_df)
    )


def triangle_counts(
    edges: DataFrame, k: int = 50, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Top-``k`` nodes by exact triangle participation ``(token,
    triangles)`` from an undirected edge table already stored once per
    edge with ``a < b`` (as :func:`cooccurrence_edges` emits).

    Each triangle a<b<c is enumerated exactly once and credits all
    three corners; the cut is total-ordered (triangles DESC, token
    ASC). Wedge check + closure are two equi-joins — no cross join.
    """
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
        .select("a", "b", "c")
    )
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "token"
            )
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("triangles"))
        .orderBy(F.col("triangles").desc(), F.col("token").asc())
        .limit(k)
    )


def triangles_oracle_sql(min_df: int = 2, k: int = 50) -> str:
    """DuckDB mirror of ``triangle_counts(cooccurrence_edges(documents))``
    — same tokenisation, same per-doc distinct unordered pairs, same
    ordered-edge enumeration and (triangles DESC, token ASC) cut."""
    return f"""
        WITH ws AS (SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(text),
                                                             '\\W+'),
                                       w -> length(w) > 0) AS t
                    FROM documents),
        pairs AS (SELECT DISTINCT doc_id,
                         least(t[i], t[i + 1]) AS a,
                         greatest(t[i], t[i + 1]) AS b
                  FROM ws, unnest(range(1, len(t))) AS r(i)
                  WHERE t[i] <> t[i + 1]),
        edges AS (SELECT a, b FROM pairs
                  GROUP BY a, b HAVING COUNT(*) >= {int(min_df)}),
        tri AS (SELECT e1.a, e1.b, e2.b AS c
                FROM edges e1
                JOIN edges e2 ON e2.a = e1.b
                JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b)
        SELECT u.token, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM tri, unnest([tri.a, tri.b, tri.c]) AS u(token)
        GROUP BY u.token
        ORDER BY triangles DESC, token ASC
        LIMIT {int(k)}"""


def kcore_nodes(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Fixed-round k-core peel over an undirected edge list: ``rounds``
    iterations of "drop every node with degree < k (and its edges)",
    then emit the surviving ``(token, degree)`` rows with degree ≥ k —
    the dense collocation core that survives when weak phrase fringe is
    peeled away (triangles find cliques; the k-core finds the dense
    component they live in).

    Determinism contract: BOTH this operator and the DuckDB oracle run
    EXACTLY ``rounds`` peels (the textrank fixed-round convention), so
    the outputs agree even on a graph that hasn't converged; peeling is
    confluent, so a converged run equals the true k-core regardless of
    round count.

    Scale shape: everything is vocabulary-sized — each round is one
    degree aggregation + two anti-joins of the dropped node set against
    the edge list; the corpus is touched ONCE by the edge builder (the
    symmetric list is materialized up front). Each round's survivor set
    is lineage-truncated via ``localCheckpoint`` — every round
    references its input twice (degrees + anti-join source), so a lazy
    chain would double the plan per round (2^rounds blowup; measured
    1.6 s → 6.2 s from rounds 2 → 4 before truncation) — the same
    per-round truncation discipline as ``operators/iterate.py``.
    """
    sym = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(
            edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .localCheckpoint()
    )
    for _ in range(int(rounds)):
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        bad = deg.filter(F.col("deg") < int(k)).select("u")
        sym = (
            sym.join(bad, "u", "left_anti")
            .join(bad.withColumnRenamed("u", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint()
        )
    final = sym.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    return final.filter(F.col("degree") >= int(k)).select(
        F.col("u").alias("token"), F.col("degree")
    )


def kcore_oracle_sql(min_df: int = 2, k: int = 3, rounds: int = 8) -> str:
    """DuckDB mirror of ``kcore_nodes(cooccurrence_edges(documents))``:
    the same edge CTE as the triangles oracle, then exactly ``rounds``
    unrolled peel CTEs."""
    parts = [
        f"""ws AS (SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(text),
                                                             '\\W+'),
                                       w -> length(w) > 0) AS t
                    FROM documents),
        pairs AS (SELECT DISTINCT doc_id,
                         least(t[i], t[i + 1]) AS a,
                         greatest(t[i], t[i + 1]) AS b
                  FROM ws, unnest(range(1, len(t))) AS r(i)
                  WHERE t[i] <> t[i + 1]),
        eb AS (SELECT a, b FROM pairs
               GROUP BY a, b HAVING COUNT(*) >= {int(min_df)}),
        s0 AS MATERIALIZED (SELECT a AS u, b AS v FROM eb
               UNION ALL SELECT b, a FROM eb)"""
    ]
    prev = "s0"
    for r in range(int(rounds)):
        parts.append(
            f"""bad{r} AS MATERIALIZED (SELECT u FROM {prev}
                   GROUP BY u HAVING COUNT(*) < {int(k)}),
        s{r + 1} AS MATERIALIZED (SELECT s.u, s.v FROM {prev} s
                   WHERE s.u NOT IN (SELECT u FROM bad{r})
                     AND s.v NOT IN (SELECT u FROM bad{r}))"""
        )
        prev = f"s{r + 1}"
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"""
        SELECT u AS token, CAST(COUNT(*) AS BIGINT) AS degree
        FROM {prev} GROUP BY u HAVING COUNT(*) >= {int(k)}"""
    )
