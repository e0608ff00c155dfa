"""Fixed-point k-means over embedding columns — Lloyd's iterations with
EXACT cross-engine arithmetic (north-star extension: topic-style corpus
clustering, the grouping face of the similarity family).

Why fixed-point: textbook k-means is float means + float distances, and
neither survives a value-hash comparison across engines (partial-sum
order, last-ulp division). Here everything after one deterministic
quantization is integer or floor-exact:

* points quantize once: ``q_i = round(x_i · SCALE)`` as longs (the same
  half-up convention as ``functions/money.py``);
* distances are exact integer ``Σ (q_i − c_i)²``;
* assignment is argmin with a smallest-cluster-id tie-break (a struct
  min — total order, no float comparison);
* centroid updates are ``floor(sum / count)`` per component, computed
  with Python INTEGER floor division (``s // n``, exact at any
  magnitude — a double quotient would be correctly rounded but its
  floor can be off by one once |s| crosses 2⁵³, which 100 TB-scale
  component sums can); empty clusters keep their previous centroid;
* initialization is the k lowest-id vectors; round count is FIXED
  (no convergence test), so an oracle can unroll the same rounds.

Scale shape (the MLlib KMeans shape): centroids are DRIVER state by
design — k·dim longs per round, bounded and tiny — so each round is ONE
corpus scan (assignment as a literal expression — no join, no shuffle
of points) plus one k-group aggregation with map-side partials. At
100 TB that is rounds × (scan + k×dim-cell agg); points never move.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Fixed-point scale: testdata embeddings are unit-ish (|x| < 1), so
#: SCALE=10⁴ keeps per-component diffs < ~2·10⁴ and the 64-dim squared
#: distance < ~10¹⁰ — exact in longs with huge headroom.
SCALE = 10_000


def quantize_fixed(df: DataFrame, vec_col: str = "embedding") -> Column:
    """``floor(x · SCALE + 0.5)`` per component (half-up — the same
    convention as ``similarity.quantize_embeddings``), as an
    ``array<long>``. The float components are cast to double FIRST so
    the product is a double product in every engine (float×int lane
    width is engine-dependent; double is the determinism contract).
    ``df`` is accepted only for symmetry with the callers — the
    expression references the column by name."""
    del df
    return F.expr(
        f"transform(`{vec_col}`, x -> "
        f"cast(floor(cast(x as double) * {SCALE}.0D + 0.5D) as long))"
    )


def _dist2(q_col: str, centroid: list[int]) -> Column:
    lits = ", ".join(str(v) for v in centroid)
    return F.expr(
        f"aggregate(zip_with({q_col}, array({lits}L), "
        f"(x, y) -> (x - y) * (x - y)), 0L, (a, v) -> a + v)"
    )


def _assign(q_col: str, centroids: list[list[int]]) -> Column:
    """argmin over the centroid literals — struct min gives the exact
    (distance, cluster-id) total order, so ties break on the id."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _dist2(q_col, c).alias("d"),
                    F.lit(j).alias("j"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )


def kmeans_fixed_point(
    df: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cluster, dist2)`` after ``rounds`` Lloyd iterations.

    ``dist2`` is the exact quantized squared distance to the point's
    final centroid — the within-cluster tightness signal. Driver state
    is k·dim longs (the centroids); every other byte stays distributed.
    """
    from flink_streaming_2_10_spark.pipeline.caching import tracked_persist

    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    # Persisted: every round's assignment scan and the final output read
    # the same quantized projection (released by the caller via
    # pipeline.caching.release_cached, as with the dedup intermediates).
    pts = tracked_persist(
        df.select(
            F.col(id_col).alias("vec_id"), quantize_fixed(df, vec_col).alias("q")
        )
    )
    # Deterministic init: the k lowest-id vectors. A corpus with fewer
    # than k vectors initializes min(k, n) centroids — exactly the
    # oracle's `WHERE row_number - 1 < k` init CTE — and an EMPTY
    # corpus yields zero rows (the r17 degenerate-input sweep found the
    # previous `k exceeds corpus size` raise diverging from the
    # oracle's well-defined result on both slices).
    init = pts.orderBy("vec_id").limit(k).collect()
    if not init:
        return pts.select(
            "vec_id",
            F.lit(None).cast("int").alias("cluster"),
            F.lit(None).cast("long").alias("dist2"),
        )
    centroids = [list(r["q"]) for r in init]
    if len(init) < k:
        # Oracle-parity clamp (see the init comment above), but a
        # caller asking for k=100 clusters over a 10-row corpus should
        # hear about it rather than silently get 10 (r17 ADVICE).
        import logging

        logging.getLogger(__name__).warning(
            "kmeans_fixed_point: corpus has only %d vectors; clamping "
            "k from %d to %d", len(init), k, len(init)
        )
    k = len(centroids)
    dim = len(centroids[0])
    for _ in range(rounds):
        assigned = pts.select(
            "vec_id", "q", _assign("q", centroids)["j"].alias("cluster")
        )
        # k×dim-cell aggregation: component sums + counts per cluster.
        agg = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        new = {
            r["cluster"]: [
                # Python integer floor division: exact floor(s/n) at any
                # magnitude (floors toward -inf for negative sums, the
                # same convention any engine's FLOOR reproduces).
                r[f"s{i}"] // r["n"]
                for i in range(dim)
            ]
            for r in agg.collect()
        }
        centroids = [new.get(j, centroids[j]) for j in range(k)]
    return pts.select("vec_id", _assign("q", centroids).alias("a")).select(
        "vec_id",
        F.col("a")["j"].alias("cluster"),
        F.col("a")["d"].alias("dist2"),
    )


def centroid_outliers(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    radius: float = 0.5,
) -> DataFrame:
    """Embedding quality gate: flag vectors far from their OWN label's
    centroid — the standard mislabeled/garbage-embedding screen before
    centroid-based training or retrieval eval.

    ``(vec_id, label, n, dist2_num, is_outlier)`` where the test is the
    exact-integer cross-multiplied form of ‖q − s/n‖ > r:

        Σᵢ (n·qᵢ − sᵢ)²  >  n² · round(r·SCALE)²

    (q the half-up fixed-point vector, s the label's component sums, n
    its count — the mean s/n is never materialized, so no float enters
    the decision; ``dist2_num`` is the left side, exact). Bound: with
    |q| ≤ 2·SCALE per component, the squared terms stay inside int64
    while n·SCALE ≲ 3·10⁹ — per-label counts up to ~10⁵ at SCALE=10⁴.
    Beyond that, compute centroids from a deterministic per-label
    sample (the hash-threshold samplers) before gating the full corpus;
    the inequality form is unchanged.

    Scale shape: one quantizing scan + ONE (label, dim)-keyed exchange
    of integer sums (output |labels|·dim rows — collected as bounded
    driver state and inlined as literals), then the gate is a second
    scan-local pass — vectors never shuffle.
    """
    # NULL-label vectors are excluded up front: the oracle's per-label
    # stats re-attach through an INNER join on label, and NULL = NULL
    # never matches — the rows simply vanish from its output. Mirroring
    # with a filter (pushed to the scan) also keeps NULL out of the
    # CASE branches and the n-lookup map, whose keys may not be null
    # (r18 nullkey sweep: the unfiltered path crashed sorting None).
    q = df.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        quantize_fixed(df, vec_col).alias("__q"),
    )
    sums = (
        q.select("label", F.posexplode("__q").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_label: dict = {}
    counts: dict = {}
    for r in sums:
        by_label.setdefault(r["label"], {})[r["dim"]] = r["s"]
        counts[r["label"]] = r["n"]
    t = round(float(radius) * SCALE)
    if not by_label:
        # Empty input: no (label, dim) sums were collected, so there are
        # no CASE branches to build — short-circuit to an empty result
        # with the contract schema instead of dereferencing None.
        return q.select(
            "vec_id",
            "label",
            F.lit(None).cast("long").alias("n"),
            F.lit(None).cast("long").alias("dist2_num"),
            F.lit(None).cast("boolean").alias("is_outlier"),
        )
    # Enforce the documented int64 bound instead of silently overflowing
    # (ADVICE r11): each squared term is (n·q − s)² with |q| ≤ 2·SCALE
    # and |s| ≤ 2·n·SCALE, so a term is ≤ (4·n·SCALE)² and the dim-term
    # sum ≤ dim·16·(n·SCALE)²; the gate's right side needs n²·t² in
    # range too. Beyond either bound the comparison flips silently —
    # fail loudly and point at the documented sample-first remedy.
    import math

    dim_by_label = {lab: len(d) for lab, d in by_label.items()}
    for lab, n in counts.items():
        dim = max(dim_by_label.get(lab, 1), 1)
        max_nscale = math.isqrt((2**63 - 1) // (16 * dim))
        if n * SCALE > max_nscale or (t > 0 and n * t > math.isqrt(2**63 - 1)):
            raise ValueError(
                f"centroid_outliers: label {lab!r} has n={n} rows; "
                f"n*SCALE={n * SCALE} exceeds the int64-safe bound "
                f"({max_nscale} at dim={dim}) — the exact cross-multiply "
                "would overflow and silently flip is_outlier. Compute "
                "centroids from a deterministic per-label sample (the "
                "hash-threshold samplers) before gating the full corpus."
            )
    branches = None
    for lab in sorted(by_label):
        s = by_label[lab]
        arr = ", ".join(f"{s[d]}L" for d in range(len(s)))
        n = counts[lab]
        num = (
            f"aggregate(zip_with(__q, array({arr}), "
            f"(x, y) -> ({n}L * x - y) * ({n}L * x - y)), "
            f"0L, (a, v) -> a + v)"
        )
        cond = F.col("label") == lab
        val = F.expr(num)
        branches = (
            F.when(cond, val)
            if branches is None
            else branches.when(cond, val)
        )
    dist2 = branches.otherwise(F.lit(None)).alias("dist2_num")
    nmap = F.create_map(
        *[x for lab in sorted(counts) for x in (F.lit(lab), F.lit(counts[lab]))]
    )
    out = q.select(
        "vec_id",
        "label",
        F.element_at(nmap, F.col("label")).cast("long").alias("n"),
        dist2,
    )
    return out.select(
        "vec_id",
        "label",
        "n",
        "dist2_num",
        (
            F.col("dist2_num")
            > F.col("n") * F.col("n") * F.lit(int(t) * int(t))
        ).alias("is_outlier"),
    )
