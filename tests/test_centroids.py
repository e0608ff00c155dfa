"""Class-centroid operators (pipeline/centroids.py)."""

from __future__ import annotations

import pytest

from flink_streaming_2_10_spark.catalog import load_table
from flink_streaming_2_10_spark.pipeline.centroids import (
    confusion_oracle_sql,
    hard_negatives,
    hard_negatives_oracle_sql,
    label_centroids,
    nearest_centroid_confusion,
)
from tests.conftest import SF_SMALL, assert_df_matches_oracle


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


@pytest.fixture(scope="module")
def toy(spark):
    # two tight, well-separated classes + one obvious imposter of each
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [0.4, 0.6], 1),  # closest label-1 point to class 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_confusion_matches_oracle(emb, duck):
    assert_df_matches_oracle(
        nearest_centroid_confusion(emb), duck, confusion_oracle_sql()
    )


def test_hard_negatives_match_oracle(emb, duck):
    assert_df_matches_oracle(
        hard_negatives(emb, k=5), duck, hard_negatives_oracle_sql(k=5)
    )


def test_centroids_are_floor_means(toy):
    cents = dict(label_centroids(toy))
    # label 0: q-sums (10000+9000, 0+1000) over 2 -> floor means
    assert cents[0] == [9500, 500]
    assert cents[1] == [1666, 8333]  # (0+1000+4000)//3, (10000+9000+6000)//3


def test_floor_division_on_negative_sums(spark):
    df = spark.createDataFrame(
        [(1, [-0.3], 0), (2, [0.2], 0)], ["vec_id", "embedding", "label"]
    )
    # sum = -1000, n = 2 -> floor(-500) = -500; and non-divisible:
    assert dict(label_centroids(df))[0] == [-500]
    df2 = spark.createDataFrame(
        [(1, [-0.3], 0), (2, [0.2], 0), (3, [0.0], 0)],
        ["vec_id", "embedding", "label"],
    )
    # sum = -1000, n = 3 -> floor(-333.3) = -334 (toward -inf, not 0)
    assert dict(label_centroids(df2))[0] == [-334]


def test_confusion_diagonal_when_separable(toy):
    rows = nearest_centroid_confusion(toy).collect()
    by = {(r["label"], r["assigned"]): r["n_vecs"] for r in rows}
    assert by == {(0, 0): 2, (1, 1): 3}


def test_hard_negatives_pick_closest_imposters(toy):
    rows = hard_negatives(toy, k=1).collect()
    top = {r["centroid_label"]: r for r in rows}
    assert top[0]["vec_id"] == 5 and top[0]["label"] == 1
    assert top[1]["vec_id"] == 2 and top[1]["label"] == 0
    assert all(r["rnk"] == 1 for r in rows)


def test_hard_negatives_k_and_order(emb):
    rows = hard_negatives(emb, k=3).collect()
    by_class: dict[int, list] = {}
    for r in rows:
        by_class.setdefault(r["centroid_label"], []).append(r)
    for recs in by_class.values():
        recs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in recs] == list(range(1, len(recs) + 1))
        assert len(recs) <= 3
        dists = [r["dist2"] for r in recs]
        assert dists == sorted(dists)
        assert all(r["label"] != r["centroid_label"] for r in recs)


def test_confusion_plan_has_no_join(emb):
    """Assignment is a literal expression — the plan must contain no
    join; the only exchange is the C²-group confusion aggregation."""
    plan = (
        nearest_centroid_confusion(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan


def test_hard_negatives_plan_uses_window_group_limit(emb):
    """The 100 TB claim in the docstring — WindowGroupLimit caps each
    partition at k rows per class BEFORE the rank window's exchange —
    must actually appear in the physical plan: a refactor that breaks
    the row_number()-then-filter pattern Spark's optimizer recognizes
    would silently ship the full C×corpus candidate set into the
    shuffle (r17 pin)."""
    plan = (
        hard_negatives(emb, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
