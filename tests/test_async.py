"""X1 ordered async I/O (AsyncIOExample.scala:40-45; FIXTURES.md F-7):
identity fn must emit exactly the input, preserving per-partition order."""

from __future__ import annotations

import pytest
import time

from flink_streaming_2_10_spark.operators.async_io import (
    identity_enrich,
    ordered_async_map,
)


def test_identity_round_trip_preserves_partition_order(spark):
    df = spark.range(0, 500).repartition(4)
    out = ordered_async_map(
        df, identity_enrich, schema="id long", timeout=10.0, capacity=10
    )
    # Per-partition order must be unchanged: compare per-partition lists.
    inp = df.rdd.glom().map(lambda rows: [r.id for r in rows]).collect()
    got = out.rdd.glom().map(lambda rows: [r.id for r in rows]).collect()
    assert sorted(map(tuple, inp)) == sorted(map(tuple, got))


def test_enrichment_changes_schema(spark):
    df = spark.range(0, 50)

    def enrich(row: dict) -> dict:
        return {"id": row["id"], "key": f"key-{row['id']}"}

    out = ordered_async_map(df, enrich, schema="id long, key string")
    rows = {(r.id, r.key) for r in out.collect()}
    assert rows == {(i, f"key-{i}") for i in range(50)}


def test_slow_fn_within_timeout_and_capacity(spark):
    df = spark.range(0, 40).coalesce(1)

    def slow(row: dict) -> dict:
        time.sleep(0.02)
        return row

    t0 = time.time()
    out = ordered_async_map(df, slow, schema="id long", timeout=10.0, capacity=10)
    ids = [r.id for r in out.collect()]
    assert ids == list(range(40))  # single partition ⇒ total order preserved
    # capacity-10 pool should overlap the sleeps (~0.08 s ideal, not 0.8 s)
    assert time.time() - t0 < 30


def test_hung_fn_times_out_while_in_flight(spark):
    # The watchdog contract (AsyncIOExample.scala:34): a request that never
    # returns must fail the job ~timeout seconds in, not block forever.
    df = spark.range(0, 4).coalesce(1)

    def hang(row: dict) -> dict:
        if row["id"] == 2:
            time.sleep(3600)
        return row

    out = ordered_async_map(df, hang, schema="id long", timeout=1.0, capacity=4)
    t0 = time.time()
    with pytest.raises(Exception, match="exceeded 1.0s"):
        out.collect()
    assert time.time() - t0 < 30  # detection ~1s + task-failure overhead


def test_finished_but_late_fn_still_times_out(spark):
    # A request that returns just past the deadline (between watchdog
    # polls) is still a contract violation.
    df = spark.range(0, 3).coalesce(1)

    def late(row: dict) -> dict:
        if row["id"] == 1:
            time.sleep(0.3)
        return row

    out = ordered_async_map(df, late, schema="id long", timeout=0.05, capacity=3)
    with pytest.raises(Exception, match="exceeded 0.05s"):
        out.collect()
