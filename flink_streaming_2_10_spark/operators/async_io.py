"""Ordered async I/O enrichment (SURVEY.md §2.5 X1).

Reference: ``AsyncIOExample.scala:40-45`` — ``AsyncDataStream.orderedWait``
applies a Future-returning function per record with bounded in-flight
capacity (10) and a timeout (10 s); **emission order equals arrival order**.

Spark-first mapping: ``mapInPandas`` — each Arrow batch's rows are submitted
to a bounded thread pool in arrival order and results are collected in that
same order, so partition-level output order is preserved exactly like the
reference's ordered mode. (Across partitions there is no global order in
either engine — Flink's ordered mode is per-subtask too.)

At-least-once caveat (SURVEY.md §7.3): Spark may re-execute a partition on
task retry; side-effecting ``fn`` must be idempotent.
"""

from __future__ import annotations

import concurrent.futures
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def ordered_async_map(
    df: DataFrame,
    fn: Callable[[dict], dict],
    schema: StructType | str,
    timeout: float = 10.0,
    capacity: int = 10,
) -> DataFrame:
    """Apply ``fn`` (row-dict → row-dict) asynchronously with bounded
    in-flight requests, emitting results in arrival order.

    ``schema`` is the output schema (like the reference, the async step can
    change the record type).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with concurrent.futures.ThreadPoolExecutor(max_workers=capacity) as pool:
            for pdf in batches:
                rows = pdf.to_dict("records")
                # Submission in arrival order; the bounded pool gives the
                # reference's in-flight capacity. Collection below is also
                # in arrival order ⇒ orderedWait semantics.
                futures = [pool.submit(fn, row) for row in rows]
                results = [f.result(timeout=timeout) for f in futures]
                if results:
                    yield pd.DataFrame(results)

    return df.mapInPandas(run, schema=schema)


def identity_enrich(row: dict) -> dict:
    """The reference example's async function is effectively identity over
    the counter stream (AsyncIOExample.scala:41-44)."""
    return row
