"""Test-only streaming helpers.

``collect_stream`` lives HERE, not in ``streaming/runners.py``, because
it collects every micro-batch to the driver — the right tool for
asserting a refinement sequence against golden data (the streaming
analog of TwitterExampleData.STREAMING_COUNTS_AS_TUPLES), and exactly
the wrong shape for production, where a runner's foreachBatch should
write to a sink, not the driver. Keeping it out of the package means no
production caller can mistake the driver-collect loop for a runner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_streaming_2_10_spark.streaming.runners import run_update_stream


def collect_stream(
    df: DataFrame, checkpoint_dir: str, output_mode: str = "update"
) -> list[list]:
    """Run a bounded streaming input to exhaustion, returning the list of
    micro-batch row-lists (the refinement sequence)."""
    batches: list[list] = []

    def on_batch(bdf, batch_id: int) -> None:
        rows = bdf.collect()
        if rows:
            batches.append(rows)

    run_update_stream(df, checkpoint_dir, on_batch, output_mode)
    return batches
