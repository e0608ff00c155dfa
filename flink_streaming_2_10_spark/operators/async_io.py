"""Ordered async I/O enrichment (SURVEY.md §2.5 X1).

Reference: ``AsyncIOExample.scala:40-45`` — ``AsyncDataStream.orderedWait``
applies a Future-returning function per record with bounded in-flight
capacity (10) and a timeout (10 s); **emission order equals arrival order**.

Spark-first mapping: ``mapInPandas`` — each Arrow batch's rows are handed
to ``capacity`` worker threads through a queue in arrival order; results
land in an arrival-indexed buffer, so partition-level output order is
preserved exactly like the reference's ordered mode. (Across partitions
there is no global order in either engine — Flink's ordered mode is
per-subtask too.)

Why a hand-rolled worker pool instead of ``ThreadPoolExecutor.submit`` per
record: a Future per record costs ~27 µs of executor machinery (measured:
2.7 s per 100 k rows before any user code runs); a ``SimpleQueue`` handoff
to ``capacity`` long-lived workers costs ~5 µs per record with the same
guarantees — at most ``capacity`` concurrent ``fn`` invocations, and a
per-request timeout enforced by a MAIN-THREAD WATCHDOG: each worker
registers its request's start time before calling ``fn``, and the main
thread polls the in-flight table, raising ``TimeoutError`` as soon as any
request exceeds the deadline — while ``fn`` is still running, matching
the reference's future-timeout contract (AsyncIOExample.scala:34). The
hung worker itself cannot be preempted (Python threads aren't
interruptible); it is abandoned as a daemon thread and the task fails.

At-least-once caveat (SURVEY.md §7.3): Spark may re-execute a partition on
task retry; side-effecting ``fn`` must be idempotent.
"""

from __future__ import annotations

import queue
import threading
import time
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
        for pdf in batches:
            cols = list(pdf.columns)
            rows = [
                dict(zip(cols, vals))
                for vals in pdf.itertuples(index=False, name=None)
            ]
            out: list = [None] * len(rows)
            errors: list[BaseException] = []
            stop = threading.Event()
            # slot -> (row index, start time) of the request in flight —
            # the watchdog's view into every running fn() call.
            inflight: dict[int, tuple[int, float]] = {}
            lock = threading.Lock()
            work: queue.SimpleQueue = queue.SimpleQueue()
            for item in enumerate(rows):
                work.put(item)
            for _ in range(capacity):
                work.put(None)

            done = threading.Event()
            live = [capacity]

            def worker(slot: int) -> None:
                try:
                    while not stop.is_set():
                        item = work.get()
                        if item is None:
                            return
                        i, row = item
                        started = time.monotonic()
                        with lock:
                            inflight[slot] = (i, started)
                        try:
                            res = fn(row)
                        except BaseException as exc:  # noqa: BLE001 — re-raised on task
                            errors.append(exc)
                            stop.set()
                            return
                        finally:
                            with lock:
                                inflight.pop(slot, None)
                        if time.monotonic() - started > timeout:
                            # Finished, but past deadline (between watchdog
                            # polls): still a contract violation.
                            errors.append(
                                TimeoutError(
                                    f"async request {i} exceeded {timeout}s"
                                )
                            )
                            stop.set()
                            return
                        out[i] = res
                finally:
                    with lock:
                        live[0] -= 1
                        if live[0] == 0:
                            done.set()

            threads = [
                threading.Thread(target=worker, args=(slot,), daemon=True)
                for slot in range(capacity)
            ]
            for t in threads:
                t.start()
            # Watchdog loop: wake every ``poll`` seconds (or instantly when
            # the last worker exits) and expire any request still in flight
            # past its deadline — the timeout fires WHILE fn runs. Poll
            # granularity bounds detection latency only; workers never
            # wait on the watchdog.
            poll = max(0.01, min(0.1, timeout / 20.0))
            while not done.wait(poll):
                if errors:
                    break
                now = time.monotonic()
                with lock:
                    expired = [
                        i
                        for i, started in inflight.values()
                        if now - started > timeout
                    ]
                if expired:
                    stop.set()
                    # Abandon the hung daemon worker(s); fail the task now,
                    # like the reference job fails on a timed-out future.
                    raise TimeoutError(
                        f"async request {expired[0]} exceeded {timeout}s "
                        f"(still in flight)"
                    )
            if errors:
                stop.set()
                raise errors[0]
            if out:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)


def identity_enrich(row: dict) -> dict:
    """The reference example's async function is effectively identity over
    the counter stream (AsyncIOExample.scala:41-44)."""
    return row
