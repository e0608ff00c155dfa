"""Top-speed windowing — global window + DeltaTrigger + TimeEvictor + maxBy
(SURVEY.md §2.4 A6; the one genuinely custom stateful operator).

Reference: ``TopSpeedWindowing.scala:104-115`` — per car:
* events accumulate in a never-closing global window;
* ``DeltaTrigger`` FIREs when ``new.distance − lastTriggered.distance >
  triggerMeters`` (50 m default; first element only seeds the state —
  Flink 1.1.4 DeltaTrigger.onElement semantics);
* on fire, ``TimeEvictor`` first drops buffered events older than
  ``newest.time − evictionSec`` (10 s default), then ``maxBy("speed")``
  emits the buffered record with max speed (first-seen on ties — with
  ascending-time replay that is the earliest such record);
* the window is FIREd, not PURGEd: surviving buffer is retained.

Spark has no trigger/evictor surface, so this is implemented as a per-key
replay: batch via ``applyInPandas`` (deterministic given the per-key time
sort), streaming via ``applyInPandasWithState`` carrying (buffer,
last-trigger) state across micro-batches. Both paths share ``_replay``.

Scale notes: one hash exchange on the key; the Python stage is
Arrow-batched, one pandas frame per key group. Per-key state is bounded by
the eviction horizon (only events within 10 s of the newest can ever be
emitted, and the buffer is trimmed on every fire), so memory per key is
O(events / eviction window), independent of total history length.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_COLUMNS = ["carId", "speed", "distance", "time"]
_SCHEMA = "carId int, speed int, distance double, time long"
_STATE_SCHEMA = (
    "last_distance double, buf_speed array<int>, buf_distance array<double>, "
    "buf_time array<long>"
)


def _replay(
    rows: list[tuple[int, float, int]],
    buffer: list[tuple[int, float, int]],
    last_trigger_distance: float | None,
    trigger_meters: float,
    eviction_ms: int,
) -> tuple[list[tuple[int, float, int]], list[tuple[int, float, int]], float | None]:
    """Feed ``rows`` (time-ascending ``(speed, distance, time)`` tuples)
    through the trigger/evictor/argmax state machine.

    Returns (emitted, surviving_buffer, new_last_trigger_distance).
    """
    out: list[tuple[int, float, int]] = []
    for rec in rows:
        _, distance, time = rec
        buffer.append(rec)
        if last_trigger_distance is None:
            # First element seeds DeltaTrigger state without firing.
            last_trigger_distance = distance
            continue
        if distance - last_trigger_distance > trigger_meters:
            last_trigger_distance = distance
            # TimeEvictor: drop events older than (newest − horizon) …
            cutoff = time - eviction_ms
            buffer[:] = [r for r in buffer if r[2] > cutoff]
            # … then maxBy(speed), first-seen (= earliest in time order).
            out.append(max(buffer, key=lambda r: r[0]))
    return out, buffer, last_trigger_distance


def top_speed_windowing(
    df: DataFrame,
    trigger_meters: float = 50.0,
    eviction_sec: int = 10,
) -> DataFrame:
    """Batch path: full-history replay per car.

    Expects columns ``carId int, speed int, distance double, time long``
    (epoch millis, FIXTURES.md F-4). Output rows are a subset of input rows.
    """
    eviction_ms = eviction_sec * 1000

    def replay_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # (time, distance, speed) — a total order on the replay-relevant
        # fields, so the fold is deterministic even when timestamps tie
        # (rows tying on all three are identical tuples and commute). The
        # DuckDB oracle numbers rows with the same key.
        pdf = pdf.sort_values(["time", "distance", "speed"], kind="mergesort")
        rows = list(zip(pdf["speed"], pdf["distance"], pdf["time"]))
        out, _, _ = _replay(rows, [], None, trigger_meters, eviction_ms)
        car = pdf["carId"].iloc[0]
        return pd.DataFrame(
            [(car, s, d, t) for (s, d, t) in out], columns=OUTPUT_COLUMNS
        )

    return (
        df.select(*OUTPUT_COLUMNS)
        .groupBy("carId")
        .applyInPandas(replay_group, schema=_SCHEMA)
    )


def top_speed_windowing_stream(
    df: DataFrame,
    trigger_meters: float = 50.0,
    eviction_sec: int = 10,
):
    """Streaming path: same state machine carried across micro-batches via
    ``applyInPandasWithState``. Requires in-order (per-key time-ascending)
    delivery within each batch; the reference guarantees ascending
    timestamps (TopSpeedWindowing.scala:105)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    eviction_ms = eviction_sec * 1000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_distance, bs, bd, bt = state.get
            buffer = list(zip(bs, bd, bt))
        else:
            last_distance, buffer = None, []
        emitted: list[tuple[int, float, int]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["time", "distance", "speed"], kind="mergesort")
            rows = list(zip(pdf["speed"], pdf["distance"], pdf["time"]))
            out, buffer, last_distance = _replay(
                rows, buffer, last_distance, trigger_meters, eviction_ms
            )
            emitted.extend(out)
        state.update(
            (
                last_distance,
                [r[0] for r in buffer],
                [r[1] for r in buffer],
                [r[2] for r in buffer],
            )
        )
        if emitted:
            yield pd.DataFrame(
                [(key[0], s, d, t) for (s, d, t) in emitted], columns=OUTPUT_COLUMNS
            )

    return (
        df.select(*OUTPUT_COLUMNS)
        .groupBy("carId")
        .applyInPandasWithState(
            update,
            outputStructType=_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def transform_with_state_available() -> bool:
    """True when the arbitrary-state v2 API is RUNNABLE here: the PySpark
    classes exist (Spark 4.0+) AND the ``google.protobuf`` runtime they
    depend on imports — transformWithStateInPandas launches a streaming
    Python driver worker that speaks protobuf to the JVM, and a missing/
    broken protobuf crashes that worker at query start, not at import."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )

        return True
    except ImportError:
        return False


def top_speed_windowing_stream_tws(
    df: DataFrame,
    trigger_meters: float = 50.0,
    eviction_sec: int = 10,
):
    """Streaming path on the Spark 4 arbitrary-state v2 API
    (``transformWithStateInPandas`` + ``StatefulProcessor``): the same
    ``_replay`` state machine, with the (buffer, last-trigger) tuple held
    in a named ``ValueState`` instead of the single opaque
    ``GroupState``. Identical output to
    :func:`top_speed_windowing_stream` — the parity test runs whichever
    API the container provides and compares against the batch replay.

    Gate on :func:`transform_with_state_available` — it also verifies the
    ``google.protobuf`` runtime the API's streaming Python driver worker
    needs (a broken protobuf crashes the worker at query START, after
    this builder returns). Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) — the v2 API does not run on
    the default HDFS-backed store; set it on the session before starting
    the query (tests do; rocksdbjni ships with Spark 4).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    eviction_ms = eviction_sec * 1000

    class _TopSpeedProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("replay", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                last_distance, bs, bd, bt = self._state.get()
                buffer = list(zip(bs, bd, bt))
            else:
                last_distance, buffer = None, []
            emitted: list[tuple[int, float, int]] = []
            for pdf in rows:
                pdf = pdf.sort_values(
                    ["time", "distance", "speed"], kind="mergesort"
                )
                recs = list(zip(pdf["speed"], pdf["distance"], pdf["time"]))
                out, buffer, last_distance = _replay(
                    recs, buffer, last_distance, trigger_meters, eviction_ms
                )
                emitted.extend(out)
            self._state.update(
                (
                    last_distance,
                    [r[0] for r in buffer],
                    [r[1] for r in buffer],
                    [r[2] for r in buffer],
                )
            )
            if emitted:
                yield pd.DataFrame(
                    [(key[0], s, d, t) for (s, d, t) in emitted],
                    columns=OUTPUT_COLUMNS,
                )

        def close(self) -> None:
            pass

    return (
        df.select(*OUTPUT_COLUMNS)
        .groupBy("carId")
        .transformWithStateInPandas(
            statefulProcessor=_TopSpeedProcessor(),
            outputStructType=_SCHEMA,
            outputMode="append",
            timeMode="None",
        )
    )
