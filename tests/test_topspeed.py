"""A6 delta-trigger/evictor/argmax properties (FIXTURES.md F-4 contract;
semantics from TopSpeedWindowing.scala:104-115)."""

from __future__ import annotations

from flink_streaming_2_10_spark.operators.topspeed import (
    _replay,
    top_speed_windowing,
)
from flink_streaming_2_10_spark.sources.generators import car_event_simulator


def test_replay_state_machine_basic():
    # (speed, distance, time); trigger 50 m, horizon 10 s
    rows = [
        (10, 0.0, 0),      # seeds last-trigger state, no fire
        (20, 30.0, 1000),  # delta 30 ≤ 50 → no fire
        (30, 60.0, 2000),  # delta 60 > 50 → FIRE, argmax speed = 30
        (5, 100.0, 3000),  # delta 40 → no fire
        (7, 120.0, 20000), # delta 60 > 50 → FIRE; evictor drops all < 10s
    ]
    out, buf, last = _replay(rows, [], None, 50.0, 10_000)
    assert out[0] == (30, 60.0, 2000)
    # second fire: only the t=20000 event survives the 10 s evictor
    assert out[1] == (7, 120.0, 20000)
    assert last == 120.0
    assert buf == [(7, 120.0, 20000)]


def test_replay_first_seen_tie_break():
    rows = [
        (10, 0.0, 0),
        (42, 30.0, 1000),
        (42, 60.0, 2000),  # fire; two speed-42 records → first-seen wins
    ]
    out, _, _ = _replay(rows, [], None, 50.0, 10_000)
    assert out == [(42, 30.0, 1000)]


def test_output_rows_are_subset_of_input(spark):
    cars = car_event_simulator(spark, num_cars=2, ticks=200, seed=7)
    out = top_speed_windowing(cars, trigger_meters=50.0, eviction_sec=10)
    inp = {tuple(r) for r in cars.collect()}
    got = [tuple(r) for r in out.collect()]
    assert got, "simulator at 50 km/h avg must trigger fires"
    assert all(r in inp for r in got)


def test_spark_replay_matches_independent_simulation(spark):
    # Exact check of the applyInPandas wiring (grouping, per-key time sort,
    # schema) against an in-test re-simulation of the Flink state machine.
    cars = car_event_simulator(spark, num_cars=2, ticks=300, seed=11)
    out = top_speed_windowing(cars, trigger_meters=50.0, eviction_sec=10)
    got = sorted((r.carId, r.speed, r.distance, r.time) for r in out.collect())

    expected = []
    rows = sorted(cars.collect(), key=lambda r: (r.carId, r.time))
    from itertools import groupby

    for car, group in groupby(rows, key=lambda r: r.carId):
        buf, last = [], None
        for r in group:
            buf.append(r)
            if last is None:
                last = r.distance
                continue
            if r.distance - last > 50.0:
                last = r.distance
                buf = [e for e in buf if e.time > r.time - 10_000]
                best = max(buf, key=lambda e: e.speed)
                expected.append((car, best.speed, best.distance, best.time))
    assert got == sorted(expected)
