"""Window-join tests replicating the reference IT case
(WindowJoinITCase.scala:36-77): bounded CSV-shaped fixtures through the
factored join, shape-checked with the Person regex and exactly checked
against a hand join."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.functions.text import parse_seq_csv
from flink_streaming_2_10_spark.operators.join import join_grades_salaries
from flink_streaming_2_10_spark.sinks import to_text_lines

# Fixture lines in the WindowJoinData CSV shape: "seq,name,value"
# (field 0 = sequence/timestamp prefix — WindowJoinITCase.scala:48-51).
GRADES_CSV = [
    "0,john,3", "1,tom,2", "2,alice,1", "3,grace,5", "4,john,4",
    "5,bob,1", "6,alice,2", "7,grace,3", "8,jerry,2", "9,tom,5",
]
SALARIES_CSV = [
    "0,john,6469", "1,jerry,6760", "2,jerry,8069", "3,tom,3662",
    "4,grace,8427", "5,john,9425", "6,bob,9018", "7,alice,7749",
    "8,jerry,7260", "9,tom,3643",
]

PERSON_RE = re.compile(r"^\((\d+),([a-z]+),(\d),(\d+)\)$")


def _with_ts(df, seq_col="seq", ms_per_seq=50):
    # seq → synthetic event time, 50 ms apart ⇒ 100 ms windows pair up
    # consecutive seq values (the ITCase uses a 100 ms window, :60).
    return df.withColumn(
        "ts", F.timestamp_millis(F.lit(1_700_000_000_000) + F.col(seq_col) * ms_per_seq)
    )


def _fixture(spark, lines, value_name):
    raw = spark.createDataFrame([(l,) for l in lines], "line string")
    return _with_ts(parse_seq_csv(raw, "line", value_name)).drop("seq")


def test_window_join_itcase_shape_and_values(spark):
    grades = _fixture(spark, GRADES_CSV, "grade")
    salaries = _fixture(spark, SALARIES_CSV, "salary")
    joined = join_grades_salaries(grades, salaries, window_size="100 milliseconds")

    rows = joined.collect()
    assert rows, "join must produce pairs"
    # Shape check (the ITCase regex, WindowJoinITCase.scala:65), adapted to
    # our (window_start,name,grade,salary) text shape.
    for line in [r.value for r in to_text_lines(joined).collect()]:
        m = PERSON_RE.match(line)
        assert m, line
        assert 1 <= int(m.group(3)) <= 5
        assert 1 <= int(m.group(4)) <= 10000

    # Exact check: hand-computed equi join on (name, 100ms bucket).
    def bucket(seq):
        return (1_700_000_000_000 + seq * 50) // 100

    def parse(lines):
        return [
            (bucket(i), line.split(",")[1], int(line.split(",")[2]))
            for i, line in enumerate(lines)
        ]

    g, s = parse(GRADES_CSV), parse(SALARIES_CSV)
    expected = {
        (gb * 100, gn, gg, ss)
        for (gb, gn, gg) in g
        for (sb, sn, ss) in s
        if gb == sb and gn == sn
    }
    actual = {(r.window_start, r.name, r.grade, r.salary) for r in rows}
    assert actual == expected


def test_window_join_is_inner(spark):
    # names that never co-occur in a window produce nothing
    grades = _fixture(spark, ["0,tom,1"], "grade")
    salaries = _fixture(spark, ["9,tom,100"], "salary")  # 450 ms later
    out = join_grades_salaries(grades, salaries, window_size="100 milliseconds")
    assert out.count() == 0
