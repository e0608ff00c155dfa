"""Runnable streaming programs — the reference's example mains, one per
subcommand, wiring real sources/sinks around the pure builders in
``runners.py`` (SURVEY.md §3: parameterize → env → source → transform →
sink → execute).

Usage::

    python -m flink_streaming_2_10_spark.streaming.programs wordcount \
        [--input DIR] [--output DIR]
    python -m flink_streaming_2_10_spark.streaming.programs socket-wordcount \
        --host localhost --port 9999 [--window "5 seconds"]
    python -m flink_streaming_2_10_spark.streaming.programs window-join \
        [--rate 3] [--window "2 seconds"]
    python -m flink_streaming_2_10_spark.streaming.programs topspeed
    python -m flink_streaming_2_10_spark.streaming.programs twitter \
        --input DIR [--target trump]

Mirrors: WordCount.java:55-94, SocketWindowWordCount.scala:39-72,
WindowJoin.scala:52-95, TopSpeedWindowing.scala:60-121,
TwitterExample.java:64-110. Each runs until interrupted (the unbounded
``env.execute`` contract); bounded correctness runs live in tests and the
driver's oracle gate instead.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from flink_streaming_2_10_spark.session import get_spark
from flink_streaming_2_10_spark.sources.generators import (
    grade_stream,
    rate_stream,
    read_text_lines,
    salary_stream,
    socket_text_stream,
)
from flink_streaming_2_10_spark.streaming.runners import (
    socket_window_word_count,
    streaming_word_count,
    twitter_fork_stream,
    window_join_stream,
)
from flink_streaming_2_10_spark.operators.topspeed import (
    top_speed_windowing_stream,
)
from flink_streaming_2_10_spark.functions.text import clamp


def _start_console(df, output_mode: str, trigger_seconds: int | None = None):
    writer = df.writeStream.outputMode(output_mode).format("console")
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="flink-streaming-2-10-spark")
    sub = ap.add_subparsers(dest="program", required=True)

    p = sub.add_parser("wordcount")
    p.add_argument("--input", required=True, help="directory of text files")
    p = sub.add_parser("socket-wordcount")
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, required=True)
    p.add_argument("--window", default="5 seconds")
    p = sub.add_parser("window-join")
    p.add_argument("--rate", type=int, default=3)  # WindowJoin.scala:56
    p.add_argument("--window", default="2 seconds")  # WindowJoin.scala:55
    sub.add_parser("topspeed")
    p = sub.add_parser("twitter")
    p.add_argument("--input", required=True, help="directory of tweet-JSON lines")
    p.add_argument("--target", default="trump")  # TwitterExample.java:89

    args = ap.parse_args(argv)
    spark = get_spark(f"streaming-{args.program}")

    if args.program == "wordcount":
        lines = read_text_lines(spark, args.input, streaming=True)
        query = _start_console(streaming_word_count(lines), "update")
    elif args.program == "socket-wordcount":
        lines = socket_text_stream(spark, args.host, args.port)
        query = _start_console(
            socket_window_word_count(lines, args.window), "update", 5
        )
    elif args.program == "window-join":
        out = window_join_stream(
            grade_stream(spark, args.rate),
            salary_stream(spark, args.rate),
            args.window,
        )
        query = _start_console(out, "append")
    elif args.program == "topspeed":
        # rate source → the car simulator dynamics (TopSpeedWindowing.scala:
        # 86-94): 2 cars, ±5 km/h random walk clamped [0,100] approximated
        # with a deterministic per-tick oscillation, distance integrates
        # speed/3.6 per 100 ms tick.
        rate = rate_stream(spark, rows_per_second=20)
        tick = F.col("value")
        car = (tick % 2).cast("int")
        speed = clamp(
            F.lit(50) + ((tick * 7) % 21 - 10).cast("int"), 0, 100
        ).cast("int")
        cars = rate.select(
            car.alias("carId"),
            speed.alias("speed"),
            (F.col("value") * F.lit(1.5)).alias("distance"),
            F.unix_millis(F.col("timestamp")).alias("time"),
        )
        query = _start_console(top_speed_windowing_stream(cars), "append")
    else:  # twitter
        lines = (
            spark.readStream.text(args.input).withColumnRenamed("value", "json")
        )
        query = _start_console(twitter_fork_stream(lines, args.target), "update")

    query.awaitTermination()


if __name__ == "__main__":
    main()
