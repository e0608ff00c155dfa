from flink_streaming_2_10_spark.functions import jsonx, text

__all__ = ["text", "jsonx"]
