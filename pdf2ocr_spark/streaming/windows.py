"""Watermarked windowed aggregation over the events stream.

Same logical aggregation as plans/queries.q_events_windowed, expressed as
a Structured Streaming query with a 1-hour watermark: late events within
the watermark still update their window; events later than that are
dropped and the window state is evicted (bounded state at 10^12-event
scale — state size is O(open windows x event_types), not O(events)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.floor(F.sum("value") * 10000 + F.lit(0.5)).cast("long").alias(
                "sum_value_bp"
            ),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_bp",
        )
    )


def run_windowed_stream(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """AvailableNow runner over a parquet file stream of events."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_dir)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
