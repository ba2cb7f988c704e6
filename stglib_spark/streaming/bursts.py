"""Streaming burst aggregation with watermarks.

Scale shape: tumbling-window aggregation with a watermark is Spark's
incremental, state-bounded operator — state per (window, series) key only
until the watermark passes, so an unbounded 100 TB/day feed runs in
constant memory per executor. The duration-subsetting filter
(``average_duration``, mar.py:259-331) happens before aggregation, so
state never holds out-of-duration rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Open the events table as a file stream (one parquet per micro-batch
    in tests; in production this is a Kafka/file-drop source with the same
    schema). Handles the nanosecond-timestamp parquet the same way
    load_table does."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # file-stream sources need a directory; glob-filter to the events table
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return stream


def streaming_burst_average(
    events: DataFrame,
    interval_seconds: int = 3600,
    duration_seconds: int | None = None,
    watermark: str = "2 hours",
    min_count: int | None = None,
) -> DataFrame:
    """Tumbling-window burst average with late-data watermark —
    streaming twin of interval_average (mar.py:259-331 semantics +
    utils.py:2044-2086 min-valid gate)."""
    win = F.window(F.col("ts"), f"{int(interval_seconds)} seconds")
    src = events.withWatermark("ts", watermark)
    if duration_seconds is not None:
        in_dur = (
            F.col("ts").cast("double") - win.start.cast("double")
        ) < F.lit(float(duration_seconds))
        src = src.filter(in_dur)
    agg = src.groupBy(win.alias("w")).agg(
        F.avg("value").alias("value_avg"), F.count(F.lit(1)).alias("n")
    )
    if min_count is not None:
        agg = agg.withColumn(
            "value_avg",
            F.when(F.col("n") >= min_count, F.col("value_avg")),
        )
    return agg.select(F.col("w.start").alias("burst_time"), "value_avg", "n")


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Duplicate-timestamp suppression within the watermark horizon —
    streaming twin of drop_duplicates(dim='time') (sig/cdf2nc.py:1582).
    State is bounded by the watermark (old keys evicted)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "ts"]
    )
