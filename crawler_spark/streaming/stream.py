"""Structured Streaming veneer over the round engine (SURVEY §2.10).

The reference is an iterative, resumable *batch* pipeline — its natural
Spark shape is the driver-looped round engine in ``rounds.py``. This
module adds the two streaming surfaces a deployment actually wants:

  * :func:`stream_crawl_rounds` — drive crawl rounds from a streaming
    source via ``foreachBatch``: each micro-batch of tick rows triggers
    one engine round; checkpointing + trigger cadence come from
    Structured Streaming, state still lives in the engine's snapshot
    tables (so a crashed stream resumes from the last committed round
    exactly like the batch loop).
  * :func:`windowed_event_counts` — watermarked tumbling-window
    aggregation over an event stream (late data handled by the
    watermark), the streaming twin of q30; output mode append so
    windows emit once finalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_crawl_rounds(engine, ticks: DataFrame, checkpoint_dir: str):
    """ticks: a streaming DataFrame (any schema — one micro-batch = one
    round trigger). Returns the started StreamingQuery."""

    def _run_round(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rnd = engine.last_round() + 1
        engine.run_round(rnd)

    return (
        ticks.writeStream.foreachBatch(_run_round)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts with late-data watermark.

    ``events`` must carry (ts timestamp, event_type string, value
    double); works identically on a batch DataFrame (unit parity with
    q30) and a streaming one.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def stream_validate_images(
    spark,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Incremental image-payload validation: a file-source stream over
    input_hint-shaped parquet (image_id, bytes, fmt, …) decodes each
    new file's rows (real codecs, Arrow batches) and appends
    (image_id, fmt, ok, w, h, phash) to ``out_dir``. The checkpoint
    makes it resumable — files validated before a crash are never
    re-decoded, the exact per-partition-lineage property the north
    rule wants for fetch/parse stages. Trigger availableNow: drains
    what exists, then stops (the batch-friendly cadence; a deployment
    would use a processing-time trigger)."""
    from pyspark.sql import types as T

    from crawler_spark.functions.images import decode_stats_batch

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("fmt", T.StringType(), True),
        ]
    )
    src = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 4
    ).parquet(in_dir)

    def _decode(batches):
        for pdf in batches:
            stats = decode_stats_batch(pdf["bytes"], pdf["fmt"])
            stats.insert(0, "image_id", pdf["image_id"].values)
            stats.insert(1, "fmt", pdf["fmt"].values)
            yield stats[["image_id", "fmt", "ok", "dec_w", "dec_h", "dec_phash"]]

    validated = src.mapInPandas(
        _decode,
        "image_id string, fmt string, ok boolean, dec_w int, dec_h int, dec_phash long",
    )
    return (
        validated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
