"""Structured Streaming ingest edge (SURVEY §2.10).

The reference has zero streaming surface and parity scope needs none; this
is the optional ingest path for a continuously-arriving document corpus:
a file-source stream of spans-shaped parquet, watermarked event-time
windowed counts of geo spans per cell, written as an append stream.

Demonstrates: readStream with explicit schema (never inferred), watermark +
tumbling window, and the same native cell-index expression the batch join
uses — the streaming and batch paths share one logical encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import DOCUMENTS
from ..operators.spatial_join import POINT_RX, cell_expr


def stream_documents(spark: SparkSession, input_dir: str, files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of spans parquet files."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(input_dir)
    )


def geo_span_cell_counts(
    docs_stream: DataFrame, res: int = 7, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Windowed per-cell geo-span counts with late-data watermarking.

    Event time is synthesized from arrival (processing time) because the
    spans schema carries no timestamp — a real corpus would use its ingest
    timestamp column here.
    """
    pts = (
        docs_stream.select("doc_id", F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "geo") & F.col("s.text").startswith("POINT"))
        .select(
            "doc_id",
            F.regexp_extract("s.text", POINT_RX, 1).cast("double").alias("x"),
            F.regexp_extract("s.text", POINT_RX, 2).cast("double").alias("y"),
            F.current_timestamp().alias("ts"),
        )
        .withColumn("cell", cell_expr(F.col("x"), F.col("y"), res))
    )
    return (
        pts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "cell")
        .agg(F.count("*").alias("n_spans"), F.approx_count_distinct("doc_id").alias("n_docs"))
    )


def stream_spatial_join(spark: SparkSession, docs_stream: DataFrame, zones: DataFrame) -> DataFrame:
    """Continuous flagship: the BATCH spatial-join operator applied verbatim
    to a streaming documents frame — every stage (explode, parse barrier,
    cell encode, broadcast zone join with bbox residual, Arrow PIP refine)
    is stateless or static-side, so the identical plan serves batch and
    stream; one logical encoding, two execution modes."""
    from ..operators.spatial_join import spatial_join_points

    return spatial_join_points(spark, docs_stream, zones, strategy="broadcast")


def run_to_memory(spark: SparkSession, input_dir: str, query_name: str = "cell_counts"):
    """Start the pipeline against a memory sink (tests / demos); returns the
    StreamingQuery — caller awaits/stops it."""
    counts = geo_span_cell_counts(stream_documents(spark, input_dir))
    return (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
