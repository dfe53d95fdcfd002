"""Streaming ingestion: the reference's chunked-container surface (SURVEY
§2.12) re-expressed as Structured Streaming.

Reference mapping:
* `SuperTable::push(batch)` / `from_batches` (`super_table.rs:99,138`) →
  a file/rate micro-batch source feeding `readStream`.
* `RechunkStrategy::{Count,Memory,Auto}` (`super_array.rs:51-60`) →
  `maxFilesPerTrigger` / `maxBytesPerTrigger` trigger sizing + AQE.
* `consolidate()` (`consolidate.rs:61`) → sink-side coalesce/compaction.

Local testing uses a replay directory: the batch events table split into
chunk files, consumed with maxFilesPerTrigger=1 — a real incremental file
source driving the same query specs as the batch tier (SURVEY §5's
batch-equivalence strategy). On a cluster the same code points at a
Kafka/cloud-files source; nothing below assumes local mode.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minarrow_spark.sources.catalog import load_table


def replay_dir(
    spark: SparkSession, sf_dir: str, n_chunks: int = 8, base_dir: str | None = None
) -> str:
    """Materialize `events` as ``n_chunks`` parquet files for streaming replay
    (the SuperTable::push batch sequence). Chunks are split on event_id ranges
    so replay order is deterministic."""
    e = load_table(spark, sf_dir, "events")
    return replay_frame_dir(e, "event_id", n_chunks, base_dir)


def replay_frame_dir(
    df: DataFrame, id_col: str, n_chunks: int = 8, base_dir: str | None = None
) -> str:
    """Materialize any frame as ``n_chunks`` id-range chunk files for replay.
    Chunks are written in ascending id order (the file source picks batches
    up in modification order), so arrival order tracks ``id_col``."""
    out = base_dir or tempfile.mkdtemp(prefix="minarrow_stream_")
    e = df
    # Even-width id ranges → stable chunking independent of partition layout.
    bounds = e.agg(F.min(id_col), F.max(id_col)).first()
    lo, hi = bounds[0], bounds[1]
    width = max(1, (hi - lo + n_chunks) // n_chunks)
    chunked = e.withColumn(
        "chunk", ((F.col(id_col) - F.lit(lo)) / width).cast("int")
    )
    for i in range(n_chunks):
        (
            chunked.filter(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"chunk={i:04d}"))
        )
    return out


def read_event_stream(
    spark: SparkSession, replay_path: str, files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the replay directory — micro-batch ingestion with
    Count-style rechunk policy (files per trigger)."""
    schema = spark.read.parquet(os.path.join(replay_path, "chunk=0000")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(replay_path)
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming DataFrame to completion into a memory sink and return
    the query handle (caller reads `SELECT * FROM {name}`)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
