"""Streaming exact distinct via mergeable bitmaps (beyond-reference).

The streaming face of `operators/sketches.agg_bitmap_distinct_users`:
each arrival micro-batch contributes its own (event_type, chunk)
bitmap words, the state store grows by at most |id-domain|/32 rows per
type per batch (NOT by batch row count), and OR-merging the per-batch
words reconstructs the EXACT distinct count — bitwise OR is
associative/commutative/idempotent, so the result is bit-identical to
the batch computation under ANY arrival split. KMV gave streaming an
estimate with a merge proof (stream_kmv_distinct); bitmaps give
streaming an EXACT count with the same proof, which is why the DuckDB
batch oracle can hash-check it strictly rather than rows-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from job_market_research_spark.io import load
from job_market_research_spark.operators.sketches import BITMAP_BITS
from job_market_research_spark.registry import query
from job_market_research_spark.sources.readers import scratch_dir
from job_market_research_spark.streaming.windows import _stage_events


@query(
    "stream_bitmap_distinct",
    oracle=f"""
    WITH maps AS (
      SELECT event_type, user_id // {BITMAP_BITS} AS chunk,
             bit_or(1::BIGINT << CAST(user_id % {BITMAP_BITS} AS INT))
               AS bitmap
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(bit_count(bitmap)) AS BIGINT) AS distinct_users
    FROM maps GROUP BY event_type ORDER BY event_type
    """,
    tags=("streaming", "sketch", "distinct", "beyond"),
)
def q_stream_bitmap_distinct(spark, sf_dir: str) -> DataFrame:
    """Incremental EXACT distinct-user counts over arrival batches:
    foreachBatch folds each micro-batch into (event_type, chunk)
    bitmap words and appends them; the terminal read OR-merges across
    batches and popcounts. Idempotence of OR makes replayed batches
    harmless (at-least-once safe), associativity makes the result
    independent of the arrival split — which the strict batch oracle
    hash-proves. State: ≤ |id-domain|/32 words per type per batch; a
    continuous deployment compacts the store with the same OR-merge,
    or keys it in the state store directly."""
    src = _stage_events(spark, sf_dir, "stream_bitmap")
    schema = load(spark, sf_dir, "events").schema
    root = scratch_dir("stream_bitmap_state")
    state = os.path.join(root, "words")
    seed = spark.createDataFrame([], "event_type string, chunk long, bitmap long")
    seed.write.mode("overwrite").parquet(state)

    def merge_words(batch_df: DataFrame, epoch_id: int) -> None:
        words = (
            batch_df.select(
                "event_type",
                (F.col("user_id") / BITMAP_BITS).cast("long").alias("chunk"),
                F.expr(
                    f"shiftleft(1L, CAST(user_id % {BITMAP_BITS} AS INT))"
                ).alias("bit"),
            )
            .groupBy("event_type", "chunk")
            .agg(F.bit_or("bit").alias("bitmap"))
        )
        words.write.mode("append").parquet(state)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("event_type", "user_id")
    )
    q = (
        stream.writeStream.foreachBatch(merge_words)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    return (
        spark.read.parquet(state)
        .groupBy("event_type", "chunk")
        .agg(F.bit_or("bitmap").alias("bitmap"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum(F.bit_count("bitmap")).cast("long").alias("distinct_users"),
        )
        .orderBy("event_type")
    )
