"""Structured-Streaming ingestion (SURVEY.md §2.J).

The reference has no streaming; the v1 obligation is incremental batch
(snapshot diff + idempotent re-extract, antnre_spark/pipeline.py). This
module is the documented streaming extension: the SAME stage functions
(segment -> extract -> explode) run inside ``foreachBatch``, so batch and
streaming share one code path — late-arriving turns are handled either by
watermarked session windows here or by the next snapshot diff there.

Scale notes: file-source streaming scales by input-directory partitioning
(days(ts)/bucket). foreachBatch is at-least-once: a crash between the two
sink writes (or before the checkpoint commit) REPLAYS the batch, so the
sink commit must be idempotent — each micro-batch therefore commits with
``overwrite_partitions(df, ["batch_id"])``, replacing its own batch_id
partition on replay instead of appending duplicate rows. (mention_id being
a pure function of content position makes the rows themselves replay-stable
too.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from antnre_spark import assemble, extract, segment
from antnre_spark.icelite import IceLite
from antnre_spark.schema import TRANSCRIPTS


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript turns (one parquet drop per
    micro-batch; schema fixed — no inference in prod paths)."""
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def streaming_session_counts(
    turns: DataFrame, gap_minutes: int = 30, watermark_minutes: int = 60
) -> DataFrame:
    """C3 in streaming form: watermarked session windows over ts — late
    turns beyond the watermark are dropped deterministically; sessions
    close after gap_minutes of silence."""
    return (
        turns.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes"),
            F.col("conv_id"),
        )
        .agg(F.count("*").alias("n_turns"))
        .select(
            "conv_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_turns",
        )
    )


def start_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    weights_npz: str,
    vocab_json: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """readStream -> foreachBatch(extract stages) -> IcebergLite append.

    Each micro-batch runs the identical segment/extract/explode pipeline as
    the batch job; the mention/relation tables are partitioned by
    ``batch_id`` and each batch OVERWRITES its own partition — a foreachBatch
    replay after a mid-commit failure replaces rather than duplicates
    (exactly-once effect from at-least-once delivery)."""
    weights_bc, vocab_bc, model_key = extract.broadcast_model(
        spark, weights_npz, vocab_json
    )
    ment_t = IceLite(f"{out_root}/mentions_stream")
    rel_t = IceLite(f"{out_root}/relations_stream")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_extraction_batch(
            batch_df, batch_id, ment_t, rel_t, weights_bc, vocab_bc, model_key
        )

    return (
        stream_transcripts(spark, input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_extraction_batch(
    batch_df: DataFrame,
    batch_id: int,
    ment_t: IceLite,
    rel_t: IceLite,
    weights_bc,
    vocab_bc,
    model_key: str,
) -> None:
    """One micro-batch of the extraction stream. Module-level (not a
    closure) so the replay-idempotency property is directly testable:
    calling this twice with the same batch_id — exactly what an
    at-least-once foreachBatch replay does — must leave the sink
    unchanged, because each batch OVERWRITES its own batch_id partition."""
    if batch_df.isEmpty():
        return
    sentences = segment.segment_turns(assemble.filter_extractable(batch_df))
    extracted = extract.extract_sentences(
        sentences, weights_bc, vocab_bc, model_key=model_key
    ).localCheckpoint(eager=True)
    bid = F.lit(batch_id).alias("batch_id")
    ment_t.overwrite_partitions(
        extract.explode_mentions(extracted).select("*", bid), ["batch_id"]
    )
    rel_t.overwrite_partitions(
        extract.explode_relations(extracted).select("*", bid), ["batch_id"]
    )
