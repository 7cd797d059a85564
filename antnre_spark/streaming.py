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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from antnre_spark import assemble, extract
from antnre_spark.icelite import IceLite
from antnre_spark.schema import TRANSCRIPTS


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream of transcript turns (one parquet drop per
    micro-batch; schema fixed — no inference in prod paths)."""
    return (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
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


DOC_OUT_SCHEMA = "conv_id string, n_turns int, doc_text string, closed_by string"
DOC_STATE_SCHEMA = "turn_idxs array<int>, texts array<string>, last_ts_ms long"


def streaming_assemble_documents(
    turns: DataFrame,
    gap_seconds: int = 1800,
    max_turns: int = 512,
    watermark: str = "10 seconds",
    dedupe: bool = True,
) -> DataFrame:
    """CUSTOM STATEFUL operator (``applyInPandasWithState``): streaming
    document assembly — the C1 groupBy cannot run on an unbounded stream,
    so per-conversation state accumulates turns and a document is emitted
    when either

    - the conversation is silent past ``gap_seconds`` of EVENT time
      (GroupState event-time timeout against the watermark — late turns
      inside the watermark still join their document), or
    - ``max_turns`` accumulate (the long-conversation skew cap applied at
      the STATE layer: a runaway conversation is cut into bounded
      documents instead of growing state without bound — the same
      MAX_TURNS_PER_DOC discipline as the batch assembler).

    Emitted rows: (conv_id, n_turns, doc_text ordered by turn_idx,
    closed_by in {'timeout', 'cap'}). State per key is two arrays + a
    long — O(turns in flight) per conversation, bounded by max_turns.

    ``dedupe`` (r3 verdict task 7): the source is at-least-once, so a
    replayed file re-delivers turns the assembler already holds — the
    batch path repairs this with C2 (latest-ts dedup), a stream cannot.
    ``dropDuplicatesWithinWatermark`` on (conv_id, turn_idx) ahead of
    the stateful assembler drops re-deliveries whose key was seen within
    the watermark (first arrival wins — exactly the replay case, where
    the duplicates are identical rows). Dedup state expires with the
    watermark, so state size is bounded by in-flight turns, not history.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_seconds * 1000
    src = turns.withWatermark("ts", watermark)
    if dedupe:
        src = src.dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    # epoch-ms is projected IN THE PLAN (unix_millis) rather than read
    # back from pandas datetimes inside the UDF: applyInPandasWithState
    # renders ts as tz-NAIVE datetimes in the session timezone, and
    # re-localizing is zone-dependent and DST-unsafe (a fold/gap local
    # time raises AmbiguousTimeError/NonExistentTimeError inside the
    # stateful UDF and kills the query — r3 ADVICE). An integer column
    # sidesteps pandas tz entirely; GroupState timeouts are epoch ms.
    # NOTE the watermarked 'ts' column itself must SURVIVE the projection:
    # EventTimeTimeout analysis rejects a stateful operator whose input
    # lost the watermark attribute.
    src = src.select(
        "conv_id", "turn_idx", "text", "ts",
        F.unix_millis("ts").alias("ts_ms"),
    )

    def assemble_fn(key, pdf_iter, state: GroupState):
        conv_id = key[0]

        def doc_frame(idxs, texts, closed_by):
            order = sorted(range(len(idxs)), key=lambda i: (idxs[i], i))
            return pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "n_turns": len(idxs),
                        "doc_text": " ".join(texts[i] for i in order),
                        "closed_by": closed_by,
                    }
                ]
            )

        if state.hasTimedOut:
            idxs, texts, _last = state.get
            state.remove()
            yield doc_frame(list(idxs), list(texts), "timeout")
            return
        idxs: list[int] = []
        texts: list[str] = []
        last_ms = 0
        if state.exists:
            s_idxs, s_texts, s_last = state.get
            idxs, texts, last_ms = list(s_idxs), list(s_texts), int(s_last)
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            idxs.extend(int(x) for x in pdf["turn_idx"])
            texts.extend(str(x) for x in pdf["text"])
            last_ms = max(last_ms, int(pdf["ts_ms"].max()))
        if len(idxs) >= max_turns:
            # order the in-flight turns by turn_idx BEFORE cutting, so cap
            # documents slice in turn order (the batch assembler's
            # MAX_TURNS_PER_DOC discipline), not arrival order
            order = sorted(range(len(idxs)), key=lambda i: (idxs[i], i))
            idxs = [idxs[i] for i in order]
            texts = [texts[i] for i in order]
        while len(idxs) >= max_turns:
            # cut a full cap-sized document; remainder stays in flight
            yield doc_frame(idxs[:max_turns], texts[:max_turns], "cap")
            idxs, texts = idxs[max_turns:], texts[max_turns:]
        if idxs:
            state.update((idxs, texts, last_ms))
            # timeout must sit strictly past the current watermark
            state.setTimeoutTimestamp(
                max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

    return src.groupBy("conv_id").applyInPandasWithState(
        assemble_fn,
        DOC_OUT_SCHEMA,
        DOC_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
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


def kg_stream_tables(out_root: str) -> dict[str, IceLite]:
    """The incremental-KG stream's sink tables (r4 verdict task 5)."""
    return {
        "mentions": IceLite(f"{out_root}/mentions_stream"),
        "relations": IceLite(f"{out_root}/relations_stream"),
        "surface_counts": IceLite(f"{out_root}/surface_counts_stream"),
        "triple_partials": IceLite(f"{out_root}/triple_partials_stream"),
        "triples": IceLite(f"{out_root}/triples_stream"),
        "entities": IceLite(f"{out_root}/entities_stream"),
    }


def _link_marker_path(tables: dict[str, IceLite]) -> str:
    import os

    return os.path.join(
        os.path.dirname(tables["triples"].path), "kg_stream_linked.json"
    )


def materialize_kg_stream(
    spark: SparkSession,
    tables: dict[str, IceLite],
    tau: float | None = None,
    skip_if_current: bool = True,
) -> None:
    """Phase 2 of the incremental-KG stream, standalone: merge the
    persisted surface counts, relink, merge the triple partials against
    the fresh surface map, overwrite triples/entities. Deterministic
    from the tables alone (idempotent — safe to run any number of
    times), which is what makes the ``link_every`` amortization knob
    sound: skipped batches lose nothing durable, and one call after the
    stream drains brings the serving tables current.

    ``skip_if_current`` (r7): a marker file beside the triples table
    records the (surface_counts, triple_partials) snapshot ids + tau
    the last relink consumed; when they match the current snapshots
    the call is a NO-OP. This makes the drain-then-materialize idiom
    free when the final micro-batch already relinked (the
    ``n_batches % link_every == 0`` case paid a full redundant relink
    before). Crash-safe in both directions: a lost marker just re-runs
    the idempotent relink; a replayed/later batch bumps the source
    snapshot ids so a stale marker never suppresses real work."""
    import json as _json
    import os

    from antnre_spark import link, materialize

    # snapshot ids BEFORE load() pins the file lists (r7 review): a
    # commit landing between load and key-read would stamp the marker
    # with data the relink never consumed; reading the key first means
    # a racing commit leaves the marker STALE (older id than the data
    # actually read) and the next call re-runs — the safe direction.
    linked_key = {
        "surface_counts": tables["surface_counts"].current_snapshot(),
        "triple_partials": tables["triple_partials"].current_snapshot(),
        "tau": tau,
    }
    per_raw_t = tables["surface_counts"].load(spark)
    if per_raw_t is None:
        return
    marker = _link_marker_path(tables)
    if skip_if_current and os.path.exists(marker):
        try:
            with open(marker) as fh:
                if _json.load(fh) == linked_key:
                    return
        except (OSError, ValueError):
            pass  # unreadable marker = just relink
    surfaces = link.merge_surface_counts(per_raw_t.drop("batch_id"))
    surface_map, entities = link.link_surfaces(
        surfaces, **({"tau": tau} if tau is not None else {})
    )
    try:
        partials_t = tables["triple_partials"].load(spark)
        if partials_t is not None:
            triples = materialize.merge_triple_partials(
                partials_t.drop("batch_id"), surface_map
            )
            tables["triples"].overwrite_partitions(
                triples.withColumn("part", F.lit(0)), ["part"]
            )
        tables["entities"].overwrite_partitions(
            entities.withColumn("part", F.lit(0)), ["part"]
        )
        # marker LAST (after both overwrites): a crash before this line
        # leaves no marker and the next call simply relinks
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            _json.dump(linked_key, fh)
        os.replace(tmp, marker)
    finally:
        surface_map.unpersist()


def process_kg_batch(
    batch_df: DataFrame,
    batch_id: int,
    tables: dict[str, IceLite],
    weights_bc,
    vocab_bc,
    model_key: str,
    tau: float | None = None,
    link_every: int = 1,
    repartition_to: int | None = None,
) -> None:
    """One micro-batch of the FULL KG stream: extraction + incremental
    linking + triple materialization (r4 verdict task 5 — before this,
    a stream user still had to run the batch link_job afterwards).

    ``repartition_to``: partition count for the extraction stage
    (default 10x defaultParallelism — the same sizing the batch
    pipeline's partition_for_extraction uses; pass 0 to keep the
    source partitioning). THE r7 stream/batch-gap finding: a file-
    source micro-batch arrives with one partition per ~input file (2,
    measured, for the bench's 50k-turn batches), so without this
    reshuffle the compute-bound model UDF ran on 2 of 32 cores and the
    stream read 2.1x the batch wall on identical input. The extra
    exchange is the same one the batch path pays, and it hash-
    partitions by conv_id so downstream grouping reuses it.

    The companion half of the fix: the EXTRACTED frame is repartitioned
    back DOWN (max(2, parallelism/8)) before the persist that the four
    sink writes share. Persisting at the extraction width made every
    write schedule one task — and emit one parquet file — per
    extraction partition (measured: 0.3s -> 2.5s per write at 320), so
    extraction parallelism and write parallelism are decoupled: the UDF
    runs wide, the small extracted rows cross one cheap round-robin
    exchange, and the writes scan a handful of persisted partitions.
    Measured per 50k-turn batch (32 cores): extract 14s/2-way -> 3.5s/
    320-way; phase-1 total 11.5-15.5s -> 4.2-4.7s.

    Two-phase design:

    1. Batch-local, idempotent-by-batch_id writes: mentions, relations,
       per-raw SURFACE COUNTS (link.surface_counts — the mergeable form
       of the surface table) and surface-keyed TRIPLE PARTIALS
       (materialize.triple_partials — entity ids are global and can be
       re-clustered by later batches, surface keys never change, so
       partials are write-once). A foreachBatch replay overwrites its own
       batch_id partitions, exactly like the extraction stream.
    2. Merge + relink from the PERSISTED tables: merged surface counts ->
       link_surfaces (the same hybrid local/distributed linker as batch)
       -> merge_triple_partials against the CURRENT surface map ->
       overwrite triples/entities. Deterministic from the tables alone,
       so a replayed batch re-derives the identical output — replay-safe
       without coordination.

    Scale: phase 1 touches only the batch; phase 2 shuffles |distinct
    surfaces| + |distinct surface-level triples| — the hub-collapsed
    small end of the pipeline — so per-batch re-materialization is the
    delta+compact shape, not a corpus recompute. ``link_every=K``
    amortizes it further: phase 2 runs on every K-th batch only
    (durability never depends on it — the phase-1 writes are complete),
    and one ``materialize_kg_stream`` call after the stream drains
    brings the serving tables current (r5 scale probe: per-batch merge
    was 4/46.8s of the 100k-turn run)."""
    from antnre_spark import link, materialize

    if batch_df.isEmpty():
        return
    parallelism = batch_df.sparkSession.sparkContext.defaultParallelism
    turns = assemble.filter_extractable(batch_df)
    n_parts = repartition_to
    if n_parts is None:
        n_parts = 10 * parallelism
    if n_parts:
        turns = assemble.partition_for_extraction(turns, n_parts)
    extracted = extract.extract_turns(
        turns, weights_bc, vocab_bc, model_key=model_key,
    ).repartition(max(2, parallelism // 8)).persist()
    try:
        bid = F.lit(batch_id).alias("batch_id")
        mentions = extract.explode_mentions(extracted)
        relations = extract.explode_relations(extracted)
        tables["mentions"].overwrite_partitions(
            mentions.select("*", bid), ["batch_id"]
        )
        tables["relations"].overwrite_partitions(
            relations.select("*", bid), ["batch_id"]
        )
        tables["surface_counts"].overwrite_partitions(
            link.surface_counts(mentions).select("*", bid), ["batch_id"]
        )
        tables["triple_partials"].overwrite_partitions(
            materialize.triple_partials(relations).select("*", bid),
            ["batch_id"],
        )
    finally:
        extracted.unpersist()

    if (batch_id + 1) % max(link_every, 1) != 0:
        return  # phase 2 amortized to every link_every-th batch
    # materialize_kg_stream handles the all-empty-table case (load()
    # returns None when no batch has yielded mentions yet — r5
    # self-review finding) and is idempotent from the tables alone
    materialize_kg_stream(batch_df.sparkSession, tables, tau=tau)


def start_kg_stream(
    spark: SparkSession,
    input_dir: str,
    out_root: str,
    weights_npz: str,
    vocab_json: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    link_every: int = 1,
) -> StreamingQuery:
    """readStream -> foreachBatch(extract + incremental link/materialize).
    After the stream drains, ``<out_root>/triples_stream`` holds the same
    triples the batch link_job would produce over the same turns
    (tests/test_streaming.py::TestKgStream). ``link_every=K`` amortizes
    the merge/relink phase to every K-th batch; run
    ``materialize_kg_stream`` once after draining to catch the tail."""
    weights_bc, vocab_bc, model_key = extract.broadcast_model(
        spark, weights_npz, vocab_json
    )
    tables = kg_stream_tables(out_root)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_kg_batch(
            batch_df, batch_id, tables, weights_bc, vocab_bc, model_key,
            link_every=link_every,
        )

    return (
        stream_transcripts(spark, input_dir, max_files_per_trigger)
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
    # persist, not localCheckpoint: one forward pass shared by both sink
    # writes, then RELEASED — a localCheckpoint here leaks one persisted
    # RDD per micro-batch for the life of the stream (DataFrame.unpersist
    # cannot release localCheckpoint blocks). extract_turns = fused
    # segmentation+extraction, row-identical to the staged path (r4).
    # partition_for_extraction: file-source micro-batches arrive with one
    # partition per ~file and would starve the model UDF; the extracted
    # frame then drops back to a handful of partitions so the two sink
    # writes don't schedule one task+file per extraction partition (the
    # r7 stream-gap finding — see process_kg_batch).
    parallelism = batch_df.sparkSession.sparkContext.defaultParallelism
    extracted = extract.extract_turns(
        assemble.partition_for_extraction(
            assemble.filter_extractable(batch_df), 10 * parallelism
        ),
        weights_bc, vocab_bc, model_key=model_key,
    ).repartition(max(2, parallelism // 8)).persist()
    try:
        bid = F.lit(batch_id).alias("batch_id")
        ment_t.overwrite_partitions(
            extract.explode_mentions(extracted).select("*", bid), ["batch_id"]
        )
        rel_t.overwrite_partitions(
            extract.explode_relations(extracted).select("*", bid), ["batch_id"]
        )
    finally:
        extracted.unpersist()
