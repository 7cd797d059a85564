"""Streaming extension (SURVEY.md §2.J): foreachBatch extraction matches
the batch pipeline; watermarked session windows count correctly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from antnre_spark import streaming


@pytest.fixture()
def stream_dirs(tmp_path, spark, transcripts_df):
    """Split the fixture transcripts into two parquet drops."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    first = transcripts_df.filter(F.col("conv_id") < "c000050")
    second = transcripts_df.filter(F.col("conv_id") >= "c000050")
    first.coalesce(1).write.parquet(str(tmp_path / "d1"))
    second.coalesce(1).write.parquet(str(tmp_path / "d2"))
    import shutil

    for d in ("d1", "d2"):
        for f in os.listdir(tmp_path / d):
            if f.endswith(".parquet"):
                shutil.copy(tmp_path / d / f, in_dir / f"{d}_{f}")
    return {"in": str(in_dir), "out": str(tmp_path / "out"), "ckpt": str(tmp_path / "ckpt")}


class TestExtractionStream:
    def test_stream_matches_batch_extraction(
        self, spark, stream_dirs, fixture_paths, transcripts_df
    ):
        q = streaming.start_extraction_stream(
            spark,
            stream_dirs["in"],
            stream_dirs["out"],
            fixture_paths["weights"],
            fixture_paths["vocab"],
            stream_dirs["ckpt"],
        )
        q.awaitTermination(300)

        from antnre_spark import assemble, extract, segment
        from antnre_spark.icelite import IceLite

        got = IceLite(f"{stream_dirs['out']}/mentions_stream").load(spark)
        assert got is not None

        w_bc, v_bc, key = extract.broadcast_model(
            spark, fixture_paths["weights"], fixture_paths["vocab"]
        )
        sentences = segment.segment_turns(
            assemble.filter_extractable(transcripts_df)
        )
        want = extract.explode_mentions(
            extract.extract_sentences(sentences, w_bc, v_bc, model_key=key)
        )
        # stream processed raw turns (no conversation-level dedup): compare
        # on the batch side without dedup either
        g = {tuple(r) for r in got.drop("batch_id").collect()}
        w = {tuple(r) for r in want.collect()}
        assert g == w

    def test_restart_is_exactly_once(self, spark, stream_dirs, fixture_paths):
        for _ in range(2):
            q = streaming.start_extraction_stream(
                spark,
                stream_dirs["in"],
                stream_dirs["out"],
                fixture_paths["weights"],
                fixture_paths["vocab"],
                stream_dirs["ckpt"],
            )
            q.awaitTermination(300)
        from antnre_spark.icelite import IceLite

        got = IceLite(f"{stream_dirs['out']}/mentions_stream").load(spark)
        dupes = (
            got.groupBy("mention_id").count().filter(F.col("count") > 1).count()
        )
        assert dupes == 0


class TestSessionWindows:
    def test_watermarked_sessions(self, spark, tmp_path, transcripts_df):
        """Append mode emits only CLOSED sessions: a later-batch sentinel
        event advances the watermark past the conversation so both planted
        sessions (the >1h idle gap splits c000007) close and emit."""
        import shutil
        from datetime import datetime, timezone

        from antnre_spark.schema import TRANSCRIPTS

        conv = transcripts_df.filter(F.col("conv_id") == "c000007")
        in_dir = tmp_path / "sess_in"
        in_dir.mkdir()

        def drop_file(df, name):
            d = tmp_path / name
            df.coalesce(1).write.parquet(str(d))
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    shutil.copy(d / f, in_dir / f"{name}_{f}")

        drop_file(conv, "batch1")

        out_dir = str(tmp_path / "sess_out")

        def run_pass():
            stream = streaming.stream_transcripts(spark, str(in_dir))
            sessions = streaming.streaming_session_counts(stream, gap_minutes=30)
            q = (
                sessions.writeStream.format("parquet")
                .option("path", out_dir)
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            return (
                spark.read.parquet(out_dir)
                .filter(F.col("conv_id") == "c000007")
                .collect()
            )

        first = run_pass()
        sentinel = spark.createDataFrame(
            [
                (
                    "zz_sentinel", 0, "user", "flush .", None,
                    datetime(2025, 1, 1, tzinfo=timezone.utc),
                )
            ],
            TRANSCRIPTS,
        )
        drop_file(sentinel, "batch2")
        second = run_pass()

        got = {(r["session_start"], r["n_turns"]) for r in second or first}
        assert len(got) == 2
        assert sum(n for _, n in got) == conv.count()


class TestReplayIdempotency:
    def test_replayed_batch_overwrites_not_duplicates(
        self, spark, tmp_path, transcripts_df, fixture_paths
    ):
        """foreachBatch is at-least-once: a crash between the two sink
        writes replays the WHOLE batch with the same batch_id. The sink
        must come out identical, not doubled."""
        from antnre_spark import extract
        from antnre_spark.icelite import IceLite

        w_bc, v_bc, key = extract.broadcast_model(
            spark, fixture_paths["weights"], fixture_paths["vocab"]
        )
        ment_t = IceLite(str(tmp_path / "m"))
        rel_t = IceLite(str(tmp_path / "r"))
        batch = transcripts_df.filter(F.col("conv_id") < "c000020")
        streaming.process_extraction_batch(batch, 7, ment_t, rel_t, w_bc, v_bc, key)
        n_m = ment_t.load(spark).count()
        n_r = rel_t.load(spark).count()
        assert n_m > 0
        # replay: same batch, same batch_id — must be a no-op for counts
        streaming.process_extraction_batch(batch, 7, ment_t, rel_t, w_bc, v_bc, key)
        assert ment_t.load(spark).count() == n_m
        assert rel_t.load(spark).count() == n_r
        # and mention_ids stay unique (content-position ids + overwrite)
        ids = ment_t.load(spark).select("mention_id")
        assert ids.distinct().count() == n_m
