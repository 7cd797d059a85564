"""C-operators: ordering invariant, dedup, sessionization (SURVEY.md §2.C)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from antnre_spark import assemble
from antnre_spark.schema import TRANSCRIPTS


def ts(s: int):
    return datetime(2024, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=s)


@pytest.fixture()
def tiny_transcripts(spark):
    rows = [
        ("c1", 1, "assistant", "reply one .", None, ts(30)),
        ("c1", 0, "user", "hello there .", None, ts(0)),
        ("c1", 2, "tool", '{"status":"ok"}', "search", ts(60)),
        ("c2", 0, "user", "first .", None, ts(0)),
        ("c2", 0, "user", "first retry .", None, ts(5)),  # dup, later ts wins
        ("c2", 2, "user", "after gap .", None, ts(7200)),  # idx gap + time gap
    ]
    return spark.createDataFrame(rows, TRANSCRIPTS)


class TestDedupTurns:
    def test_latest_ts_wins(self, tiny_transcripts):
        out = assemble.dedup_turns(tiny_transcripts)
        c2 = {r["turn_idx"]: r["text"] for r in out.filter("conv_id='c2'").collect()}
        assert c2[0] == "first retry ."
        assert out.count() == 5

    def test_idempotent(self, tiny_transcripts):
        once = assemble.dedup_turns(tiny_transcripts)
        twice = assemble.dedup_turns(once)
        assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


class TestAssembleDocuments:
    def test_turn_order_is_turn_idx_asc(self, tiny_transcripts):
        docs = assemble.assemble_documents(assemble.dedup_turns(tiny_transcripts))
        c1 = docs.filter("conv_id='c1'").collect()[0]
        assert [t["turn_idx"] for t in c1["turns"]] == [0, 1, 2]
        assert c1["n_turns"] == 3

    def test_order_independent_of_partitioning(self, tiny_transcripts):
        """The per-turn equality invariant surface: same turns array under
        1 vs 16 partitions (BASELINE.json:15)."""
        base = assemble.dedup_turns(tiny_transcripts)
        a = assemble.assemble_documents(base.repartition(1)).collect()
        b = assemble.assemble_documents(base.repartition(16)).collect()
        key = lambda r: (r["conv_id"], r["doc_seq"])  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_long_conversation_split_into_continuations(self, spark):
        rows = [
            ("big", i, "user", f"turn {i} .", None, ts(i)) for i in range(25)
        ]
        df = spark.createDataFrame(rows, TRANSCRIPTS)
        docs = assemble.assemble_documents(df, max_turns_per_doc=10)
        got = {
            r["doc_seq"]: [t["turn_idx"] for t in r["turns"]]
            for r in docs.collect()
        }
        assert got[0] == list(range(10))
        assert got[1] == list(range(10, 20))
        assert got[2] == list(range(20, 25))

    def test_roundtrip_equality_invariant(self, spark, transcripts_df):
        """explode(documents.turns) ⋈ deduped transcripts on
        (conv_id, turn_idx) -> text equal, 0 mismatches (SURVEY.md §3.4)."""
        base = assemble.dedup_turns(transcripts_df)
        docs = assemble.assemble_documents(base)
        back = assemble.explode_documents(docs)
        joined = base.alias("a").join(
            back.alias("b"), ["conv_id", "turn_idx"], "full"
        )
        mismatches = joined.filter(
            F.col("a.text").isNull()
            | F.col("b.text").isNull()
            | (F.col("a.text") != F.col("b.text"))
        ).count()
        assert mismatches == 0
        assert back.count() == base.count()


class TestFusedAssembly:
    def test_fused_equals_separate_ops(self, spark, transcripts_df):
        """assemble_documents_fused (1 shuffle) must agree exactly with
        dedup_turns + assemble_documents (2 shuffles) on the full fixture,
        including the duplicate-turn pathology."""
        sep = assemble.assemble_documents(
            assemble.dedup_turns(transcripts_df), max_turns_per_doc=64
        )
        fused = assemble.assemble_documents_fused(
            transcripts_df, max_turns_per_doc=64
        )
        key = lambda r: (r["conv_id"], r["doc_seq"])  # noqa: E731
        a = sorted(sep.collect(), key=key)
        b = sorted(fused.collect(), key=key)
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert (ra["conv_id"], ra["doc_seq"], ra["n_turns"]) == (
                rb["conv_id"], rb["doc_seq"], rb["n_turns"],
            )
            assert ra["turns"] == rb["turns"], ra["conv_id"]

    def test_fused_single_shuffle(self, transcripts_df):
        plan = assemble.assemble_documents_fused(transcripts_df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestSessionize:
    def test_gap_splits_session(self, tiny_transcripts):
        out = assemble.sessionize(assemble.dedup_turns(tiny_transcripts), 30)
        c2 = {
            r["turn_idx"]: r["session_id"]
            for r in out.filter("conv_id='c2'").collect()
        }
        assert c2[0] == "c2#0" and c2[2] == "c2#1"

    def test_no_gap_single_session(self, tiny_transcripts):
        out = assemble.sessionize(assemble.dedup_turns(tiny_transcripts), 30)
        assert {
            r["session_id"] for r in out.filter("conv_id='c1'").collect()
        } == {"c1#0"}
