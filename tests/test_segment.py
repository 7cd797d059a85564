"""D-operators: sentence split, tokenization, vocabulary (SURVEY.md §2.D)."""

from __future__ import annotations

import pytest

from antnre_spark import segment
from antnre_spark.schema import TRANSCRIPTS


@pytest.fixture()
def turns(spark):
    from datetime import datetime, timezone

    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("c1", 0, "user", "First one . Second here ! Third ?", None, t0),
        ("c1", 1, "user", "only one sentence .", None, t0),
    ]
    return spark.createDataFrame(rows, TRANSCRIPTS)


class TestSegmentTurns:
    def test_sentence_split_and_indices(self, turns):
        out = segment.segment_turns(turns).collect()
        got = {
            (r["conv_id"], r["turn_idx"], r["sent_idx"]): r["tokens"]
            for r in out
        }
        assert got[("c1", 0, 0)] == ["First", "one", "."]
        assert got[("c1", 0, 1)] == ["Second", "here", "!"]
        assert got[("c1", 0, 2)] == ["Third", "?"]
        assert got[("c1", 1, 0)] == ["only", "one", "sentence", "."]

    def test_char_offsets_roundtrip(self, turns):
        text = "First one . Second here ! Third ?"
        out = segment.segment_turns(turns).filter("turn_idx = 0").collect()
        for r in out:
            assert text[r["char_begin"] : r["char_end"]] == " ".join(r["tokens"])


class TestBuildVocab:
    def test_ids_deterministic_and_ranked(self, turns, spark):
        sents = segment.segment_turns(turns)
        vocab = {r["token"]: (r["id"], r["freq"]) for r in segment.build_vocab(sents).collect()}
        # "one" and "." appear twice -> lowest ids; tie by token asc: "." < "one"
        assert vocab["."][1] == 2 and vocab["one"][1] == 2
        assert vocab["."][0] == 2 and vocab["one"][0] == 3  # ids start at 2 (PAD=0, UNK=1)

    def test_min_freq_prunes(self, turns):
        sents = segment.segment_turns(turns)
        vocab = segment.build_vocab(sents, min_freq=2)
        assert {r["token"] for r in vocab.collect()} == {".", "one"}


class TestDistributedVocab:
    def test_two_phase_ids_identical_to_window(self, spark):
        """build_vocab_distributed must assign EXACTLY the ids of the
        single-partition-window build_vocab — including heavy freq ties
        resolved by token order — at several partition counts."""
        from antnre_spark.segment import build_vocab, build_vocab_distributed

        words = (
            ["the"] * 50 + ["cat"] * 10 + ["dog"] * 10 + ["ant"] * 10
            + ["bee"] * 3 + ["cow"] * 3 + ["elk"] * 1
        )
        rows = [(words[i : i + 5],) for i in range(0, len(words), 5)]
        sents = spark.createDataFrame(rows, "tokens array<string>")
        want = {
            (r["token"], r["id"], r["freq"])
            for r in build_vocab(sents, min_freq=2).collect()
        }
        for n_parts in (1, 3, 8):
            owned = []
            got = {
                (r["token"], r["id"], r["freq"])
                for r in build_vocab_distributed(
                    sents, min_freq=2, num_partitions=n_parts,
                    owned_caches=owned,
                ).collect()
            }
            for df in owned:
                df.unpersist()
            assert got == want, n_parts

    def test_no_single_partition_exchange(self, spark):
        """The point of the two-phase rank: the plan must not funnel the
        vocabulary through a single-partition exchange (the window
        version does)."""
        from antnre_spark.segment import build_vocab, build_vocab_distributed

        sents = spark.createDataFrame(
            [(["a", "b", "a"],)], "tokens array<string>"
        )
        owned = []
        plan = (
            build_vocab_distributed(sents, owned_caches=owned)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for df in owned:
            df.unpersist()
        assert "SinglePartition" not in plan
        window_plan = (
            build_vocab(sents)._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" in window_plan
