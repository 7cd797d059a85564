"""THE parity gate (SURVEY.md §3.4, §5.2.3; BASELINE.json:2,14): the
distributed pipeline must reproduce the single-process oracle's emitted
mentions, relations, entities, and (subj, pred, obj) triples at
P/R >= 0.95 — in practice exactly, since both run identical math and all
decision margins dominate float noise.

Also verifies the oracle itself against the by-construction gold
annotations (quality context, not the parity criterion)."""

from __future__ import annotations

import pandas as pd
import pytest

from antnre_spark.evaluate import eval_triples, micro_prf

PARITY_MIN = 0.95


@pytest.fixture(scope="module")
def spark_tables(spark, pipeline_out):
    cfg = pipeline_out["cfg"]
    return {
        "mentions": cfg.table("mentions").load(spark),
        "relations": cfg.table("relations").load(spark),
        "entities": cfg.table("entities").load(spark),
        "triples": cfg.table("triples").load(spark),
        "documents": cfg.table("documents").load(spark),
    }


class TestMentionParity:
    def test_mentions_exact(self, spark_tables, oracle_result):
        got = (
            spark_tables["mentions"]
            .select("mention_id", "ent_type", "surface", "conf")
            .toPandas()
            .sort_values("mention_id")
            .reset_index(drop=True)
        )
        want = (
            oracle_result.mentions[["mention_id", "ent_type", "surface", "conf"]]
            .sort_values("mention_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_exact=False, atol=1e-6)


class TestRelationParity:
    def test_relations_exact(self, spark_tables, oracle_result):
        keys = ["subj_mention_id", "obj_mention_id", "pred"]
        got = (
            spark_tables["relations"].select(keys).toPandas()
            .sort_values(keys).reset_index(drop=True)
        )
        want = (
            oracle_result.relations[keys].sort_values(keys).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


class TestEntityParity:
    def test_entity_ids_and_canonicals(self, spark_tables, oracle_result):
        got = (
            spark_tables["entities"]
            .select("entity_id", "canonical", "n_mentions")
            .toPandas()
            .sort_values("entity_id")
            .reset_index(drop=True)
        )
        want = (
            oracle_result.entities[["entity_id", "canonical", "n_mentions"]]
            .sort_values("entity_id")
            .reset_index(drop=True)
        )
        got["n_mentions"] = got["n_mentions"].astype("int64")
        want["n_mentions"] = want["n_mentions"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestTripleParity:
    def test_triples_pr_at_least_095(self, spark, spark_tables, oracle_result):
        gold = spark.createDataFrame(
            oracle_result.triples[["subj", "pred", "obj"]]
        )
        res = eval_triples(spark_tables["triples"], gold)
        assert res["precision"] >= PARITY_MIN, res
        assert res["recall"] >= PARITY_MIN, res

    def test_triples_exact(self, spark_tables, oracle_result):
        keys = ["subj", "pred", "obj"]
        got = (
            spark_tables["triples"]
            .select(*keys, "n_evidence")
            .toPandas()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        want = (
            oracle_result.triples[keys + ["n_evidence"]]
            .sort_values(keys)
            .reset_index(drop=True)
        )
        got["n_evidence"] = got["n_evidence"].astype("int64")
        want["n_evidence"] = want["n_evidence"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestQualityVsConstructionGold:
    """Context numbers vs by-construction gold (SURVEY.md §6) — the tiny
    gazetteer-nudged model should be near-exact on entity spans and >= 0.85
    on relations (spurious-but-deterministic extras are acceptable)."""

    def test_mention_quality(self, spark, spark_tables, fixture_paths):
        gold = pd.read_parquet(fixture_paths["gold"])
        rows = []
        for g in gold.itertuples():
            for s in g.ent_spans:
                rows.append(
                    (g.conv_id, int(g.turn_idx), int(g.sent_idx),
                     int(s["begin"]), int(s["end"]), s["ent_type"])
                )
        gold_df = spark.createDataFrame(
            rows, ["conv_id", "turn_idx", "sent_idx", "begin", "end", "ent_type"]
        )
        res = micro_prf(
            spark_tables["mentions"], gold_df,
            ["conv_id", "turn_idx", "sent_idx", "begin", "end", "ent_type"],
        )
        assert res["precision"] >= 0.95 and res["recall"] >= 0.95, res


class TestDocumentInvariant:
    def test_per_turn_text_equality(self, spark, spark_tables, transcripts_df):
        """BASELINE.json:15 invariant on the real pipeline output."""
        from pyspark.sql import functions as F

        from antnre_spark.assemble import dedup_turns, explode_documents

        back = explode_documents(spark_tables["documents"])
        base = dedup_turns(transcripts_df)
        j = base.alias("a").join(back.alias("b"), ["conv_id", "turn_idx"], "full")
        bad = j.filter(
            F.col("a.text").isNull()
            | F.col("b.text").isNull()
            | (F.col("a.text") != F.col("b.text"))
        ).count()
        assert bad == 0
